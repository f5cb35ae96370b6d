package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Time-series operators Spark lacks as primitives, composed
  * scale-first from existing operators (tier (a) of the
  * custom-operator preference order — the semantics fit a composition,
  * so no custom plan node is needed):
  *
  *   - as-of join: tagged union + keyed ordered window with
  *     last(ignoreNulls) — ONE shuffle on the join key, no range
  *     self-join, no per-row probe. The classic distributed as-of.
  *   - range join: aligned ranges compose to an equi-join on the
  *     bucket id (floor(value/width)) — a hash join, not an
  *     inequality nested loop. (Non-aligned ranges bucketize both
  *     sides to overlapping cells, same shape.)
  *   - sessionization: gap>threshold island numbering via windows —
  *     the batch twin of the streaming mapGroupsWithState path
  *     (graft.streaming.Streaming).
  *
  * All three are oracle-checked: DuckDB has native ASOF JOIN, an
  * inequality join, and the same window SQL. Timestamps compare in
  * microseconds on both sides (the engine's µs convention; the oracle
  * truncates its ns fixture the same way).
  */
object Temporal {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Generic as-of join: for each left row, the latest right row with
    * rightTime <= leftTime and equal key. Right side must be unique
    * per (key, time) — dedupe upstream. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_src", lit(1))
      .withColumn("_t", col(leftTime))
    val r = right.withColumn("_src", lit(0))
      .withColumn("_t", col(rightTime))
    val lCols = left.columns.toSeq
    val all = (lCols ++ payload).distinct
    val unioned = l.select(
      (Seq(col(key), col("_t"), col("_src")) ++
        lCols.filter(c => c != key).map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
      .unionByName(r.select(
        (Seq(col(key), col("_t"), col("_src")) ++
          lCols.filter(c => c != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          payload.map(col)): _*))
    // rights sort before lefts at equal time → 'latest <= t' is inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_src") === 1)
      .select((lCols.map(col) ++
        payload.map(c => col(s"_asof_$c").as(c))): _*)
  }

  /** For each purchase: the user's most recent click at or before it
    * (µs precision), with the gap in seconds. */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("t_us"))
    // defensive (key,time) dedupe: keep max event_id — mirrored in the oracle
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("t_us").as("click_us"))
      .agg(max(col("event_id")).as("click_id"))
    asofJoin(purchases, clicks, "user_id", "t_us", "click_us",
      payload = Seq("click_id", "click_us"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        graft.functions.div(col("t_us") - col("click_us"), lit(1000000L))
          .as("gap_s"))
      .orderBy("purchase_id")
  }

  val qAsofJoinSql: String = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, t_us FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, t_us AS click_us, MAX(event_id) AS click_id
          FROM e WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.purchase_id, p.user_id, c.click_id,
      CAST((p.t_us - c.click_us) // 1000000 AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t_us >= c.click_us
    ORDER BY purchase_id
  """.trim

  /** NEAREST-match as-of join — the variant plain as-of (backward
    * only) can't express: for each purchase, the user's click
    * minimizing |Δt|, ties to the PAST (the convention that never
    * peeks forward when both are equally close). One union frame, one
    * hash partition by key, TWO window passes over the same exchange
    * (ascending for the latest-≤ candidate, descending for the
    * earliest-≥ one), then a row-local pick — so nearest costs one
    * shuffle, exactly like backward as-of, never a per-row time-range
    * probe. The oracle replays the pick as a LATERAL argmin over
    * |Δt| with the click-time tiebreak (backward = smaller click_us
    * at equal distance). gap_us is SIGNED (negative = matched click
    * is in the future). */
  def qAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("t_us"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("t_us").as("click_us"))
      .agg(max(col("event_id")).as("click_id"))
    val unioned = purchases
      .select(col("user_id"), col("t_us").as("_t"), lit(1).as("_src"),
        col("purchase_id"), lit(null).cast(LongType).as("click_id"),
        lit(null).cast(LongType).as("click_us"))
      .unionByName(clicks
        .select(col("user_id"), col("click_us").as("_t"), lit(0).as("_src"),
          lit(null).cast(LongType).as("purchase_id"), col("click_id"),
          col("click_us")))
    // rights sort before lefts at equal time in BOTH directions
    // (_src asc), so an exactly-coincident click is an inclusive
    // candidate on each side — distance 0, backward wins the tie
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("_t").asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id"))
      .orderBy(col("_t").desc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = unioned
      .withColumn("b_id", last(col("click_id"), ignoreNulls = true).over(wb))
      .withColumn("b_us", last(col("click_us"), ignoreNulls = true).over(wb))
      .withColumn("f_id", last(col("click_id"), ignoreNulls = true).over(wf))
      .withColumn("f_us", last(col("click_us"), ignoreNulls = true).over(wf))
      .filter(col("_src") === 1)
    val pickFwd = col("b_id").isNull ||
      (col("f_id").isNotNull &&
        (col("_t") - col("b_us")) > (col("f_us") - col("_t")))
    picked.select(col("purchase_id"), col("user_id"),
      when(pickFwd, col("f_id")).otherwise(col("b_id")).as("click_id"),
      (col("_t") - when(pickFwd, col("f_us")).otherwise(col("b_us")))
        .as("gap_us"))
      .orderBy("purchase_id")
  }

  val qAsofNearestSql: String = """
    WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us FROM events),
    p AS (SELECT event_id AS purchase_id, user_id, t_us FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, t_us AS click_us, MAX(event_id) AS click_id
          FROM e WHERE event_type = 'click' GROUP BY 1, 2)
    SELECT p.purchase_id, p.user_id, n.click_id,
      p.t_us - n.click_us AS gap_us
    FROM p LEFT JOIN LATERAL (
      SELECT click_id, click_us FROM c
      WHERE c.user_id = p.user_id
      ORDER BY ABS(p.t_us - c.click_us), c.click_us LIMIT 1) n ON TRUE
    ORDER BY purchase_id
  """.trim

  /** Range join composed to an equi-join: events into aligned
    * 50-unit value bands (hash join on the band id — never an
    * inequality nested loop). */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 10).select(
      col("id").cast(IntegerType).as("band_id"),
      (col("id") * 50).cast(DoubleType).as("lo"),
      ((col("id") + 1) * 50).cast(DoubleType).as("hi"))
    t(s, dir, "events")
      .withColumn("band_id", floor(col("value") / 50).cast(IntegerType))
      .join(broadcast(bands), Seq("band_id"))
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .orderBy("band_id")
  }

  val qRangeJoinSql: String = """
    WITH bands AS (
      SELECT CAST(i AS INT) AS band_id, CAST(i * 50 AS DOUBLE) AS lo,
        CAST((i + 1) * 50 AS DOUBLE) AS hi
      FROM range(0, 10) t(i))
    SELECT band_id, lo, hi, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY 1, 2, 3 ORDER BY band_id
  """.trim

  /** Gap-based sessionization (30-minute inactivity closes a session):
    * island numbering per user, then per-user session stats. */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("t_us") - lag(col("t_us"), 1).over(wOrd) > 1800L * 1000000L
          || lag(col("t_us"), 1).over(wOrd).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("session_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("session_events")).as("max_session_events"))
      .filter(col("user_id") < 30)
      .orderBy("user_id")
  }

  val qSessionizeSql: String = """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
    flagged AS (
      SELECT user_id, t_us,
        CASE WHEN t_us - LAG(t_us) OVER w > 1800 * 1000000
          OR LAG(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)),
    sess AS (
      SELECT user_id,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS session_events
      FROM sess GROUP BY 1, 2)
    SELECT user_id, COUNT(*) AS n_sessions,
      CAST(MAX(session_events) AS BIGINT) AS max_session_events
    FROM per_session WHERE user_id < 30
    GROUP BY user_id ORDER BY user_id
  """.trim

  /** Hopping (sliding) window aggregation: 1-hour windows every 30
    * minutes — each event belongs to exactly w/s = 2 windows, which
    * Spark assigns via an Expand (2 rows per event) feeding a normal
    * partial+final hash agg; no window function, no per-key sort. The
    * oracle unnests the same two aligned starts per event. Counts and
    * decimal-summed values are order-independent. */
  def qHoppingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("total_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("total_value"))
      .filter(col("win_start_us") % (3600L * 1000000L) === 0) // keep on-the-hour windows: bounded output
      .orderBy("win_start_us", "event_type")

  val qHoppingWindowSql: String = """
    WITH e AS (SELECT event_type, value, epoch_us(ts) AS t_us FROM events),
    assigned AS (
      SELECT event_type, value,
        unnest([ (t_us // 1800000000) * 1800000000 - 1800000000,
                 (t_us // 1800000000) * 1800000000 ]) AS win_start_us
      FROM e)
    SELECT win_start_us, event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM assigned
    WHERE win_start_us % 3600000000 = 0
    GROUP BY win_start_us, event_type
    ORDER BY win_start_us, event_type
  """.trim

  /** SCD Type-2 interval construction from a change stream: collapse
    * each user's event-type runs into validity intervals
    * [valid_from, valid_to) with a version number and a current flag —
    * the standard way a warehouse tracks dimension history from CDC.
    * One partitioned window pass builds run boundaries (lag ≠ current
    * → new regime), a second numbers regimes and takes each regime's
    * span; all state is per-user, nothing global. Time stays in exact
    * microseconds; valid_to is NULL on the open (current) interval. */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val regimes = t(s, dir, "events")
      .filter(col("user_id") < 8)
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(wOrd).isNull ||
          lag(col("event_type"), 1).over(wOrd) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wRun))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("event_type"),
        min(col("t_us")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("version").asc)
    regimes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wNext))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy("user_id", "version")
  }

  val qScd2Sql: String = """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
               FROM events WHERE user_id < 8),
    flagged AS (
      SELECT user_id, event_id, event_type, t_us,
        CASE WHEN LAG(event_type) OVER w IS NULL
          OR LAG(event_type) OVER w != event_type THEN 1 ELSE 0 END AS chg
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)),
    versioned AS (
      SELECT user_id, event_type, t_us,
        SUM(chg) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      FROM flagged),
    regimes AS (
      SELECT user_id, version, MIN(event_type) AS event_type,
        MIN(t_us) AS valid_from, COUNT(*) AS n_events
      FROM versioned GROUP BY user_id, version)
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type, valid_from,
      LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version ASC) AS valid_to,
      n_events,
      LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version ASC) IS NULL AS is_current
    FROM regimes ORDER BY user_id, version
  """.trim

  /** Native `session_window` (the API twin of the streaming session
    * aggregation — same function gates a `readStream` with a
    * watermark): 10-minute-gap sessions per user, session bounds
    * [first_ts, last_ts + gap). A new session starts when the
    * inter-event gap is ≥ the window gap — the oracle reproduces
    * exactly that island rule in µs arithmetic (no float time math).
    * Unlike qSessionize's manual lag/cumsum islands, this is the
    * single-shuffle built-in: partial merge of overlapping session
    * ranges happens inside the aggregation operator. */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("user_id") < 10)
      .groupBy(col("user_id"),
        session_window(col("ts"), "10 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("session_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "start_us")

  val qSessionWindowSql: String = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS t_us, value FROM events
               WHERE user_id < 10),
    flagged AS (
      SELECT user_id, t_us, value,
        CASE WHEN t_us - LAG(t_us) OVER w >= 600 * 1000000
          OR LAG(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC)),
    sess AS (
      SELECT user_id, t_us, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id, MIN(t_us) AS start_us,
      MAX(t_us) + 600 * 1000000 AS end_us,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, start_us
  """.trim

  /** Time-series resample + forward-fill (the pandas
    * `resample('1h').ffill()` analogue): hourly per-type totals on a
    * dense hour grid, empty hours carrying the last observed value.
    * The grid comes from exploding a per-type `sequence(lo, hi, 1h)`
    * — at fixture span that's one 720-element array per type; for an
    * unbounded span you'd generate per (type, day) so no single task
    * materializes the whole range. The fill is `last(ignoreNulls)`
    * over a type-partitioned window — one shuffle, never a global
    * sort. Sums go through exact decimals (ops.dsum) so the filled
    * values are partition-order-independent. */
  def qResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(dsum(col("value")).as("v"), count(lit(1)).as("n_events"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(hourly, Seq("event_type", "h"), "left_outer")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
      .orderBy("event_type", "h")
  }

  val qResampleFfillSql: String = s"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
        ${dsumSql("value")} AS v, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    spans AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans),
    j AS (
      SELECT g.event_type, g.h, hourly.v,
        COALESCE(hourly.n_events, 0) AS n_events
      FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h)
    SELECT event_type, h, CAST(n_events AS BIGINT) AS n_events,
      LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM j ORDER BY event_type, h
  """.trim

  /** Gap-fill by LINEAR INTERPOLATION — [[qResampleFfill]]'s sibling
    * for continuous signals (sensor/metric series), where a step
    * function misstates the level between observations: a missing
    * hour h between known points (pt, pv) and (nt, nv) reads
    * pv + (nv − pv) · (h − pt)/(nt − pv's time span) — with ffill
    * (backfill) degraded behavior only at the trailing (leading)
    * edge where one neighbor doesn't exist.
    *
    * Two windows per row — running `last(v) ignoreNulls` over the
    * preceding frame and `first(v) ignoreNulls` over the following —
    * plus the matching observation TIMES, so the interpolation is
    * pure per-row arithmetic after one partitioned sort; no self
    * joins, no gap enumeration. Hash-stable cross-engine because
    * every operand is exact (decimal-summed values, integer epoch
    * seconds) and +,−,×,÷ are IEEE-exactly-rounded in both engines;
    * the oracle mirrors the expression shape operation-for-operation. */
  def qResampleInterp(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(dsum(col("value")).as("v"), count(lit(1)).as("n_events"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(0, Window.unboundedFollowing)
    val et = unix_timestamp(col("h"))
    val joined = grid.join(hourly, Seq("event_type", "h"), "left_outer")
      .select(col("event_type"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
        last(when(col("v").isNotNull, et), ignoreNulls = true)
          .over(wPrev).as("pt"),
        first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
        first(when(col("v").isNotNull, et), ignoreNulls = true)
          .over(wNext).as("nt"))
    joined.select(col("event_type"), col("h"), col("n_events"),
      when(col("v").isNotNull, col("v"))
        .when(col("pv").isNull, col("nv"))
        .when(col("nv").isNull, col("pv"))
        .otherwise(col("pv") + (col("nv") - col("pv")) *
          ((et - col("pt")).cast("double") /
            (col("nt") - col("pt")).cast("double")))
        .as("v_interp"))
      .orderBy("event_type", "h")
  }

  val qResampleInterpSql: String = s"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
        ${dsumSql("value")} AS v, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    spans AS (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM spans),
    j AS (
      SELECT g.event_type, g.h, hourly.v,
        COALESCE(hourly.n_events, 0) AS n_events
      FROM grid g LEFT JOIN hourly ON g.event_type = hourly.event_type AND g.h = hourly.h),
    w AS (
      SELECT event_type, h, CAST(n_events AS BIGINT) AS n_events, v,
        LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN v IS NOT NULL THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY h
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j)
    SELECT event_type, h, n_events,
      CASE WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) *
             (CAST(CAST(epoch(h) AS BIGINT) - pt AS DOUBLE)
              / CAST(nt - pt AS DOUBLE))
      END AS v_interp
    FROM w ORDER BY event_type, h
  """.trim

  /** Interval-OVERLAP join (both sides are intervals — the shape
    * [[qRangeJoin]]'s point-in-interval bucketing cannot express):
    * which user pairs were active at the same time, and for how long?
    *
    * Sessions ([[qSessionize]]'s 30-min-gap islands, reduced to
    * [start, end] µs) self-join on OVERLAP — a classic inequality
    * join that a naive engine runs as an O(N²) nested loop. The
    * distributed decomposition:
    *
    *  1. explode each interval to the 6-hour buckets it covers
    *     (intervals are gap-bounded, so almost always 1-2 buckets);
    *  2. equi-join on the bucket (a plain hash join — candidates are
    *     only pairs sharing a bucket, never the cartesian);
    *  3. keep a pair only in the bucket containing the LATER start
    *     (`bucket = later_start DIV width`) — every overlapping pair
    *     survives in EXACTLY one bucket, so no distinct is needed;
    *  4. exact overlap filter + per-pair aggregation.
    *
    * Bucket ids use integer DIV (a double quotient could round across
    * a bucket boundary at µs magnitudes). The oracle runs the
    * inequality join directly (DuckDB IEJoin) — the hash proves the
    * decomposition finds every overlapping pair exactly once. Top-100
    * by total overlap with a full deterministic tiebreak. */
  /** The decomposition itself, over any (user_id, s_us, e_us) interval
    * frame — exposed so TemporalSpec can stress multi-bucket intervals
    * and boundary-touching pairs against a naive inequality join.
    * Emits one row per overlapping pair (ua < ub): (ua, ub, sa, ea,
    * sb, eb, overlap_us) — each pair survives in EXACTLY one bucket
    * (the one containing the later start), so no dedup pass exists. */
  def overlapJoin(sess: DataFrame, bucketUs: Long): DataFrame = {
    val exploded = sess.withColumn("bucket",
      explode(sequence(expr(s"s_us DIV ${bucketUs}L"),
        expr(s"e_us DIV ${bucketUs}L"))))
    val a = exploded.select(col("user_id").as("ua"), col("s_us").as("sa"),
      col("e_us").as("ea"), col("bucket"))
    val b = exploded.select(col("user_id").as("ub"), col("s_us").as("sb"),
      col("e_us").as("eb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("ua") < col("ub") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("bucket") === expr(s"greatest(sa, sb) DIV ${bucketUs}L"))
      .select(col("ua"), col("ub"), col("sa"), col("ea"), col("sb"),
        col("eb"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
  }

  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val bucketUs = 21600L * 1000000L // 6 h
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = t(s, dir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("new_session",
        when(col("t_us") - lag(col("t_us"), 1).over(wOrd) > 1800L * 1000000L
          || lag(col("t_us"), 1).over(wOrd).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("t_us")).as("s_us"), max(col("t_us")).as("e_us"))
      // real sessions only (>= 2 events, nonzero duration): co-presence
      // of singleton pings is noise, and since candidates grow as
      // (sessions)²/buckets, dropping the ~95% singleton class keeps
      // the pair stage output-bound instead of ping-bound at scale
      .filter(col("e_us") > col("s_us"))
      .select(col("user_id"), col("s_us"), col("e_us"))
    overlapJoin(sess, bucketUs)
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("overlap_us")).as("total_overlap_us"))
      .orderBy(col("total_overlap_us").desc, col("ua"), col("ub"))
      .limit(100)
  }

  val qIntervalJoinSql: String = """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
    flagged AS (
      SELECT user_id, t_us,
        CASE WHEN t_us - LAG(t_us) OVER w > 1800 * 1000000
          OR LAG(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)),
    sess_ids AS (
      SELECT user_id, t_us,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY t_us ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    sess AS (
      SELECT user_id, MIN(t_us) AS s_us, MAX(t_us) AS e_us
      FROM sess_ids GROUP BY user_id, session_id
      HAVING MAX(t_us) > MIN(t_us))
    SELECT a.user_id AS ua, b.user_id AS ub, COUNT(*) AS n_overlaps,
      CAST(SUM(LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us)) AS BIGINT)
        AS total_overlap_us
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    GROUP BY ua, ub
    ORDER BY total_overlap_us DESC, ua, ub LIMIT 100
  """.trim

  /** Exponentially-weighted moving average over each user's event
    * stream — the time-series smoothing primitive (metric dashboards,
    * sensor denoising) the frame aggregates (`window_frame`) don't
    * cover. α = 1/2 over the last 8 events: weights 2^(i)/(2^L − 1)
    * (newest highest), so smoothing is EXACT INTEGER arithmetic on
    * cent-scaled values — binary weights make the weighted sum a
    * shift-add fold and the normalization one floor division,
    * order-independent and replayed bit-for-bit by the oracle, where
    * float EWMA would drift per reduction order.
    *
    * Scale posture: one window (hash-partition by user, sort by time
    * within) — identical shuffle shape to every ranking window; the
    * frame is ROWS-bounded so state per row is O(8). */
  def qEwma(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, 0)
    t(s, dir, "events")
      .filter(col("user_id") < 20)
      .withColumn("x_c", floor(col("value") * 100).cast("long"))
      .withColumn("l", collect_list(col("x_c")).over(w))
      .select(col("user_id"), col("event_id"), col("x_c"),
        expr("""aggregate(transform(l, (x, i) -> x * shiftleft(1L, i)),
                0L, (a, b) -> a + b)
                DIV (shiftleft(1L, size(l)) - 1)""").as("ewma_c"))
      .orderBy("user_id", "event_id")
  }

  val qEwmaSql: String = """
    WITH e AS (
      SELECT user_id, event_id,
        CAST(FLOOR(value * 100) AS BIGINT) AS x_c,
        list(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
      FROM events WHERE user_id < 20)
    SELECT user_id, event_id, x_c,
      CAST(CAST(list_sum(list_transform(range(1, len(l)+1),
             j -> l[j] * (CAST(1 AS BIGINT) << (j-1)))) AS BIGINT)
           // ((CAST(1 AS BIGINT) << len(l)) - 1) AS BIGINT) AS ewma_c
    FROM e ORDER BY user_id, event_id
  """.trim
}
