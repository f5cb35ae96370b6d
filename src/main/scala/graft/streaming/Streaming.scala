package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Streaming tier (SURVEY §2.11 — the reference's "streaming" is the
  * Arrow IPC stream *format* (`format/Message.fbs`,
  * `cpp/src/arrow/ipc/reader.h:58`), a transport with no stateful
  * engine; this module is the declared pure-Spark extension:
  * Structured Streaming with event-time watermarks, windowed
  * aggregation, and custom keyed state.
  *
  * The transforms are written against plain DataFrames so the SAME
  * code runs in batch mode (oracle-checkable against DuckDB) and under
  * `readStream`/`writeStream` (StreamingSpec drives them through
  * MemoryStream with out-of-order and late input). That unification is
  * the point of building on Spark.
  *
  * Scale posture: state is keyed and watermark-bounded — aggregation
  * state lives per (window, event_type) and is dropped once the
  * watermark passes the window end, so long-running state is O(open
  * windows), not O(stream length).
  */
object Streaming {

  /** Hourly tumbling-window counts/sums per event type, tolerating 10
    * minutes of event-time disorder. On a stream this emits a window
    * only once the watermark closes it (append mode). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Batch-mode window query over the events fixture — the same
    * transform the streaming spec drives, verified against DuckDB's
    * time_bucket. Total ORDER BY for the driver hash. */
  def qStreamWindow(s: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables(s, dir, "events"))
      .orderBy(col("win_start"), col("event_type"))

  val qStreamWindowSql: String = """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY win_start, event_type
  """.trim

  // ---- streaming top-k ----------------------------------------------------

  /** Per-window per-user counts — the STREAMABLE half of the
    * windowed-top-k pipeline: keyed watermark-bounded aggregation
    * whose state is O(open windows × active users) and is dropped at
    * window close. Ranking is deliberately NOT in this transform —
    * append-mode streaming cannot rank inside an open window (the
    * top-3 is unknowable until the watermark certifies no more
    * arrivals), so the rank step runs downstream of window close:
    * in batch via [[graft.plans.TopKPerGroup]], on a stream over the
    * closed-window rows the sink receives (StreamingSpec drives
    * exactly that and pins stream == batch). */
  def windowedUserCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("user_id"), col("n"))

  /** Top-3 most active users of every hourly window (batch twin):
    * [[windowedUserCounts]] + the engine's grouped-top-k physical
    * operator — per-partition bounded heaps, a 3-capped shuffle —
    * never a full per-window sort. */
  def qStreamTopk(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup(
      windowedUserCounts(Tables(s, dir, "events")),
      Seq("win_start"), Seq("n" -> false, "user_id" -> true), 3)
      .orderBy(col("win_start"), col("n").desc, col("user_id"))

  val qStreamTopkSql: String = """
    WITH c AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, user_id,
        COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT win_start, user_id, n,
        ROW_NUMBER() OVER (PARTITION BY win_start
          ORDER BY n DESC, user_id) AS rn
      FROM c)
    SELECT win_start, user_id, n FROM r WHERE rn <= 3
    ORDER BY win_start, n DESC, user_id
  """.trim

  // ---- streaming distribution drift --------------------------------------

  /** Per-window event-type counts — the STREAMABLE half of the drift
    * monitor: a watermark-bounded keyed aggregation (state O(open
    * windows × types), dropped at close), the same append-legal shape
    * as [[windowedUserCounts]]. The TVD fold runs DOWNSTREAM of
    * window close ([[driftFold]]) — append mode cannot compare an
    * OPEN window's distribution (its counts are unknowable until the
    * watermark certifies no more arrivals), the same reasoning that
    * keeps ranking out of [[windowedUserCounts]]. */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"))

  /** Per-window total-variation distance against a REFERENCE
    * distribution (yesterday's profile in production; here the
    * all-time profile) — [[graft.ops.Quality.qDriftDetect]]'s exact
    * integer arithmetic on closed windows: Σ|c_w·N_ref − c_ref·N_w|
    * in decimals, types absent from the window contribute their full
    * reference mass ((N_ref − Σ_present c_ref)·N_w), NOVEL types
    * absent from the reference contribute c_w·N_ref (coalesce-0
    * lookup) — the schema-adding case that matters operationally.
    * One per-window window-sum + one partial+final agg; the reference
    * rides a broadcast map literal, O(#types). */
  def driftFold(counts: DataFrame, ref: Map[String, Long]): DataFrame = {
    val dec = DecimalType(38, 0)
    val nRef = ref.values.sum
    // an empty/zero reference makes every window's TVD 0/0 = NaN, and
    // Spark's NaN-is-largest ordering would then flag EVERY window as
    // drifted — fail fast on the invalid profile instead
    require(nRef > 0,
      "driftFold: reference profile is empty — drift against nothing " +
        "is undefined; build the profile before monitoring")
    val nRefD = lit(nRef).cast(dec)
    val refMap = typedlit(ref)
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win_start"))
    val cref = coalesce(element_at(refMap, col("event_type")), lit(0L))
    counts
      .withColumn("nw", sum(col("n")).over(wWin))
      .withColumn("num",
        abs(col("n").cast(dec) * lit(nRef) - cref.cast(dec) * col("nw")))
      .withColumn("crefp", cref)
      .groupBy("win_start")
      .agg(max(col("nw")).as("n_events"),
        sum(col("num")).as("present_num"),
        sum(col("crefp")).as("cref_present"))
      .select(col("win_start"), col("n_events"),
        ((col("present_num") +
          (nRefD - col("cref_present").cast(dec)) *
            col("n_events").cast(dec)).cast(DoubleType) /
          (lit(2.0) * (nRefD * col("n_events")).cast(DoubleType)))
          .as("tvd"))
      .withColumn("drifted", col("tvd") > 0.1)
  }

  /** Batch twin: every hourly window's type distribution audited
    * against the all-time profile. The reference collect is
    * O(#event types) driver state — the k-means-seed precedent. */
  def qStreamDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    driftFold(windowedTypeCounts(ev), ref)
      .orderBy("win_start")
  }

  val qStreamDriftSql: String = """
    WITH ref AS (
      SELECT event_type, COUNT(*) AS cref FROM events GROUP BY 1),
    nref AS (SELECT CAST(SUM(cref) AS BIGINT) AS n FROM ref),
    wc AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    nw AS (SELECT win_start, CAST(SUM(c) AS BIGINT) AS n_events
           FROM wc GROUP BY 1),
    terms AS (
      -- LEFT JOIN + COALESCE(cref, 0): an event type present in a
      -- window but absent from the reference profile (the novel-type
      -- case) contributes |c_w * N_ref - 0| to the numerator, exactly
      -- as the Scala driftFold path counts it — the oracle pins that
      -- contract even though this fixture's all-time reference never
      -- exercises it
      SELECT w.win_start,
        SUM(ABS(w.c * (SELECT n FROM nref)
              - COALESCE(r.cref, 0) * x.n_events)) AS present_num,
        SUM(COALESCE(r.cref, 0)) AS cref_present
      FROM wc w
      LEFT JOIN ref r USING (event_type)
      JOIN nw x USING (win_start)
      GROUP BY w.win_start)
    SELECT t.win_start, x.n_events,
      CAST(t.present_num
        + ((SELECT n FROM nref) - t.cref_present) * x.n_events AS DOUBLE)
        / (2.0 * CAST((SELECT n FROM nref) * x.n_events AS DOUBLE)) AS tvd,
      CAST(t.present_num
        + ((SELECT n FROM nref) - t.cref_present) * x.n_events AS DOUBLE)
        / (2.0 * CAST((SELECT n FROM nref) * x.n_events AS DOUBLE)) > 0.1
        AS drifted
    FROM terms t JOIN nw x USING (win_start)
    ORDER BY win_start
  """.trim

  // ---- streaming anomaly detection ---------------------------------------

  /** Per-window per-type value statistics — the streamable half of the
    * anomaly monitor: watermark-bounded keyed aggregation carrying the
    * EXACT decimal sum (order-independent at any partition count), so
    * the downstream z-score is reproducible. Append-legal for the same
    * reason as [[windowedTypeCounts]]. */
  def windowedTypeStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(sum(col("value").cast(DecimalType(28, 12))).as("sum_v"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("sum_v"), col("n"))

  /** z-score each closed window's mean value against a per-type
    * reference profile (mean, stddev — yesterday's in production, the
    * all-time profile here): z = (x̄_w − μ) / (σ / √n_w), the standard
    * error of the window mean, flagged at |z| > 3. The reference is a
    * #types-row frame riding a broadcast join — no driver state, and
    * the fold downstream of window close for the same reason as
    * [[driftFold]] (an OPEN window's mean is unknowable).
    *
    * NOVEL types (present in the window, absent from the reference)
    * ride a LEFT join and flag `anomaly = true` with a null z — a
    * type the profile has never seen is by definition anomalous, and
    * an inner join would make the monitor silently blind exactly
    * there (the same operational case [[driftFold]]'s coalesce-0
    * handles). */
  def anomalyFold(stats: DataFrame, ref: DataFrame): DataFrame =
    stats
      .join(broadcast(ref), Seq("event_type"), "left")
      .withColumn("win_mean",
        col("sum_v").cast(DoubleType) / col("n"))
      .withColumn("z", round(
        (col("win_mean") - col("ref_mean")) /
          (col("ref_sd") / sqrt(col("n").cast(DoubleType))), 6))
      .select(col("win_start"), col("event_type"), col("n"),
        round(col("win_mean"), 6).as("win_mean"), col("z"),
        coalesce(abs(col("z")) > 3.0, lit(true)).as("anomaly"))

  /** All-time per-type reference profile via the exact-decimal
    * convention: μ and σ from order-independent decimal sums (σ² =
    * E[x²] − μ², floored at 1e-24 against degenerate constant
    * streams). */
  def typeProfile(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        (sum(col("value").cast(DecimalType(28, 12))).cast(DoubleType) /
          count(lit(1))).as("ref_mean"),
        (sum((col("value") * col("value")).cast(DecimalType(28, 12)))
          .cast(DoubleType) / count(lit(1))).as("ex2"))
      .select(col("event_type"), col("ref_mean"),
        sqrt(greatest(col("ex2") - col("ref_mean") * col("ref_mean"),
          lit(1e-24))).as("ref_sd"))

  /** Batch twin: every hourly window's mean value z-scored against the
    * all-time per-type profile. */
  def qStreamAnomaly(s: SparkSession, dir: String): DataFrame =
    anomalyFold(windowedTypeStats(Tables(s, dir, "events")),
      typeProfile(Tables(s, dir, "events")))
      .orderBy("win_start", "event_type")

  val qStreamAnomalySql: String = """
    WITH ref AS (
      SELECT event_type,
        CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS ref_mean,
        CAST(SUM(CAST(value*value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS ex2
      FROM events GROUP BY 1),
    refs AS (
      SELECT event_type, ref_mean,
        sqrt(GREATEST(ex2 - ref_mean * ref_mean, 1e-24)) AS ref_sd
      FROM ref),
    wc AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        SUM(CAST(value AS DECIMAL(28,12))) AS sum_v, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    z AS (
      SELECT w.win_start, w.event_type, w.n,
        CAST(w.sum_v AS DOUBLE) / w.n AS win_mean,
        ROUND((CAST(w.sum_v AS DOUBLE) / w.n - r.ref_mean)
          / (r.ref_sd / sqrt(CAST(w.n AS DOUBLE))), 6) AS z
      FROM wc w JOIN refs r USING (event_type))
    SELECT win_start, event_type, n, ROUND(win_mean, 6) AS win_mean, z,
      ABS(z) > 3.0 AS anomaly
    FROM z ORDER BY win_start, event_type
  """.trim

  // ---- stream-static enrichment join -------------------------------------

  /** Stream-static enrichment: each arriving event joins a BROADCAST
    * static dimension (customer → market segment) before the windowed
    * aggregate — the canonical streaming-enrichment shape. The static
    * side is planned as a broadcast hash join, so the stream never
    * shuffles for the join and the dim is read once per trigger batch
    * at most (Spark re-resolves static sources per micro-batch, which
    * is also what makes slowly-changing dims pick up updates). State
    * is O(open windows × segments), same watermark bound as
    * [[windowedCounts]]. */
  def enrichJoin(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("total_value"))
      .select(col("w.start").as("win_start"),
        col("c_mktsegment").as("segment"), col("n"), col("total_value"))

  /** Batch twin of the enrichment join, DuckDB-checked. */
  def qStreamEnrich(s: SparkSession, dir: String): DataFrame =
    enrichJoin(Tables(s, dir, "events"),
      Tables(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")))
      .orderBy(col("win_start"), col("segment"))

  val qStreamEnrichSql: String = """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
      c_mktsegment AS segment, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2 ORDER BY win_start, segment
  """.trim

  // ---- custom keyed state (mapGroupsWithState) ---------------------------

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserStat(user_id: Long, n_events: Long, total: Double)

  /** Running per-user totals via explicit keyed state — the
    * mapGroupsWithState surface. State is one UserStat per user;
    * update mode emits the refreshed row each trigger. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(user, 0L, 0.0))
          val (n, tot) = batch.foldLeft((prev.n_events, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          val next = UserStat(user, n, tot)
          state.update(next)
          next
      }
  }

  /** Output mode for runningUserStats when run as a stream. */
  val runningOutputMode: OutputMode = OutputMode.Update()

  // ---- streaming dedup ---------------------------------------------------

  /** Streaming exact dedup by content fingerprint — the streaming twin
    * of ops.Dedup.qDedupExact: duplicates arriving within the
    * watermark horizon are dropped, and the dedup state itself is
    * watermark-bounded (O(horizon), not O(stream)) — the only way
    * streaming dedup survives an unbounded stream. */
  def dedupStream(docs: DataFrame): DataFrame = {
    val fp = docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", "10 minutes")
    // dropDuplicatesWithinWatermark REFUSES batch frames (unlike
    // withWatermark, which no-ops) — branch to its batch semantics
    // so the transform stays batch/stream-unified and oracle-checkable
    if (fp.isStreaming) fp.dropDuplicatesWithinWatermark("fp")
    else fp.dropDuplicates("fp")
  }

  /** Batch twin of [[dedupStream]] for the oracle gate: the same
    * transform over the documents fixture (given a deterministic
    * doc_id-derived event time — `withWatermark` is a no-op in batch,
    * and in-batch `dropDuplicatesWithinWatermark` degenerates to plain
    * dropDuplicates). WHICH physical row survives per fingerprint is
    * engine-internal, so the query projects the surviving fingerprint
    * SET — deterministic on both engines — while the streaming
    * keep-first/state-eviction behavior is StreamingSpec's job
    * (MemoryStream same-batch + cross-batch dups, and the
    * IPC-source→sink exactly-once pipeline). */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame =
    dedupStream(
      Tables(s, dir, "documents")
        .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id"))))
      .select(col("fp"))
      .orderBy("fp")

  val qStreamDedupSql: String =
    "SELECT DISTINCT md5(text) AS fp FROM documents ORDER BY fp"

  // ---- stream-stream interval join ---------------------------------------

  /** The shared sides + event-time range condition of the five
    * attribution join variants (inner/left/full/right/semi): clicks
    * keyed c_user/click_ts/click_id, purchases keyed user_id/
    * purchase_ts/purchase_id/purchase_value, both watermarked 10
    * minutes, purchases matching clicks of the preceding hour. ONE
    * definition — the watermark delay and the lookback window are
    * load-bearing constants that previously lived in five literal
    * copies. */
  private def attributionSides(clicks: DataFrame, purchases: DataFrame)
      : (DataFrame, DataFrame, Column) = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .select(col("user_id").as("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "10 minutes")
    val cond = col("c_user") === col("user_id") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR")
    (c, p, cond)
  }

  /** Watermarked stream-stream interval join — click→purchase
    * attribution: each purchase pairs with the same user's clicks from
    * the preceding hour. In streaming mode both sides carry a
    * watermark and the join carries the event-time range condition;
    * together they let Spark EVICT buffered rows (a click older than
    * watermark − 1 h can never match again), so join state is bounded
    * by the time horizon, not the stream length — the only shape that
    * survives an unbounded stream. The same function runs in batch,
    * where `withWatermark` is a no-op (qStreamJoin, oracle-checked). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val (c, p, cond) = attributionSides(clicks, purchases)
    c.join(p, cond)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** LEFT-OUTER stream-stream join — attribution INCLUDING the
    * unconverted clicks. Same watermarks + event-time range condition
    * as [[attributionJoin]]; the outer semantics add the deferred
    * null emission: an unmatched click is held in state until the
    * watermark proves no purchase can still arrive for its 1 h window
    * (click_ts + 1 h + 10 min delay), THEN emits null-padded — so
    * "no match" is a watermark-certified fact, not a race with late
    * data, and state stays bounded by the same eviction rule as the
    * inner join. In batch the null rows appear immediately
    * (`qStreamJoinOuter`, oracle-checked LEFT JOIN). */
  def attributionJoinLeftOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val (c, p, cond) = attributionSides(clicks, purchases)
    c.join(p, cond, "left_outer")
      // user_id comes from the CLICK side: the purchase side is null
      // on precisely the rows the outer join adds
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("purchase_value"))
  }

  /** FULL-OUTER stream-stream join (Spark >= 3.1) — attribution
    * including BOTH dangling sides: unconverted clicks null-pad the
    * purchase columns AND orphan purchases (no click in the preceding
    * hour — organic/direct conversions) null-pad the click columns.
    * Same watermarks + event-time range condition as
    * [[attributionJoin]]; each side's null emission is deferred until
    * the OTHER side's watermark proves no match can still arrive for
    * its window, so every null row is a watermark-certified fact and
    * state keeps the same horizon-bounded eviction. In batch the
    * null rows appear immediately (`qStreamJoinFull`, oracle-checked
    * FULL JOIN). */
  def attributionJoinFullOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val (c, p, cond) = attributionSides(clicks, purchases)
    c.join(p, cond, "full_outer")
      // exactly one of (c_user, user_id) is null on the padded rows
      .select(coalesce(col("c_user"), col("user_id")).as("user_id"),
        col("click_id"), col("purchase_id"), col("purchase_value"))
  }

  /** RIGHT-OUTER stream-stream join (Spark >= 3.1) — attribution
    * keeping every PURCHASE: matched ones pair with their preceding
    * clicks, organic/direct conversions (no click in the lookback
    * hour) emit null-padded click columns. The mirror of
    * [[attributionJoinLeftOuter]] with the preserved side swapped —
    * the shape a revenue pipeline wants (purchases are the ground
    * truth; clicks are optional context). A purchase's null emission
    * is deferred until the CLICK watermark passes its lookback hour
    * (purchase_ts − 1 h horizon + delay), so "organic" is a
    * watermark-certified fact; state keeps the same horizon-bounded
    * eviction as the inner join. Batch twin `stream_join_right`
    * (oracle-checked RIGHT JOIN). */
  def attributionJoinRightOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val (c, p, cond) = attributionSides(clicks, purchases)
    c.join(p, cond, "right_outer")
      // user_id comes from the PURCHASE side: the click side is null
      // on precisely the rows the outer join adds
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** Batch twin of the right-outer join. (purchase_id, click_id
    * NULLS LAST) is a total order: every purchase appears, organic
    * ones once with a null click_id. */
  def qStreamJoinRight(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    attributionJoinRightOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(col("purchase_id").asc, col("click_id").asc_nulls_last)
  }

  val qStreamJoinRightSql: String = """
    SELECT p.user_id AS user_id, c.event_id AS click_id,
      p.event_id AS purchase_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    RIGHT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY purchase_id, click_id NULLS LAST
  """.trim

  /** LEFT-SEMI stream-stream join — "which clicks converted", as a
    * set: each click emits AT MOST ONCE, with no purchase columns,
    * however many in-window purchases arrive. Same watermarks and
    * event-time range condition as [[attributionJoin]]; the semi
    * semantics are what an inner join + downstream dedup cannot give
    * on a stream (the dedup would need its own unbounded state —
    * here the join state itself marks a click emitted, and the same
    * watermark horizon that bounds the inner join's state evicts it).
    * In batch this is EXISTS (`qStreamJoinSemi`, oracle-checked). */
  def attributionJoinSemi(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val (c, p, cond) = attributionSides(clicks, purchases)
    c.join(p, cond, "left_semi")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("click_ts"))
  }

  /** Batch twin of the semi join (EXISTS form in the oracle). */
  def qStreamJoinSemi(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    attributionJoinSemi(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .select(col("user_id"), col("click_id"))
      .orderBy("click_id")
  }

  val qStreamJoinSemiSql: String = """
    SELECT c.user_id AS user_id, c.event_id AS click_id
    FROM events c
    WHERE c.event_type = 'click' AND EXISTS (
      SELECT 1 FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)
    ORDER BY click_id
  """.trim

  /** Batch twin of the full-outer join. (click_id, purchase_id) with
    * NULLS LAST is a total order: unmatched purchases sort after
    * every click under their null click_id, then uniquely by their
    * own id. */
  def qStreamJoinFull(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    attributionJoinFullOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(col("click_id").asc_nulls_last,
        col("purchase_id").asc_nulls_last)
  }

  val qStreamJoinFullSql: String = """
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      c.event_id AS click_id,
      p.event_id AS purchase_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id NULLS LAST, purchase_id NULLS LAST
  """.trim

  /** Batch twin of the outer join. Total order: purchase_id NULLS
    * LAST to match the oracle's ASC default (Spark's asc is
    * nulls-first — the one cross-engine sort divergence). */
  def qStreamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    attributionJoinLeftOuter(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy(col("click_id").asc, col("purchase_id").asc_nulls_last)
  }

  val qStreamJoinOuterSql: String = """
    SELECT c.user_id AS user_id, c.event_id AS click_id,
      p.event_id AS purchase_id, p.value AS purchase_value
    FROM events c LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
     AND p.event_type = 'purchase'
    WHERE c.event_type = 'click'
    ORDER BY click_id, purchase_id NULLS LAST
  """.trim

  /** Batch twin over the events fixture, DuckDB-checked. */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    attributionJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .orderBy("click_id", "purchase_id")
  }

  val qStreamJoinSql: String = """
    SELECT p.user_id AS user_id, c.event_id AS click_id,
      p.event_id AS purchase_id, p.value AS purchase_value
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
  """.trim

  // ---- streaming grouped top-k (bounded keyed state) ---------------------

  case class Scored(grp: String, id: Long, score: Double)
  case class Board(grp: String, top_ids: Seq[Long], top_scores: Seq[Double])

  /** Streaming grouped top-k — the streaming twin of the batch
    * [[graft.plans.TopKPerGroup]] operator (live leaderboards): keyed
    * state holds each group's current k best (score desc, id asc),
    * merged with every trigger's arrivals and re-emitted in update
    * mode. State is O(k) per group FOREVER — the bounded-heap
    * property that makes grouped top-k safe on an unbounded stream,
    * exactly as the batch operator's heaps bound the shuffle. */
  def topKStream(k: Int)(rows: Dataset[Scored]): Dataset[Board] = {
    import rows.sparkSession.implicits._
    rows
      .groupByKey(_.grp)
      .mapGroupsWithState[Seq[(Long, Double)], Board](GroupStateTimeout.NoTimeout) {
        (grp: String, batch: Iterator[Scored], state: GroupState[Seq[(Long, Double)]]) =>
          // One slot per id: a re-scored id REPLACES its old entry
          // (arrival order wins within a trigger) rather than holding
          // two board positions. An id re-scored below the cut simply
          // drops off — members evicted earlier can't be resurrected,
          // the inherent one-sided error of O(k)-state top-k.
          // plain Map, not ListMap: last-write-per-id is all the fold
          // needs (the sort below discards insertion order), and
          // ListMap.updated is O(n) per row — a hot group's trigger
          // would pay O((k+batch)²)
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              batch.map(e => (e.id, e.score)))
            .foldLeft(Map.empty[Long, Double]) {
              case (m, (id, sc)) => m.updated(id, sc)
            }
            .toSeq
            .sortBy { case (id, sc) => (-sc, id) }
            .take(k)
          state.update(merged)
          Board(grp, merged.map(_._1), merged.map(_._2))
      }
  }

  // ---- session windows (flatMapGroupsWithState) --------------------------

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  private val GapUs = 30L * 60 * 1000000 // 30-minute inactivity gap

  /** Event-time sessionization with explicit state + timeout — the
    * flatMapGroupsWithState surface: sessions close either when a new
    * event arrives past the gap (emitted immediately) or when the
    * watermark passes lastSeen+gap (emitted on timeout). State per
    * user is one open session — O(active users), watermark-bounded. */
  def sessionizeStream(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.start, s.lastSeen, s.nEvents))
          } else {
            val times = batch.map(e =>
              e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000).toSeq.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            for (t <- times) open match {
              case Some(s) if t - s.lastSeen <= GapUs =>
                // max/min, not assignment: a cross-batch out-of-order
                // event (late but above watermark) must never move the
                // session end BACKWARD (shortening the timeout) or
                // lose an earlier start
                open = Some(s.copy(start = math.min(s.start, t),
                  lastSeen = math.max(s.lastSeen, t),
                  nEvents = s.nEvents + 1))
              case Some(s) =>
                closed += ClosedSession(user, s.start, s.lastSeen, s.nEvents)
                open = Some(SessionState(t, t, 1))
              case None =>
                open = Some(SessionState(t, t, 1))
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSeen + GapUs) / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** foreachBatch CDC-apply sink: upsert each micro-batch into a
    * parquet key-value state (the streaming MERGE INTO pattern —
    * `ops/Merge`'s batch semantics driven per epoch). The new state is
    * written beside the live one and swapped in via two renames.
    * Crash-safety contract: NO crash point can expose a half-applied
    * batch or lose state — every point leaves a complete state under
    * either `dir` or `_old` (which the recovery preamble restores).
    * Concurrent-reader contract: a reader in the SAME job (the
    * foreachBatch owner) always sees a complete state; an external
    * reader polling between epochs may transiently find `dir` absent
    * during the swap window and must retry — a filesystem rename pair
    * cannot hide that window (the TableLog txn sink,
    * [[sinkToTableLog]], is the log-published answer when external
    * readers need snapshot visibility). Upsert is idempotent per
    * batch: replaying an epoch (as Structured Streaming does after a
    * failure, before offsets commit) converges to the same state —
    * with checkpointed offsets this is the standard effectively-
    * exactly-once sink recipe. Keys in the batch replace state rows
    * (keep-LAST within a batch by `verCol`, remaining columns as the
    * tie-break so replays of equal-version keys stay deterministic
    * too — row_number's bare arrival order differs between an epoch
    * and its replay). */
  def upsertBatch(stateDir: String, keyCol: String, verCol: String)
      (batch: DataFrame, epochId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.hadoop.fs.Path
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(stateDir + "_old")
    // Hadoop rename/delete report failure as FALSE, not an exception —
    // an unchecked false here silently drops the epoch (the batch is
    // never applied, yet the offsets commit). Fail the micro-batch
    // loudly instead; Structured Streaming will replay it.
    def mustRename(a: Path, b: Path): Unit =
      if (!fs.rename(a, b)) throw new java.io.IOException(
        s"upsertBatch: rename $a -> $b failed (state swap aborted)")
    def mustDelete(p: Path): Unit =
      if (fs.exists(p) && !fs.delete(p, true)) throw new java.io.IOException(
        s"upsertBatch: delete $p failed (state swap aborted)")
    // crash recovery FIRST: a death between rename(dir, old) and
    // rename(tmp, dir) leaves the only live state under _old — restore
    // it before reading, or the epoch replay would rebuild from the
    // batch alone and then delete the backup (permanent state loss)
    if (!fs.exists(dir) && fs.exists(old)) mustRename(old, dir)
    // keep-last per key within the batch; version first, then every
    // other column, so equal-version duplicates order deterministically
    val tieBreak = batch.columns.filter(c => c != verCol)
      .map(c => col(c).asc).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(verCol).desc +: tieBreak: _*)
    val dedupedBatch = batch
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
    val next =
      if (fs.exists(dir))
        spark.read.parquet(stateDir)
          .join(dedupedBatch.select(col(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(dedupedBatch)
      else dedupedBatch
    val tmp = new Path(stateDir + s"_epoch$epochId")
    next.write.mode("overwrite").parquet(tmp.toString)
    // swap order matters: _old is deleted ONLY after the new dir is in
    // place, so every crash point leaves a complete state under either
    // dir or _old (which the recovery preamble above restores)
    mustDelete(old)
    if (fs.exists(dir)) mustRename(dir, old)
    mustRename(tmp, dir)
    mustDelete(old)
  }

  /** Streaming ingestion INTO the transaction log — the
    * lakehouse-streaming integration: each micro-batch commits through
    * [[graft.sources.TableLog.appendIdempotent]] keyed by (app,
    * epochId), so Structured Streaming's epoch replays (crash before
    * offsets commit, or even a FULL checkpoint loss + restart from
    * scratch) skip instead of double-appending — exactly-once
    * end-to-end, readers see each batch atomically via the log, and
    * time travel / changesSince work over the ingested stream for
    * free. StreamingSpec replays the whole stream against the same
    * root and pins the row count unchanged. */
  def sinkToTableLog(stream: DataFrame, root: String, app: String,
      checkpoint: String, statsCols: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.sources.TableLog.appendIdempotent(
          batch.sparkSession, root, batch, app, epochId, statsCols): Unit
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  // ---- transformWithState (Spark 4 arbitrary-state API) ------------------

  case class Change(key: Long, ts: java.sql.Timestamp, value: String)
  /** `value = null` marks an expiry tombstone (timer fired). */
  case class ChangeOut(key: Long, ts_us: Long, value: String)

  /** Changelog compaction as a [[org.apache.spark.sql.streaming.StatefulProcessor]]
    * — the Spark-4 `transformWithState` successor to
    * `mapGroupsWithState` (typed state VARIABLES + event-time TIMERS
    * + per-state TTL, on the RocksDB state store): keep each key's
    * latest value, emit a row only when the value CHANGES, and let an
    * event-time timer drop keys idle longer than `retentionMs` —
    * state is bounded by the active-key horizon, not stream length
    * (the 100 TB stream requirement), and the expiry emits a null
    * tombstone so downstream consumers see the retraction.
    *
    * Semantics note, documented not hidden: after a key expires, a
    * re-arrival of the SAME value re-emits — "unchanged" is only
    * certifiable while the state lives.
    *
    * Rows apply in EVENT-TIME (ts, value) order and the applied
    * frontier is kept in state, so the changelog is
    * last-event-time-wins across batches: a late-but-above-watermark
    * row older than the frontier is skipped (never overwrites a newer
    * value), and the expiry timer only ever slides FORWARD. One timer
    * per key is maintained. */
  class LatestValueProcessor(retentionMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Change, ChangeOut] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues, ValueState}

    @transient private var latest: ValueState[String] = _
    @transient private var appliedTs: ValueState[Long] = _
    @transient private var timerAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      latest = getHandle.getValueState[String]("latest", Encoders.STRING,
        TTLConfig.NONE)
      appliedTs = getHandle.getValueState[Long]("appliedTs",
        Encoders.scalaLong, TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong,
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Change],
        timers: TimerValues): Iterator[ChangeOut] = {
      val ordered = rows.toArray.sortBy(c => (c.ts.getTime, c.value))
      val out = Seq.newBuilder[ChangeOut]
      // frontier from state: a cross-batch late row (ts below what has
      // already been applied) must not overwrite the newer value
      var maxTsMs =
        if (appliedTs.exists()) appliedTs.get() else Long.MinValue
      for (c <- ordered) {
        val t = c.ts.getTime
        if (t >= maxTsMs) {
          maxTsMs = t
          if (!latest.exists() || latest.get() != c.value) {
            latest.update(c.value)
            out += ChangeOut(key, t * 1000L, c.value)
          }
        }
      }
      if (maxTsMs != Long.MinValue) {
        appliedTs.update(maxTsMs)
        // slide the key's single expiry timer FORWARD only — an
        // all-late batch must not pull the expiry earlier
        val expiry = maxTsMs + retentionMs
        if (!timerAt.exists() || expiry > timerAt.get()) {
          if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
          getHandle.registerTimer(expiry)
          timerAt.update(expiry)
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[ChangeOut] = {
      latest.clear(); appliedTs.clear(); timerAt.clear()
      Iterator.single(ChangeOut(key, info.getExpiryTimeInMs * 1000L, null))
    }
  }

  /** Wire the processor: event-time mode requires a watermark on the
    * input; append mode emits the changelog. `lateness` widens the
    * watermark so out-of-order rows reach the processor — whose
    * event-time frontier (not arrival order) decides what applies. */
  def latestStateStream(changes: Dataset[Change],
      retentionMs: Long, lateness: String = "0 seconds"): Dataset[ChangeOut] = {
    import changes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    changes
      .withWatermark("ts", lateness)
      .groupByKey(_.key)
      .transformWithState(new LatestValueProcessor(retentionMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- incremental file-drop ingest: CSV / JSON ---------------------------

  private val StreamOrdersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  private def resetDirs(s: SparkSession, dirs: Seq[String]): org.apache.hadoop.fs.FileSystem = {
    val f = new org.apache.hadoop.fs.Path(dirs.head)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    dirs.foreach(d => f.delete(new org.apache.hadoop.fs.Path(d), true))
    f
  }

  private def dropTextFile(f: org.apache.hadoop.fs.FileSystem,
      dir: String, name: String, body: String): Unit = {
    val out = f.create(new org.apache.hadoop.fs.Path(dir, name), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Shared drop -> file-stream -> parquet-sink scaffold for the
    * incremental ingest rows: split-writes orders into the drop
    * directory as three files plus one junk drop, runs the caller's
    * reader configuration through a checkpointed parquet sink, and
    * aggregates the sink (minus rows the `quarantine` column flags).
    * One scaffold, two malformed-record contracts — a change to the
    * split, the trigger bound, or the sink wiring lands on both
    * formats at once. */
  private def streamIngest(s: SparkSession, dir: String, tag: String,
      writeDrop: (DataFrame, String) => Unit,
      junkName: String, junkBody: String,
      read: (org.apache.spark.sql.streaming.DataStreamReader, String) => DataFrame,
      quarantine: Option[Column] = None): DataFrame = {
    val root = graft.ops.Egress.outRoot(dir) + "/" + tag
    val (drop, sink, ckpt) = (root + "_drop", root + "_sink", root + "_ckpt")
    val f = resetDirs(s, Seq(drop, sink, ckpt))
    val orders = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    for (i <- 0 until 3)
      writeDrop(orders.filter(col("o_orderkey") % 3 === i), drop)
    dropTextFile(f, drop, junkName, junkBody)
    val q = read(s.readStream, drop)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val base = s.read.parquet(sink)
    quarantine.fold(base)(c => base.filter(c.isNull))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.ops.dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** Incremental CSV ingest over a drop directory (the reference's
    * streaming CSV reader lineage, `cpp/src/arrow/csv/reader.h`
    * StreamingReader — SURVEY §2.11): Spark's native file-stream
    * source with a DECLARED schema (no inference racing half-written
    * drops) and the malformed-record contract pinned —
    * `DROPMALFORMED` discards type-invalid junk lines without
    * poisoning the batch (the batch CSV reader's `csv_malformed`
    * contract, now on the incremental path). Exactly-once rides the
    * file-source offset log: each dropped file commits to the
    * checkpoint exactly once; StreamingSpec drives the stop-drop-
    * restart half. Scale: planning is an O(new files) listing per
    * trigger (bound it with maxFilesPerTrigger on a hot directory);
    * parsing is partition-parallel per file — no driver-side reads. */
  def qStreamCsv(s: SparkSession, dir: String): DataFrame =
    streamIngest(s, dir, "stream_csv",
      (df, drop) => df.write.mode("append").csv(drop),
      // junk a foreign producer could drop: a non-numeric key, a bare
      // comment line, a column-count blowout — all must vanish silently
      "zz-junk.csv", "garbage,O,1.25\n###\n1,2,3,4,5,6,7\n",
      (r, drop) => r.schema(StreamOrdersSchema)
        .option("mode", "DROPMALFORMED").csv(drop))

  val qStreamCsvSql: String = s"""
    SELECT o_orderstatus, COUNT(*) AS n,
      ${graft.ops.dsumSql("o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** The JSON half of the incremental ingest contract, exercising the
    * OTHER malformed mode: `PERMISSIVE` + `columnNameOfCorruptRecord`
    * quarantines unparseable lines as (all-null fields,
    * `_corrupt_record` = raw text) rows instead of dropping them —
    * the audit-friendly shape (a curation pipeline wants to COUNT
    * what it rejected; StreamingSpec asserts that count). The clean
    * aggregate filters the quarantine column, which the oracle hash
    * proves: an unfiltered corrupt row would surface as a NULL-status
    * group. Same exactly-once file-offset posture as [[qStreamCsv]]. */
  def qStreamJson(s: SparkSession, dir: String): DataFrame =
    streamIngest(s, dir, "stream_json",
      (df, drop) => df.write.mode("append").json(drop),
      "zz-junk.json", "{\"o_orderkey\": oops}\nnot json at all\n",
      (r, drop) => r
        .schema(StreamOrdersSchema.add(StructField("_corrupt_record", StringType)))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(drop),
      quarantine = Some(col("_corrupt_record")))

  val qStreamJsonSql: String = qStreamCsvSql
}
