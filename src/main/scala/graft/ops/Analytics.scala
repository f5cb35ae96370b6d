package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-stream analytics (SURVEY §2 extension surface): ordered
  * funnel conversion and retention cohorts over the `events` fixture —
  * the two canonical product-analytics rollups a warehouse engine is
  * asked for first.
  *
  * Scale posture: both queries reduce the raw stream to per-user
  * minima/first-dates with partial+final hash aggregation before any
  * join, so the shuffled volume is O(#users), not O(#events). The
  * funnel's three stage frames join on user_id — at 100 TB these are
  * three shuffles of user-level rows (or zero extra shuffles if the
  * event table is bucketed by user_id, SURVEY §5); nothing ever
  * re-shuffles raw events.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Ordered funnel view → click → purchase with a 2-hour conversion
    * window per hop: a user converts at stage k only with an event
    * strictly later than — and within 2 h of — their stage-k-1 entry
    * time (first-touch semantics: entry time is the MIN qualifying
    * ts). Emits one row per stage with the surviving-user count. */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def stage(tpe: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts"))
    def within2h(ts: org.apache.spark.sql.Column, t0: org.apache.spark.sql.Column) =
      ts > t0 && unix_micros(ts) - unix_micros(t0) <= 7200L * 1000000L
    val v = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val c = stage("click").join(v, "user_id")
      .filter(within2h(col("ts"), col("t1")))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = stage("purchase").join(c, "user_id")
      .filter(within2h(col("ts"), col("t2")))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val rows = Seq(
      v.agg(lit(1).as("stage"), lit("view").as("event_type"),
        count(lit(1)).as("n_users")),
      c.agg(lit(2).as("stage"), lit("click").as("event_type"),
        count(lit(1)).as("n_users")),
      p.agg(lit(3).as("stage"), lit("purchase").as("event_type"),
        count(lit(1)).as("n_users")))
    rows.reduce(_.union(_)).orderBy("stage")
  }

  val qFunnelSql: String = """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
            AND epoch_us(e.ts) - epoch_us(v.t1) <= 7200000000
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
            AND epoch_us(e.ts) - epoch_us(c.t2) <= 7200000000
          GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 2, 'click', COUNT(*) FROM c
    UNION ALL
    SELECT 3, 'purchase', COUNT(*) FROM p
    ORDER BY stage
  """.trim

  /** Retention cohorts: users grouped by first-seen date, then the
    * count of distinct users active at each day offset 0..7. The
    * cohort date comes from one per-user min; the activity grid is a
    * distinct-on-(user, date) frame joined back — shuffled volume is
    * O(#users + #user-days), never raw events. */
  def qRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val firstSeen = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(firstSeen, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .filter(col("day_offset").between(0, 7))
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_date", "day_offset")
  }

  val qRetentionCohortSql: String = """
    WITH fs AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
                FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT cohort_date, datediff('day', cohort_date, d) AS day_offset,
      COUNT(DISTINCT act.user_id) AS n_active
    FROM act JOIN fs ON act.user_id = fs.user_id
    WHERE datediff('day', cohort_date, d) BETWEEN 0 AND 7
    GROUP BY cohort_date, day_offset
    ORDER BY cohort_date, day_offset
  """.trim

  /** First-order Markov transition matrix over per-user event
    * sequences — the user-journey statistic behind next-action
    * prediction and session simulation: order each user's events by
    * (ts, event_id), pair each with its successor via `lead`, count
    * (current → next) transitions, and normalize per current state to
    * transition probabilities.
    *
    * Scale shape: ONE shuffle on user_id for the lead window (per-user
    * partitions are bounded by per-user activity, never corpus-sized),
    * then a partial+final agg on the (cur, nxt) pairs — the 25-state
    * transition matrix is broadcast-sized output. The probability
    * denominator rides a second tiny agg over the matrix itself, not
    * the event stream. */
  def qMarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val wCur = org.apache.spark.sql.expressions.Window.partitionBy(col("cur"))
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(wCur), 6))
      .orderBy(col("cur"), col("nxt"))
  }

  val qMarkovTransitionsSql: String = """
    WITH seq AS (
      SELECT event_type AS cur,
        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS nxt
      FROM events),
    m AS (
      SELECT cur, nxt, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt)
    SELECT cur, nxt, n,
      ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY cur), 6) AS p
    FROM m ORDER BY cur, nxt
  """.trim
}
