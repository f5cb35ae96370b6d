package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Window functions (SURVEY §2.5 — absent from the reference, declared
  * as Spark-native extension surface). Scale posture: every window is
  * partitioned (`Window.partitionBy`) so state is distributed per key;
  * the global-order case (`qWindowNtile`) goes through approx-quantile
  * range buckets + broadcast rank offsets instead of a single-task
  * global sort.
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** row_number/rank/dense_rank: top-3 orders per priority class by
    * price, o_orderkey tiebreak for full determinism. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("rnk"), col("drnk"),
        col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  val qWindowRankSql: String = """
    SELECT o_orderpriority, rn, rnk, drnk, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    ORDER BY o_orderpriority, rn
  """.trim

  /** lag/lead per user over event time: inter-event gap in seconds.
    * Aggregated per user (avg gap) for a compact deterministic result. */
  def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
      .groupBy(col("user_id"))
      .agg(count(col("gap_us")).as("n_gaps"),
        sum(col("gap_us")).as("total_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .filter(col("user_id") < 50)
      .orderBy(col("user_id"))
  }

  val qWindowLagSql: String = """
    SELECT user_id, COUNT(gap_us) AS n_gaps, CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
      MAX(gap_us) AS max_gap_us
    FROM (
      SELECT user_id,
        epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
      FROM events
    ) GROUP BY user_id HAVING user_id < 50 ORDER BY user_id
  """.trim

  /** Sliding frame aggregate: running sum + moving average of spend per
    * customer ordered by order date (rowsBetween 2-preceding..current). */
  def qWindowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(wRun)
          .cast("double"))
      .withColumn("mov_n", count(lit(1)).over(wMov))
      .filter(col("o_custkey") < 20)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_spend"), col("mov_n"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val qWindowFrameSql: String = """
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      COUNT(*) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
    FROM orders
    WHERE o_custkey < 20
    ORDER BY o_custkey, o_orderdate, o_orderkey
  """.trim

  /** ntile decile bucketing of customers by balance (tie-broken by key)
    * + per-bucket stats — computed WITHOUT a global single-partition
    * sort (the naive `Window.orderBy` plan moves the whole table to
    * one task; this one survives 100 TB):
    *
    *   1. approx-quantile range boundaries (driver state O(#buckets));
    *   2. each row → monotone range bucket, ranked locally per bucket;
    *   3. exact global rank = local rank + broadcast per-bucket offset;
    *   4. SQL NTILE's first-(N mod n)-buckets-get-one-extra formula.
    *
    * Exactness does not depend on boundary quality — boundaries only
    * balance the per-bucket work; ranks are exact by construction. */
  def qWindowNtile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val bounds = c.stat
      .approxQuantile("c_acctbal", (1 until 32).map(_ / 32.0).toArray, 0.001)
      .distinct.sorted.toSeq
    val bucketed = c.withColumn("bkt",
      size(filter(typedlit(bounds), b => b < col("c_acctbal"))))
    // per-bucket counts → cumulative offsets; O(#buckets) driver state,
    // same class as the quantile sketch above (never O(N))
    val cnts = bucketed.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offPairs = cnts.scanLeft((0, 0L, 0L)) { case ((_, acc, c0), (b, n)) =>
      (b, acc + c0, n)
    }.tail.map { case (b, off, _) => (b, off) }.toSeq
    val offs = s.createDataFrame(offPairs).toDF("bkt", "off")
    val wB = Window.partitionBy(col("bkt"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val nDf = c.agg(count(lit(1)).as("n_total"))
    val ranked = bucketed
      .withColumn("lrn", row_number().over(wB).cast(LongType))
      .join(broadcast(offs), Seq("bkt"))
      .crossJoin(broadcast(nDf))
      .withColumn("rank", col("off") + col("lrn"))
    // NTILE(10): q = N/10, r = N%10; first r buckets hold q+1 rows
    val deciled = ranked
      .withColumn("q", graft.functions.div(col("n_total"), lit(10L)))
      .withColumn("r", col("n_total") % 10)
      .withColumn("decile",
        when(col("rank") <= col("r") * (col("q") + 1),
          graft.functions.div(col("rank") - 1, col("q") + 1) + 1)
          .otherwise(col("r") +
            graft.functions.div(col("rank") - col("r") * (col("q") + 1) - 1,
              col("q")) + 1)
          .cast("int"))
    deciled
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("decile"))
  }

  val qWindowNtileSql: String = """
    SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM (
      SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS decile
      FROM customer
    ) GROUP BY decile ORDER BY decile
  """.trim

  /** Distribution window functions: percent_rank and cume_dist per
    * priority class (both are exact rationals (rank-1)/(n-1) and
    * rank/n evaluated in double — one correctly-rounded division on
    * integer operands, so bit-stable across engines). Partitioned
    * window → per-key distributed sort, no global order. */
  def qWindowPercent(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("pr"), col("cd"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val qWindowPercentSql: String = """
    SELECT o_orderpriority, o_orderkey, o_totalprice, pr, cd FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
        PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
    ) WHERE o_orderkey % 100 = 0
    ORDER BY o_orderpriority, o_orderkey
  """.trim

  /** Value window functions: first_value on the default running
    * frame, last_value on the explicit full frame (the default frame
    * would just echo the current row — the classic trap), nth_value
    * on the running frame (null until n rows have been seen; Spark
    * and DuckDB agree on the default RANGE frame). */
  def qWindowValue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .withColumn("fv", first(col("o_orderkey")).over(w))
      .withColumn("lv", last(col("o_orderkey")).over(wFull))
      .withColumn("nth", nth_value(col("o_orderkey"), 3).over(w))
      .filter(col("o_orderkey") % 300 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("fv"), col("lv"), col("nth"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val qWindowValueSql: String = """
    SELECT o_orderpriority, o_orderkey, fv, lv, nth FROM (
      SELECT o_orderpriority, o_orderkey,
        FIRST_VALUE(o_orderkey) OVER w AS fv,
        LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
        NTH_VALUE(o_orderkey, 3) OVER w AS nth
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE o_orderkey % 300 = 0
    ORDER BY o_orderpriority, o_orderkey
  """.trim

  /** RANGE frame on event time — the moving-window-by-VALUE frame
    * (here: each order's per-customer trailing 30 days), which ROWS
    * frames cannot express when rows are unevenly spaced. Peers (equal
    * order dates) enter the frame together in both engines — that's
    * RANGE semantics, and why the frame needs no tie-break key even
    * though the projection's ORDER BY does. Identical SQL text runs on
    * DuckDB; the interval-bounded frame stays a single windowed pass
    * (one shuffle on the partition key) at any scale. */
  val qWindowRangeSql: String = """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d,
      COUNT(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate
        RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS n_30d
    FROM orders WHERE o_custkey % 50 = 0
    ORDER BY o_custkey, o_orderkey
  """.trim

  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.Session(s)
    sess.registerTable("orders", graft.sources.Tables(s, dir, "orders"))
    sess.sql(qWindowRangeSql)
  }
}
