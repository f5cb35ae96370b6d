package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Data-profiling pass — the ANALYZE/summary-statistics analogue of
  * the reference's per-column compute kernels (count/min/max over
  * arrays: /root/reference/cpp/src/arrow/compute/kernels/aggregate_basic.cc,
  * rust/arrow/src/compute/kernels/aggregate.rs), lifted to a table
  * profile: per column, null count, distinct count, and min/max.
  *
  * Scale shape: ONE scan computes every per-column statistic in a
  * single partial+final global agg (no shuffle of row data — only the
  * 1-row partial results move), then the 1×N stat row unpivots to
  * N-rows-of-stats with `stack` on the driver-sized result. The naive
  * alternative — one `SELECT count(...) FROM t` per column — scans
  * the table N times; at 100 TB that is N×100 TB of I/O versus one.
  * Numeric min/max stay typed (DOUBLE) and string min/max stay
  * VARCHAR — no double→string formatting, which engines render
  * differently.
  */
object Profile {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Profile of the `orders` fixture's key/status/price columns. */
  def qProfileTable(s: SparkSession, dir: String): DataFrame = {
    def numStats(c: String) = Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      count_distinct(col(c)).as(s"${c}_distinct"),
      min(col(c)).cast(DoubleType).as(s"${c}_min"),
      max(col(c)).cast(DoubleType).as(s"${c}_max"))
    def strStats(c: String) = Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      count_distinct(col(c)).as(s"${c}_distinct"),
      min(col(c)).as(s"${c}_min_s"),
      max(col(c)).as(s"${c}_max_s"))
    // one agg per profiled column: three DISTINCT columns in one agg
    // would plan through Expand ×4 (every row quadrupled into one big
    // hash map — the same multi-distinct trap as approx_distinct's old
    // form). Split, each side is the Expand-free single-distinct plan,
    // the three independent subtrees schedule concurrently, and the
    // single-row joins are free.
    val orders = t(s, dir, "orders")
    val ckStats = numStats("o_custkey") :+ count(lit(1)).as("n_rows")
    val stStats = strStats("o_orderstatus")
    val tpStats = numStats("o_totalprice")
    orders.agg(ckStats.head, ckStats.tail: _*)
      .crossJoin(orders.agg(stStats.head, stStats.tail: _*))
      .crossJoin(orders.agg(tpStats.head, tpStats.tail: _*))
      .select(expr("""stack(3,
        'o_custkey', n_rows, o_custkey_nulls, o_custkey_distinct,
          o_custkey_min, o_custkey_max, CAST(NULL AS STRING), CAST(NULL AS STRING),
        'o_orderstatus', n_rows, o_orderstatus_nulls, o_orderstatus_distinct,
          CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), o_orderstatus_min_s, o_orderstatus_max_s,
        'o_totalprice', n_rows, o_totalprice_nulls, o_totalprice_distinct,
          o_totalprice_min, o_totalprice_max, CAST(NULL AS STRING), CAST(NULL AS STRING))
        AS (column_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"""))
      .orderBy("column_name")
  }

  val qProfileTableSql: String = """
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
        SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS ck_nulls,
        COUNT(DISTINCT o_custkey) AS ck_distinct,
        CAST(MIN(o_custkey) AS DOUBLE) AS ck_min, CAST(MAX(o_custkey) AS DOUBLE) AS ck_max,
        SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS st_nulls,
        COUNT(DISTINCT o_orderstatus) AS st_distinct,
        MIN(o_orderstatus) AS st_min, MAX(o_orderstatus) AS st_max,
        SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS tp_nulls,
        COUNT(DISTINCT o_totalprice) AS tp_distinct,
        CAST(MIN(o_totalprice) AS DOUBLE) AS tp_min, CAST(MAX(o_totalprice) AS DOUBLE) AS tp_max
      FROM orders)
    SELECT * FROM (
      SELECT 'o_custkey' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
        CAST(ck_nulls AS BIGINT) AS n_nulls, CAST(ck_distinct AS BIGINT) AS n_distinct,
        ck_min AS min_num, ck_max AS max_num,
        CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM s
      UNION ALL
      SELECT 'o_orderstatus', CAST(n_rows AS BIGINT), CAST(st_nulls AS BIGINT),
        CAST(st_distinct AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        st_min, st_max FROM s
      UNION ALL
      SELECT 'o_totalprice', CAST(n_rows AS BIGINT), CAST(tp_nulls AS BIGINT),
        CAST(tp_distinct AS BIGINT), tp_min, tp_max,
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM s)
    ORDER BY column_name
  """.trim

  /** Fixed-width histogram of `events.value` (floor-bucket; the
    * binning every profiling UI draws). One scan, one few-group agg —
    * the bucket expression is codegen'd, counts are partial+final. */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select((floor(col("value") / 10) * 10).cast(LongType).as("bucket_lo"),
        col("value"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("bucket_min"),
        max(col("value")).as("bucket_max"))
      .orderBy("bucket_lo")

  val qHistogramSql: String = """
    SELECT CAST(FLOOR("value" / 10) * 10 AS BIGINT) AS bucket_lo,
      COUNT(*) AS n, MIN("value") AS bucket_min, MAX("value") AS bucket_max
    FROM events GROUP BY 1 ORDER BY 1
  """.trim
}
