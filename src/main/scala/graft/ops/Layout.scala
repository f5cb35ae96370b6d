package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Z-order (Morton-curve) data layout for multi-dimensional pruning —
  * the write-side twin of predicate pushdown: at 100 TB a filter can
  * only skip what the LAYOUT made skippable. A single-column sort
  * clusters one dimension and scrambles the rest; interleaving the
  * bits of k quantized columns clusters ALL of them at once, so
  * per-file (and per-row-group) min/max ranges stay narrow on every
  * z-ordered dimension and a selective filter on ANY of them prunes
  * most files (Parquet stats do the skipping — no runtime cost).
  *
  * Reference context: the dataset layer prunes on partition-key
  * guarantees (`cpp/src/arrow/dataset/partition.h:46-62`); z-ordering
  * extends the same idea INSIDE files to non-partition columns.
  * The curve math is the standard Morton magic-number bit spread.
  *
  * All of it is `functions._` integer arithmetic — codegen'd, no UDF,
  * and exactly reproducible in any engine (the `zorder_cluster`
  * oracle recomputes the keys bit-for-bit in DuckDB).
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton magic
    * numbers): ...b2 b1 b0 → ...b2 0 b1 0 b0. */
  private[graft] def mortonSpread16(x: Column): Column = {
    val a = x.cast(LongType).bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit values: x in even bits, y odd. */
  private[graft] def mortonKey(x16: Column, y16: Column): Column =
    mortonSpread16(x16).bitwiseOR(shiftleft(mortonSpread16(y16), 1))

  /** Quantize `c` to [0, 65535] with linear buckets over [lo, hi]
    * (clamped). Linear scaling keeps the key a pure per-row function —
    * rank/quantile bucketing clusters better under heavy skew but
    * makes the key depend on the whole dataset; swap in
    * `approxQuantile` boundaries for that regime. */
  private[graft] def quantize16(c: Column, lo: Double, hi: Double): Column =
    least(greatest(
      (((c.cast(DoubleType) - lo) / (hi - lo)) * 65535.0).cast(LongType),
      lit(0L)), lit(65535L))

  /** Rewrite `df` into `nFiles` z-ordered parquet files under `dir`:
    * one stats pass for the two columns' min/max (4 driver-side
    * numbers — at production scale read them from catalog stats
    * instead), then range-partition + sort by the Morton key and drop
    * it. Range partitioning gives files disjoint z-ranges; the
    * within-file sort extends the clustering to row groups. */
  def zorderBy(df: DataFrame, c1: String, c2: String, nFiles: Int,
      dir: String): Unit = {
    val stats = df.agg(
      min(col(c1)).cast(DoubleType), max(col(c1)).cast(DoubleType),
      min(col(c2)).cast(DoubleType), max(col(c2)).cast(DoubleType)).head()
    val (lo1, hi1, lo2, hi2) = (stats.getDouble(0), stats.getDouble(1),
      stats.getDouble(2), stats.getDouble(3))
    df.withColumn("_zkey",
        mortonKey(quantize16(col(c1), lo1, hi1), quantize16(col(c2), lo2, hi2)))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(dir)
  }

  /** Oracle-checked Morton math: 16-bit dims from lineitem keys,
    * interleaved, grouped by the top byte of the curve position —
    * every z-key crosses the DuckDB twin, which re-derives the spread
    * with the same magic numbers. The bucket aggregate also shows the
    * locality property the layout relies on: each curve bucket covers
    * a bounded box of (x, y). */
  def qZorderCluster(s: SparkSession, dir: String): DataFrame = {
    val x = pmod(col("l_orderkey"), lit(65536L))
    val y = pmod(col("l_partkey"), lit(65536L))
    Tables(s, dir, "lineitem")
      .select(mortonKey(x, y).as("zkey"), x.as("x16"), y.as("y16"))
      .groupBy(shiftright(col("zkey"), 24).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("zkey")).as("z_min"), max(col("zkey")).as("z_max"),
        min(col("x16")).as("x_min"), max(col("x16")).as("x_max"),
        min(col("y16")).as("y_min"), max(col("y16")).as("y_max"))
      .orderBy(col("zbucket"))
  }

  val qZorderClusterSql: String = """
    WITH d AS (
      SELECT l_orderkey % 65536 AS x, l_partkey % 65536 AS y FROM lineitem),
    sp AS (
      SELECT x, y,
        ((x | (x << 8)) & 16711935) AS xa, ((y | (y << 8)) & 16711935) AS ya
      FROM d),
    sp2 AS (
      SELECT x, y,
        ((xa | (xa << 4)) & 252645135) AS xb, ((ya | (ya << 4)) & 252645135) AS yb
      FROM sp),
    sp3 AS (
      SELECT x, y,
        ((xb | (xb << 2)) & 858993459) AS xc, ((yb | (yb << 2)) & 858993459) AS yc
      FROM sp2),
    z AS (
      SELECT x, y,
        (((xc | (xc << 1)) & 1431655765)
          | ((((yc | (yc << 1)) & 1431655765)) << 1)) AS zkey
      FROM sp3)
    SELECT zkey >> 24 AS zbucket, COUNT(*) AS n,
      MIN(zkey) AS z_min, MAX(zkey) AS z_max,
      MIN(x) AS x_min, MAX(x) AS x_max,
      MIN(y) AS y_min, MAX(y) AS y_max
    FROM z GROUP BY 1 ORDER BY 1
  """.trim
}
