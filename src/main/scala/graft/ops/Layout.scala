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

  /** OPTIMIZE ZORDER (Delta parity) over a [[graft.sources.TableLog]]
    * table: rewrite the live set into `nFiles` Morton-clustered files
    * ([[zorderBy]]) and publish the swap as ONE atomic dataChange=false
    * commit with FRESH per-file stats on both clustering columns —
    * so a [[graft.sources.TableLog.readBox]] after the optimize
    * prunes files on either dimension or both, where the pre-optimize
    * commit layout (each commit spanning the full key range) could
    * prune nothing. Old snapshots keep reading the old files; time
    * travel across the optimize sees identical rows. */
  def optimizeZorder(s: SparkSession, root: String,
      c1: String, c2: String, nFiles: Int): Int = {
    // file list + DV state pinned ONCE with the snapshot frame: the
    // pinned files become the swap's remove set and publish
    // CAS-verifies the DV state — a racing append keeps its rows, a
    // racing delete aborts this optimize (never the reverse)
    val (old, dv0, snap) = graft.sources.TableLog.pinSnapshot(s, root)
    graft.sources.TableLog.rewrite(s, root, statsCols = Seq(c1, c2),
      expectDvs = Some(dv0), base = Some(old))(
      dir => zorderBy(snap, c1, c2, nFiles, dir))
  }

  /** Declared OPTIMIZE query: three appends that each span the whole
    * key range (the worst layout for pruning — every range read must
    * open every file), then OPTIMIZE ZORDER BY (l_orderkey,
    * l_partkey), then a stats-pruned box read off the optimized
    * snapshot. The oracle replays the box predicate over raw
    * lineitem — the optimize must be answer-invariant; the PRUNING
    * payoff is pinned by TableLogSpec (files opened drops after
    * optimize). */
  def qLogOptimize(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/log_optimize"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    val li = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    for (i <- 0 until 3)
      graft.sources.TableLog.append(s, root,
        li.filter(pmod(col("l_partkey"), lit(3)) === i),
        statsCols = Seq("l_orderkey", "l_partkey"))
    optimizeZorder(s, root, "l_orderkey", "l_partkey", 8)
    graft.sources.TableLog
      .readBox(s, root, "l_orderkey", 100, 400, "l_partkey", 0, 1000000000L)
      .orderBy("l_orderkey", "l_partkey", "l_quantity")
  }

  val qLogOptimizeSql: String = """
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_orderkey < 2000
      AND l_orderkey BETWEEN 100 AND 400
      AND l_partkey BETWEEN 0 AND 1000000000
    ORDER BY l_orderkey, l_partkey, l_quantity
  """.trim

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

  /** Hash-bucketed table layout + co-located join — the write-side
    * answer to the join shuffle, and the 100 TB companion to
    * [[zorderBy]]: z-order makes FILTERS cheap, bucketing makes JOINS
    * cheap. Both fact tables are written `bucketBy(N, key)` on the
    * join key; a scan of a bucketed table reports
    * `HashPartitioning(key, N)` as its output partitioning, so the
    * sort-merge join's distribution requirement is already satisfied
    * and NEITHER side shuffles — at 100 TB that deletes the two
    * largest exchanges in the plan entirely (the nightly-join shape:
    * pay one bucketed write, then every subsequent join is
    * exchange-free). Reference context: the dataset layer's
    * directory-partition guarantees (`cpp/src/arrow/dataset/
    * partition.h:46-62`) give per-file key invariants for PRUNING;
    * bucketing is the same invariant aimed at join CO-LOCATION,
    * which the reference leaves to its single-node hash join.
    *
    * `sortBy(key)` clusters each bucket file on the key so the merge
    * side reads presorted runs; Spark still inserts a (local,
    * exchange-free) Sort when a bucket spans several files — the
    * guarantee being bought here is zero ShuffleExchange, asserted in
    * ScaleSpec. The `merge` hint pins the sort-merge strategy so the
    * demonstration doesn't degenerate to a broadcast join at the small
    * test SF (at 100 TB neither side fits a broadcast anyway).
    */
  private def bucketedTable(s: SparkSession, dir: String, table: String,
      cols: Seq[String], key: String, nBuckets: Int): String = {
    val name = ("bj_" + table + "_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")).toLowerCase
    // one write per (session, fixture): the whole point of bucketing
    // is write-once / join-many
    if (!s.catalog.tableExists(name)) {
      // repartition(nBuckets, key) uses the SAME murmur3-mod-N id
      // expression bucketing does, so each write task sees exactly one
      // bucket -> one file per bucket (256 task-files otherwise), and
      // single-file buckets let the scan trust the sortBy order. At
      // real scale use more buckets, not more files per bucket.
      Tables(s, dir, table).select(cols.map(col): _*)
        .repartition(nBuckets, col(key))
        .write.mode("overwrite").format("parquet")
        .bucketBy(nBuckets, key).sortBy(key)
        .option("path", Egress.outRoot(dir) + "/bucketed/" + name)
        .saveAsTable(name)
    }
    name
  }

  /** lineitem ⋈ orders on orderkey over the bucketed layout (zero
    * exchanges below the join), then the usual deterministic rollup.
    * The only shuffle in the whole plan is the 5-group aggregate
    * above the join — O(groups), not O(rows). */
  def qBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val lt = bucketedTable(s, dir, "lineitem",
      Seq("l_orderkey", "l_extendedprice"), "l_orderkey", 8)
    val ot = bucketedTable(s, dir, "orders",
      Seq("o_orderkey", "o_orderpriority"), "o_orderkey", 8)
    s.table(lt).hint("merge")
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  val qBucketJoinSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_items,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim
}
