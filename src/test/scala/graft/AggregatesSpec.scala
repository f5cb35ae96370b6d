package graft

import org.apache.spark.sql.functions._

/** Sketch-aggregate accuracy: the checks the driver's exact-match
  * oracle cannot express (approx results are engine-specific).
  */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct (HLL) lands within 5% of exact") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
    val got = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
      countDistinct(col("l_orderkey")).as("exact")).collect()(0)
    val (approx, exact) = (got.getLong(0), got.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("qApproxQuantile lands within rank error of the exact per-group percentiles") {
    // the GK sketch bounds RANK error, not value error — the query
    // itself now emits the q ± 0.03 value-bracket check (the bounded
    // oracle form); assert every group's flags hold and the exact
    // median column matches an independent recompute
    val rows = graft.ops.Aggregates.qApproxQuantile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx median outside exact [p47, p53]")
      assert(r.getBoolean(3),
        s"${r.getString(0)}: approx p90 outside exact [p87, p93]")
    }
    val exactMed = graft.sources.Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(round(median(col("o_totalprice")), 6).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r =>
      assert(r.getDouble(1) == exactMed(r.getString(0)),
        s"${r.getString(0)}: med_exact drifted"))
  }

  test("approx_percentile brackets the exact median") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
    val approxMed = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.01)(0)
    val sorted = li.select("l_extendedprice").orderBy("l_extendedprice")
      .collect().map(_.getDouble(0))
    val exactMed = sorted(sorted.length / 2)
    assert(math.abs(approxMed - exactMed) / exactMed < 0.05)
  }

  test("HLL estimate is deterministic across runs (fixed internal seed)") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
    def run() = li.agg(approx_count_distinct(col("l_partkey"), 0.02))
      .collect()(0).getLong(0)
    assert(run() == run())
  }
}
