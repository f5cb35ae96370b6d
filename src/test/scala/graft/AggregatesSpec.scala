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
