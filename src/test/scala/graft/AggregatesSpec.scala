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
    val approx = graft.ops.Aggregates.qApproxQuantile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // the GK sketch bounds RANK error, not value error — assert each
    // approx value falls inside the exact value bracket at q ± 0.03
    val exact = graft.sources.Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(percentile(col("o_totalprice"), lit(0.47)).as("m_lo"),
        percentile(col("o_totalprice"), lit(0.53)).as("m_hi"),
        percentile(col("o_totalprice"), lit(0.87)).as("p90_lo"),
        percentile(col("o_totalprice"), lit(0.93)).as("p90_hi")).collect()
    assert(exact.nonEmpty)
    for (r <- exact) {
      val (am, ap90) = approx(r.getString(0))
      assert(am >= r.getDouble(1) && am <= r.getDouble(2),
        s"${r.getString(0)}: approx median $am outside exact [p47, p53] = " +
          s"[${r.getDouble(1)}, ${r.getDouble(2)}]")
      assert(ap90 >= r.getDouble(3) && ap90 <= r.getDouble(4),
        s"${r.getString(0)}: approx p90 $ap90 outside exact [p87, p93] = " +
          s"[${r.getDouble(3)}, ${r.getDouble(4)}]")
    }
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
