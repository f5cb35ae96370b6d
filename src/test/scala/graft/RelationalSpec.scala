package graft

import org.apache.spark.sql.types._

/** Smoke + shape tests for the SURVEY §2 relational queries. Exact
  * value parity vs DuckDB is the driver's t2 gate (tools/oracle_check.py
  * mirrors it locally); here we pin row counts / schemas / invariants at
  * sf0.001 so regressions fail fast in `sbt test`.
  */
class RelationalSpec extends SparkSpec {

  test("every declared query runs and every query has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "oracle entries without a query")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg: six groups of (returnflag, linestatus), counts sum to filtered size") {
    val df = SparkEntry.queries("q1_agg")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= 6 && rows.nonEmpty)
    assert(df.schema("count_order").dataType == LongType)
    // groups are sorted
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("topk is sorted desc by extendedprice and limited to 100") {
    val prices = SparkEntry.queries("topk")(spark, sfDir)
      .collect().map(_.getDouble(2))
    assert(prices.length == 100)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("filter_proj predicate holds on every output row") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("filter_proj")(spark, sfDir)
    assert(df.filter(col("l_linenumber") === 7).count() == 0)
  }

  test("distinct returns unique pairs") {
    val df = SparkEntry.queries("distinct")(spark, sfDir)
    assert(df.count() == df.dropDuplicates().count())
  }

  test("events ns-timestamp loads as TimestampType") {
    val df = graft.sources.Tables(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("filter pushdown reaches the parquet scan") {
    val df = SparkEntry.queries("filter_proj")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"),
      s"no pushdown in plan:\n$plan")
  }
}
