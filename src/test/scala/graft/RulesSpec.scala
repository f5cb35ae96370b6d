package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule: joins against registered fixed-size
  * dims broadcast even when Catalyst's size estimate would not.
  */
class RulesSpec extends SparkSpec {

  test("small-dim join broadcasts without an explicit hint") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.sources.Tables(spark, sfDir, "customer")
        .join(graft.sources.Tables(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"small-dim side not broadcast:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("fact-fact joins are left alone by the rule") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.sources.Tables(spark, sfDir, "lineitem")
        .join(graft.sources.Tables(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"fact join wrongly broadcast:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("explicit user hints are never overridden") {
    val j = graft.sources.Tables(spark, sfDir, "customer")
      .join(broadcast(graft.sources.Tables(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
