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

  test("a side that merely CONTAINS a dim scan is not force-broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // customer⋈nation (nation inside) is itself joined to orders: the
      // outer join's left side contains a dim scan but is not one — the
      // rule must not broadcast the whole customer⋈nation intermediate
      val cn = graft.sources.Tables(spark, sfDir, "customer")
        .join(graft.sources.Tables(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
      val outer = cn.join(graft.sources.Tables(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"))
        .groupBy(col("n_name")).count()
      // exactly one broadcast join (the inner nation one), not two —
      // count in the plan text (collect() does not recurse through the
      // AdaptiveSparkPlan wrapper)
      val plan = outer.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(plan).length == 1,
        s"outer fact-fact join wrongly broadcast:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("supplier (SF-scaled) is not in the force-broadcast registry") {
    assert(!graft.sources.Tables.smallDims.contains("supplier"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.sources.Tables(spark, sfDir, "lineitem")
        .join(graft.sources.Tables(spark, sfDir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey")).count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"supplier join wrongly force-broadcast:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("explicit user hints are never overridden") {
    val j = graft.sources.Tables(spark, sfDir, "customer")
      .join(broadcast(graft.sources.Tables(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
