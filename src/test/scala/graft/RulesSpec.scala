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

  // ---- WindowTopKRewriteRule --------------------------------------------

  private def windowIdiom(k: Int) = {
    import org.apache.spark.sql.expressions.Window
    graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)))
      .filter(col("rn") <= k)
  }

  test("row_number<=k idiom with rn dropped rewrites to TopKPerGroup, no Window/Sort") {
    val rewritten = windowIdiom(5).drop("rn")
    val optimized = rewritten.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerGroup"),
      s"window idiom not rewritten:\n$optimized")
    assert(!optimized.contains("Window") && !optimized.contains("Sort"),
      s"Window/Sort must vanish under the rewrite:\n$optimized")
    // answer identical to the direct operator (total order, so exact)
    val direct = graft.plans.TopKPerGroup(
      graft.sources.Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice")),
      Seq("l_returnflag"),
      Seq("l_extendedprice" -> false, "l_orderkey" -> true,
        "l_linenumber" -> true), 5)
    assert(rewritten.count() == direct.count() &&
      rewritten.exceptAll(direct).isEmpty && direct.exceptAll(rewritten).isEmpty)
  }

  test("conjunction form rn<=k AND p(x): rewrites with p as a residual filter above top-k") {
    val df = windowIdiom(5)
    val conj = df.filter(col("l_extendedprice") > 1000).drop("rn")
    val optimized = conj.queryExecution.optimizedPlan.toString
    assert(optimized.contains("TopKPerGroup") && !optimized.contains("Window"),
      s"conjunction not rewritten:\n$optimized")
    // equality vs the unrewritten semantics: the rank-KEPT form cannot
    // be rewritten (rn observable), so it computes the original plan;
    // compare multisets with rn projected away driver-side
    val reference = windowIdiom(5).filter(col("l_extendedprice") > 1000)
    assert(reference.queryExecution.optimizedPlan.toString.contains("Window"))
    val got = conj.collect().map(_.toSeq).groupBy(identity).view
      .mapValues(_.length).toMap
    val want = reference.collect().map(_.toSeq.dropRight(1)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(got == want, s"rewritten:\n$got\nreference:\n$want")
  }

  test("rank-observable queries are NOT rewritten (rn kept or rank() used)") {
    // rn kept in the output: the rank is observable, must be computed
    val keepsRn = windowIdiom(5) // no drop
      .queryExecution.optimizedPlan.toString
    assert(!keepsRn.contains("TopKPerGroup") && keepsRn.contains("Window"),
      s"must not rewrite when rn is in the output:\n$keepsRn")
    // rank() admits >k rows on ties — different semantics, no rewrite
    import org.apache.spark.sql.expressions.Window
    val rankForm = graft.sources.Tables(spark, sfDir, "lineitem")
      .withColumn("rk", rank().over(
        Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice").desc)))
      .filter(col("rk") <= 5).drop("rk")
      .queryExecution.optimizedPlan.toString
    assert(!rankForm.contains("TopKPerGroup"),
      s"rank() must not be treated as row_number:\n$rankForm")
  }

  test("GLOBAL row_number top-k (no PARTITION BY) is NOT rewritten — " +
      "and still answers correctly") {
    // a rewrite would plan ClusteredDistribution(Nil), which Spark
    // rejects at planning; the native window must keep handling it
    val df = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))))
      .filter(col("rn") <= 3).drop("rn")
    assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"),
      "global top-k must not rewrite to the grouped operator")
    val got = df.collect() // the planning crash would throw HERE
    assert(got.length == 3)
    val want = graft.sources.Tables(spark, sfDir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .select(col("l_orderkey")).limit(3).collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getLong(0)).toSeq == want)
  }

  test("force-broadcast matches the path's file-name component only — " +
      "a 'donation.parquet' fact is left alone") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rule_paths").toString
    (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.parquet(s"$dir/donation.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = spark.read.parquet(s"$dir/donation.parquet")
      val other = (0 until 100).map(i => (i.toLong, i * 2)).toDF("k", "n")
      val plan = fact.join(other, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"'donation.parquet' was force-broadcast by a suffix match:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
