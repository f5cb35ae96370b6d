package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom whole-operator extension: grouped top-k must agree
  * exactly with the window-function idiom it replaces, and its plan
  * must show the two-phase (partial heap → exchange → final heap)
  * shape that bounds shuffled rows at k·groups·partitions.
  */
class TopKPerGroupSpec extends SparkSpec {

  private def windowTopK(groupCol: String, orderAsc: Boolean, k: Int) = {
    val base = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
    val o = if (orderAsc)
      Seq(col("l_extendedprice").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    else
      Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    base.withColumn("rn",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(o: _*)))
      .filter(col("rn") <= k).drop("rn")
  }

  private def customTopK(groupCol: String, orderAsc: Boolean, k: Int) =
    TopKPerGroup(
      graft.sources.Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice")),
      Seq(groupCol),
      Seq("l_extendedprice" -> orderAsc, "l_orderkey" -> true, "l_linenumber" -> true),
      k)

  test("custom top-k matches the window idiom (desc, k=5)") {
    val (a, b) = (customTopK("l_returnflag", orderAsc = false, 5),
      windowTopK("l_returnflag", orderAsc = false, 5))
    assert(a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("custom top-k matches the window idiom (asc, k=40 > partition row counts)") {
    val (a, b) = (customTopK("l_returnflag", orderAsc = true, 40),
      windowTopK("l_returnflag", orderAsc = true, 40))
    assert(a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("plan is two-phase with the exchange between partial and final") {
    // AdaptiveSparkPlanExec hides its input plan from collect(), so
    // assert on the rendered tree: final (partial=false) on top,
    // ENSURE_REQUIREMENTS exchange in the middle, partial below it
    val s = customTopK("l_returnflag", orderAsc = false, 3)
      .queryExecution.executedPlan.toString
    val (fin, part) = (s.indexOf("TopKPerGroup"), s.lastIndexOf("TopKPerGroup"))
    val ex = s.indexOf("Exchange hashpartitioning(l_returnflag")
    assert(fin >= 0 && fin < ex && ex < part,
      s"expected partial -> exchange -> final:\n$s")
    // bottom node renders "..., partial=true, sortBased=false"
    assert(s.substring(part).startsWith("TopKPerGroup") &&
      s.substring(part).takeWhile(_ != '\n').endsWith("true, false"),
      s"bottom node is not the partial phase:\n$s")
  }

  test("partial-phase early flush (tiny maxGroupsPerPartition) changes " +
      "shuffle volume, never the answer") {
    val key = "spark.graft.topk.maxGroupsPerPartition"
    spark.conf.set(key, "2") // orders has 3 statuses -> forced flushes
    try {
      val (a, b) = (customTopK("l_returnflag", orderAsc = false, 5),
        windowTopK("l_returnflag", orderAsc = false, 5))
      assert(a.count() == b.count() && a.exceptAll(b).isEmpty &&
        b.exceptAll(a).isEmpty)
      // high-cardinality group column under a 2-group flush bound
      val byKey = TopKPerGroup(
        graft.sources.Tables(spark, sfDir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice")),
        Seq("l_orderkey"), Seq("l_extendedprice" -> false), 2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc)
      val expect = graft.sources.Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      assert(byKey.count() == expect.count())
    } finally spark.conf.unset(key)
  }

  test("sort-based final phase: SortExec above the exchange, O(1)-state stream, same answer") {
    val confKey = "spark.graft.topk.strategy"
    spark.conf.set(confKey, "sort")
    try {
      val sorted = customTopK("l_returnflag", orderAsc = false, 5)
      val plan = sorted.queryExecution.executedPlan.toString
      // the final phase demanded a (group, order) sort: EnsureRequirements
      // plants a spilling SortExec between exchange and final node
      assert(plan.contains("Sort ["), s"expected a SortExec in:\n$plan")
      val (fin, part) = (plan.indexOf("TopKPerGroup"), plan.lastIndexOf("TopKPerGroup"))
      val srt = plan.indexOf("Sort [")
      assert(fin < srt && srt < part,
        s"SortExec must sit between final and partial:\n$plan")
      // high-group-cardinality shape (group = l_orderkey, thousands of
      // groups): sort mode must agree with the window idiom exactly
      val a = customTopK("l_orderkey", orderAsc = true, 2)
      val b = windowTopK("l_orderkey", orderAsc = true, 2)
      assert(a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    } finally spark.conf.unset(confKey)
    // and back in default heap mode there is no extra sort
    val planHeap = customTopK("l_returnflag", orderAsc = false, 5)
      .queryExecution.executedPlan.toString
    assert(!planHeap.contains("Sort ["), s"heap mode must not sort:\n$planHeap")
  }

  test("final phase auto-switches hash -> external sort past the group " +
      "bound, with no strategy conf, and the answer is exact") {
    val key = "spark.graft.topk.maxGroupsPerPartition"
    spark.conf.set(key, "8") // thousands of l_orderkey groups >> 8
    try {
      // no spark.graft.topk.strategy set: the plan is heap mode, the
      // TASKS must degrade themselves to the spilling sorter
      assert(spark.conf.getOption("spark.graft.topk.strategy").isEmpty)
      val a = customTopK("l_orderkey", orderAsc = true, 2)
      assert(!a.queryExecution.executedPlan.toString.contains("Sort ["),
        "fallback must be runtime, not a planned SortExec")
      val b = windowTopK("l_orderkey", orderAsc = true, 2)
      assert(a.count() == b.count() && a.exceptAll(b).isEmpty &&
        b.exceptAll(a).isEmpty)
    } finally spark.conf.unset(key)
  }

  test("k larger than every group returns the whole table") {
    val n = graft.sources.Tables(spark, sfDir, "orders").count()
    val all = TopKPerGroup(
      graft.sources.Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderstatus"), Seq("o_orderkey" -> true), k = Int.MaxValue)
    assert(all.count() == n)
  }
}
