package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-posture asserts: the plan shapes that decide whether a query
  * survives a 100x data blow-up — bucketed co-located joins (no
  * shuffle on the join key), broadcast thresholds, and pushdown on the
  * star-schema path.
  */
class ScaleSpec extends SparkSpec {

  test("answers are shuffle-partition-count invariant (the 100 TB re-partition claim)") {
    // the blanket determinism claim behind every decimal-sum and
    // key-hash-gate design choice: changing the parallelism must
    // never change an answer. Representative set: float-sum rollup,
    // multi-shuffle join+agg, windowed regimes, sampled gate.
    val names = Seq("q1_agg", "quality_repetition", "join_sortmerge",
      "mix_temperature", "scd2_intervals", "budget_select")
    for (name <- names) {
      val at32 = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        val at7 = SparkEntry.queries(name)(spark, sfDir).collect().toSeq
        assert(at7 == at32,
          s"$name changed under a different partition count " +
            s"(${at7.length} vs ${at32.length} rows)")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
  }

  test("bucketed tables co-locate: equi-join plans with zero exchanges") {
    val wh = Files.createTempDirectory("graft_bucketed").toString
    val o = graft.sources.Tables(spark, sfDir, "orders")
    val l = graft.sources.Tables(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not shuffle — bucket layout IS the partitioning
      val joinPart = plan.split("HashAggregate").last
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey") &&
        !joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join re-shuffled:\n$plan")
      assert(j.agg(sum("n")).collect()(0).getLong(0) ==
        graft.sources.Tables(spark, sfDir, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("dimension join broadcasts; fact-fact join shuffles on the key") {
    val dims = graft.ops.Joins.qJoinBroadcast(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(dims.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$dims")
  }

  test("runtime bloom filter prunes the probe side of a selective fact-fact join") {
    // Catalyst's InjectRuntimeFilter: a selective filter on one fact
    // side becomes a bloom filter evaluated inside the OTHER side's
    // scan stage — at 100 TB this is the difference between shuffling
    // the whole probe table and shuffling the ~matching slice. The
    // size thresholds are tuned for real tables; drop them so the
    // fixture-scale join demonstrates the mechanism.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // at fixture scale the dim side is broadcastable and Catalyst
      // (correctly) skips runtime filters for broadcast joins — force
      // the shuffle-join shape the rule targets at real scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> conf.get(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val orders = graft.sources.Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000)
      val li = graft.sources.Tables(spark, sfDir, "lineitem")
      val joined = li.hint("MERGE").join(orders.hint("MERGE"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"no runtime bloom filter injected:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("MERGE hint plans a SortMergeJoin on the fact-fact join") {
    val plan = graft.ops.Joins.qJoinSortMerge(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"MERGE hint ignored:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "fact-fact join must not broadcast under the MERGE hint")
  }

  test("SHUFFLE_HASH hint plans a ShuffledHashJoin with no sort on either side") {
    val plan = graft.ops.Joins.qJoinShuffleHash(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"SHUFFLE_HASH hint ignored:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "shuffled-hash join must not fall back to sort-merge")
  }

  test("salted join returns exactly the plain join's rows") {
    val l = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.ops.Joins.saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    // the join key really is (key, salt): both sides' plans carry _salt
    val plan = graft.ops.Joins.saltedJoin(l, o, "l_orderkey", "o_orderkey", 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"))
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // one hot key carrying ~95% of the left side — the org-id/null-key
    // shape that stalls a 1000-executor job on one straggler task.
    // Salting (previous test) is the manual fix; this pins the
    // automatic one: AQE detects the oversized partition post-shuffle
    // and fans it out, so the declarative plan self-heals at scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val left = spark.range(0, 300000)
        .select(when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 1000)
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 10).as("w"))
      val j = left.join(right, "k")
      // execute THIS queryExecution (count() would plan its own), so
      // the AdaptiveSparkPlan below reflects the post-run final plan
      assert(j.collect().length == 300000)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("connectedComponents converges in O(diameter) passes and the " +
      "max-iteration guard trips instead of spinning") {
    val ss = spark
    import ss.implicits._
    // path graph 0-1-2-...-9: diameter 9, min-label propagation needs
    // <= diameter+1 passes (one extra to observe the fixpoint)
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, iters) =
      graft.ops.Dedup.connectedComponentsWithStats(chain, maxIters = 50)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (0L to 9L).map(_ -> 0L).toMap)
    assert(iters <= 10, s"expected <= diameter+1 passes, took $iters")
    // two disjoint triangles converge in 2 passes (diameter 1 + fixpoint)
    val tris = Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L), (11L, 12L),
      (10L, 12L)).toDF("d1", "d2")
    val (tl, ti) = graft.ops.Dedup.connectedComponentsWithStats(tris, 50)
    assert(tl.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    assert(ti <= 3)
    val e = intercept[IllegalStateException] {
      graft.ops.Dedup.connectedComponentsWithStats(chain, maxIters = 3)
    }
    assert(e.getMessage.contains("no fixpoint after 3"))
  }

  test("connectedComponents: random graphs match a driver-side " +
      "union-find exactly (both the fast path and the star phase)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 12) {
      val n = 8 + rnd.nextInt(25)
      val nEdges = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        // driver-side union-find ground truth (min element as root)
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = touched.map(v => v -> find(v.toInt).toLong).toMap
        // deep components exercise the star phase; shallow ones the
        // fast path — the 1000-node path test pins the former alone
        val got = graft.ops.Dedup
          .connectedComponentsWithStats(edges.toDF("d1", "d2"), maxIters = 40)
          ._1.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == want,
          s"trial $trial (n=$n edges=${edges.size}): $got != $want")
      }
    }
  }

  test("connectedComponents: a 1000-node path converges in O(log n) " +
      "star rounds, not O(diameter) propagation passes") {
    val ss = spark
    import ss.implicits._
    // diameter 999 — min-label propagation would need 1000 passes;
    // the large-star/small-star phase must crack it in ~log n rounds
    val longChain = (0L until 999L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, iters) =
      graft.ops.Dedup.connectedComponentsWithStats(longChain, maxIters = 20)
    assert(iters <= 12, s"expected <= 12 total passes, took $iters")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 1000)
    assert(got.forall(_._2 == 0L),
      s"non-root labels: ${got.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("z-order layout keeps per-file bounds narrow on BOTH dimensions; " +
      "single-column sort only on its own") {
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax}
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val sDir = Files.createTempDirectory("graft_sorted").toString
    graft.ops.Layout.zorderBy(li, "l_orderkey", "l_partkey", 8, zDir)
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sDir)

    def fileBounds(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(fmin("l_orderkey"), fmax("l_orderkey"),
          fmin("l_partkey"), fmax("l_partkey"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val zb = fileBounds(zDir)
    val sb = fileBounds(sDir)
    assert(zb.length == 8 && sb.length == 8)

    // box query on the NON-sorted dimension: an eighth of the partkey
    // domain. Parquet stats prune a file iff its [min,max] misses the box.
    val (pLo, pHi) = (li.agg(fmin("l_partkey")).head().getLong(0),
      li.agg(fmax("l_partkey")).head().getLong(0))
    val width = (pHi - pLo) / 8
    val (qLo, qHi) = (pLo + 3 * width, pLo + 4 * width)
    def hits(b: Array[(Long, Long, Long, Long)]): Int =
      b.count { case (_, _, lo, hi) => hi >= qLo && lo <= qHi }
    val (zHits, sHits) = (hits(zb), hits(sb))
    // orderkey-sorted layout scrambles partkey: every file spans ~the
    // whole partkey domain -> zero pruning. Z-order must do better.
    assert(sHits == 8, s"expected no pruning from the naive layout, got $sHits")
    assert(zHits < 8, s"z-order gave no partkey pruning: $zHits of 8 files hit")
    // and the sorted dimension still prunes under z-order: an eighth-
    // domain orderkey box must not hit every file either
    val (oLo, oHi) = (li.agg(fmin("l_orderkey")).head().getLong(0),
      li.agg(fmax("l_orderkey")).head().getLong(0))
    val ow = (oHi - oLo) / 8
    val oHits = zb.count { case (lo, hi, _, _) =>
      hi >= oLo + 3 * ow && lo <= oLo + 4 * ow }
    assert(oHits < 8, s"z-order gave no orderkey pruning: $oHits of 8")
  }

  test("dynamic partition pruning fires on the engine's partitioned layout") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    graft.sources.Tables(spark, sfDir, "orders")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filtered on a NON-join column, so the partition values are
    // unknowable at plan time — a static filter can't be inferred and
    // only DynamicPartitionPruning can skip fact directories, by
    // reusing the broadcast side's values as a runtime partition filter
    val dim = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("p"), col("o_orderkey").as("k"))
      .filter(col("k") % 997 === 0)
    val j = fact.join(broadcast(dim), col("o_orderpriority") === col("p"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(4000)}")
    assert(j.count() > 0)
  }

  test("parquet scan pushes filters and prunes columns on the fact table") {
    val df = graft.sources.Tables(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"no pushdown:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"no pruning:\n$plan")
  }

  test("ANALYZE TABLE column stats drive CBO row estimates") {
    // at 100 TB the optimizer can't afford to guess from file sizes:
    // join order/strategy come from catalog statistics. Pin that the
    // engine's saveAsTable + ANALYZE path feeds Catalyst's CBO — exact
    // table rowCount, and a column-stats-based shrink for a selective
    // range predicate (min/max interpolation, no data read).
    val tbl = "orders_cbo_stats"
    graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .write.mode("overwrite")
      .option("path", "/tmp/graft_egress/cbo_orders").saveAsTable(tbl)
    try {
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val total = spark.table(tbl).count()
      val full = spark.table(tbl).queryExecution.optimizedPlan.stats
      assert(full.rowCount.contains(BigInt(total)),
        s"catalog rowCount ${full.rowCount} != $total")
      val maxKey = spark.table(tbl).agg(max(col("o_orderkey"))).head().getLong(0)
      val sel = spark.table(tbl)
        .filter(col("o_orderkey") < lit(maxKey / 10))
        .queryExecution.optimizedPlan.stats
      assert(sel.rowCount.exists(rc => rc > 0 && rc < BigInt(total) / 2),
        s"column stats did not shrink the estimate: ${sel.rowCount} of $total")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("bucketed layout joins without any exchange below the join") {
    val df = graft.ops.Layout.qBucketJoin(spark, sfDir)
    // run THIS queryExecution so AQE's final plan is available (the
    // stage tree prints only after execution materializes it)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    // toString prints the SMJ's two scan subtrees last; an Exchange
    // after the join marker would mean a side re-shuffled
    val joinPart = plan.split("SortMergeJoin").last
    assert(!joinPart.contains("Exchange"),
      s"bucketed join still shuffles:\n$joinPart")
    assert(joinPart.contains("Bucketed: true") &&
      joinPart.contains("SelectedBucketsCount: 8 out of 8"),
      s"scan did not use the bucketed layout:\n$joinPart")
    // bucket pruning: an equality filter on the bucket column must
    // scan ONE bucket, not eight — the point-lookup path at 100 TB.
    // autoBucketedScan (rightly) drops the bucketed layout for a bare
    // filter to regain split parallelism; pin it on to show pruning.
    val lt = ("bj_lineitem_" +
      sfDir.replaceAll("[^A-Za-z0-9]", "_")).toLowerCase
    val key = spark.table(lt).agg(max(col("l_orderkey"))).head().getLong(0)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val point = spark.table(lt).filter(col("l_orderkey") === key)
      assert(point.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount: 1 out of 8"),
        "point filter did not prune buckets")
      assert(point.count() > 0)
    } finally spark.conf
      .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    // the join result itself must match the plain (shuffling) join
    val plain = graft.sources.Tables(spark, sfDir, "lineitem")
      .join(graft.sources.Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.ops.dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(rows.toSeq == plain.toSeq)
  }

  test("aggregate is bit-identical when a task fails its first attempt " +
      "(retry determinism — lost-executor recovery at scale)") {
    // Every attempt-0 task of shuffle-map partition 3 throws; the
    // local[4, 2] scheduler retries it (clusters default to
    // maxFailures=4). The recomputed partition must reproduce the
    // same partial aggregates — which holds because every query-path
    // operator is deterministic (no rand, no time, no partition-
    // dependent state), the invariant this spec pins.
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .repartition(8)
    RetryProbe.reset()
    val faulted = li.withColumn("k", RetryProbe.failOnce(col("l_orderkey")))
    val got = faulted.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("s"))
      .orderBy("l_returnflag").collect()
    assert(RetryProbe.injected >= 1,
      "fault never fired - the injection point no longer runs as its own task")
    val want = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("s"))
      .orderBy("l_returnflag").collect()
    assert(got.toSeq == want.toSeq,
      "retried computation diverged from the clean run")
  }
}

/** Fault injector for the retry-determinism spec: passes values
  * through untouched, but the first attempt of partition 3 throws.
  * Local mode = one JVM, so a static counter sees executor-side
  * updates (cluster accumulators drop failed-task updates, which is
  * exactly the half we need to observe). */
object RetryProbe {
  @volatile var injected: Int = 0
  def reset(): Unit = injected = 0
  val failOnce = org.apache.spark.sql.functions.udf { (x: Long) =>
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 3) {
      injected += 1
      throw new RuntimeException("injected first-attempt task failure")
    }
    x
  }
}
