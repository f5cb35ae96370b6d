package graft

import org.apache.spark.sql.SparkSession

/** Session conventions for the engine (SURVEY §7 milestone 1).
  *
  * The reference's cast defaults are unsafe (Gandiva/Arrow
  * `CastOptions{allow_int_overflow, allow_float_truncate, ...}` —
  * `cpp/src/arrow/compute/kernels/cast.h:36`), i.e. invalid input →
  * null, overflow wraps, fractions truncate. Spark 4 defaults to ANSI
  * (errors); we pin the non-ANSI behavior, UTC session time, and the
  * ns-as-long parquet reading the events fixture needs.
  *
  * Idempotent and cheap — callable from every table load.
  */
object Engine {
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // TIME is part of the engine's declared type surface (§1.2 —
    // carried through the IPC/Flight codecs); Spark 4.1 gates the
    // type behind this flag
    spark.conf.set("spark.sql.timeType.enabled", "true")
    // AQE: runtime coalescing + skew-join handling — the 100 TB safety
    // net; on by default in Spark 4 but pinned here explicitly.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // Post-shuffle coalescing keeps `parallelismFirst` sizing (target =
    // shuffle bytes / defaultParallelism, i.e. derived from the session's
    // core count, never a constant) but the default 1 MB
    // minPartitionSize FLOOR collapses small CPU-dense shuffles to a
    // handful of tasks: a 5 MB exchange feeding set-intersection or
    // hash verification work coalesces to ~5 partitions on any core
    // count, serializing minutes of per-row CPU behind KBs of I/O
    // (guide §2.2's cost model assumes cost ∝ bytes; candidate
    // verification breaks it). 64 KB keeps the floor as a guard against
    // absurd fragmentation while letting parallelism-first sizing win —
    // at production shuffle sizes partitions are >> 1 MB and this is a
    // no-op (measured: simjoin_topk verify stage 4 -> 30 tasks at
    // sf0.1, 2.8 s -> 0.9 s; zero effect on any >1 GB exchange).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "64k")
    // File-output commit protocol v2 (task commits rename directly into
    // the destination; job commit is a no-op) + no _SUCCESS marker.
    // v1's job-level atomicity is REDUNDANT under this engine's write
    // paths: TableLog publishes data-before-log (files in an
    // unpublished UUID subdir are unreachable until the log commit
    // lands), and the egress round-trips write to per-query scratch
    // dirs they immediately re-read whole. v2 removes one rename pass
    // + a driver-side sequential rename loop per write job — measured
    // A/B (one JVM, alternating, 3 pairs): log_cdf 0.87×,
    // log_checkpoint 0.94×, log_clone 0.96×, others noise-neutral.
    // At 100 TB the same reasoning holds (and v2 is the standard
    // posture for rename-based committers on many-file jobs).
    spark.conf.set(
      "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    spark.conf.set(
      "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    // native expressions (GraftExtensions is the spark.sql.extensions
    // path for cluster deployment; this covers already-built sessions)
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    spark.experimental.extraOptimizations =
      Seq(graft.plans.SmallDimBroadcastRule(),
        graft.plans.WindowTopKRewriteRule())
    spark.experimental.extraStrategies =
      Seq(graft.plans.TopKPerGroupStrategy)
    spark
  }

  /** Standard local session for mains (driver runs local[32]). */
  def session(threads: String, shufflePartitions: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    configure(s)
  }
}
