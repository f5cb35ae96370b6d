package graft.ops

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Resumable stage-checkpointed pipelines — the restart story for a
  * multi-stage 100 TB curation run (normalize → dedup → quality →
  * select), where stage 3 of 4 failing at hour 9 must NOT mean
  * re-running stages 1-2.
  *
  * Each stage materializes to `<root>/<idx>_<name>/` as parquet; a
  * stage directory holding Spark's `_SUCCESS` job-commit marker is
  * LOADED instead of recomputed on the next run (the marker is only
  * written when the whole distributed write committed, so a crashed
  * or partial stage re-runs — the same job-level atomicity contract
  * the IPC DSv2 writer implements by hand). Downstream stages always
  * read the materialized parquet, never the upstream lineage, so a
  * resumed run is byte-identical to a cold one and the DAG Spark
  * schedules per stage stays shallow (no 4-stage lineage recompute on
  * an executor loss in stage 4).
  *
  * This is deliberately NOT `df.checkpoint()`: reliable checkpoints
  * die with the SparkContext, while a parquet stage survives the
  * process — resume works across JVMs, which is what a production
  * restart actually is.
  */
object Checkpoints {

  /** Run `stages` as a resumable chain over `source`; returns the
    * final stage's DataFrame (read from its materialized output).
    * `force` recomputes everything from that stage index on. */
  def run(source: DataFrame, root: String,
      stages: Seq[(String, DataFrame => DataFrame)],
      force: Int = Int.MaxValue): DataFrame = {
    val s = source.sparkSession
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new HPath(root).getFileSystem(conf)
    stages.zipWithIndex.foldLeft(source) {
      case (prev, ((name, fn), idx)) =>
        val dir = s"$root/${idx}_$name"
        val done = fs.exists(new HPath(dir, "_SUCCESS"))
        if (!done || idx >= force) {
          // a partial dir (no marker) is overwritten wholesale
          fn(prev).write.mode("overwrite").parquet(dir)
        }
        s.read.parquet(dir)
    }
  }

  /** True iff stage `idx`/`name` under `root` has committed output. */
  def isDone(s: SparkSession, root: String, idx: Int, name: String): Boolean = {
    val p = new HPath(s"$root/${idx}_$name", "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }
}
