package graft

import java.nio.file.{Files, Paths}

/** Per-query plan evidence for the optimization rounds: writes
  * `plans/<round>/<key>_<tag>.txt` with `explain("formatted")` output
  * for each key in SPARK_GRAFT_ONLY.
  *
  * Run: SPARK_GRAFT_ONLY=k1,k2 SPARK_GRAFT_TAG=before \
  *   SPARK_GRAFT_ROUND=r14 sbt "runMain graft.PlanDump"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val keys = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val tag = sys.env.getOrElse("SPARK_GRAFT_TAG", "before")
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r14")
    val spark = Engine.session("8", "8")
    Files.createDirectories(Paths.get(s"plans/$round"))
    for (k <- keys) {
      val df = SparkEntry.queries(k)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$round/${k}_$tag.txt"), txt)
      println(s"[plandump] wrote plans/$round/${k}_$tag.txt")
    }
    spark.stop()
  }
}
