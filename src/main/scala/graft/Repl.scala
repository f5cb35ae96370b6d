package graft

import scala.io.StdIn

import org.apache.spark.sql.SparkSession

/** Interactive SQL REPL (`rust/datafusion/src/bin/repl.rs` analogue):
  * line in → SQL through the engine session → formatted table out.
  * Fixture tables are pre-registered so `SELECT .. FROM lineitem`
  * works immediately; any path is queryable via the DDL surface
  * (CREATE TEMPORARY VIEW ... USING csv/parquet/json).
  *
  * The eval step is a pure function (`execute`) so ReplSpec drives it
  * without a terminal.
  */
object Repl {

  /** One read-eval-print step: SQL text → rendered result or error.
    * Mirrors the reference REPL's eager collect-and-print loop.
    * `:explain <sql>` renders the FORMATTED physical plan instead of
    * executing — the plan-shape feedback loop (pushed filters,
    * broadcast vs shuffle, codegen spans) at the prompt. */
  def execute(session: Session, line: String, maxRows: Int = 20): String =
    try {
      if (line.trim.startsWith(":explain")) {
        val sql = line.trim.stripPrefix(":explain").trim
        if (sql.isEmpty) "usage: :explain <sql>"
        else session.sql(sql).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } else executeQuery(session, line, maxRows)
    } catch {
      case e: Exception => s"error: ${e.getMessage}"
    }

  private def executeQuery(session: Session, line: String,
      maxRows: Int): String =
    {
      val df = session.sql(line)
      val shown = df.limit(maxRows + 1).collect()
      val header = df.columns.mkString("\t")
      val body = shown.take(maxRows)
        .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("\t"))
      val more = if (shown.length > maxRows) Seq(s"... (> $maxRows rows)") else Nil
      ((header +: body) ++ more).mkString("\n")
    }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.session(cpus, cpus)
    val session = Session(spark)
    sys.env.get("SPARK_GRAFT_SF_DIR").foreach(session.registerFixtures)
    println("graft sql repl — 'quit' to exit")
    Iterator.continually(StdIn.readLine("graft> "))
      .takeWhile(l => l != null && l.trim != "quit")
      .filter(_.trim.nonEmpty)
      .foreach(l => println(execute(session, l)))
    spark.stop()
  }
}
