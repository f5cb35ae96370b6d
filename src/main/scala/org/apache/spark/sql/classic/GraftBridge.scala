package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for `classic.Dataset.ofRows`, which is `private[sql]`.
  * The standard pattern for Spark extensions that materialize a custom
  * `LogicalPlan` (graft.plans.TopKPerGroupNode) as a DataFrame — the
  * one-line scope hop lives here so the engine's own code stays in the
  * public API everywhere else.
  */
object GraftBridge {
  def ofRows(session: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(session.asInstanceOf[SparkSession], plan)

  /** Column ⇄ catalyst Expression, for wiring native expressions that
    * have no public `functions._` wrapper (e.g.
    * `BloomFilterMightContain`, the codegen'd bloom-probe Spark's own
    * runtime row-level filtering injects). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column = ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)
}
