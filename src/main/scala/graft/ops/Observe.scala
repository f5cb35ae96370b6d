package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline observability: attach row/volume/quality
  * metrics to a pipeline stage with `Dataset.observe`, collected as a
  * side effect of the action that runs the pipeline anyway. At 100 TB
  * a separate counting pass per stage is an unacceptable second scan —
  * observed metrics ride the existing job (accumulator-backed, exact
  * for the non-distinct aggregates used here), which is also the only
  * way to get per-micro-batch stage metrics out of a streaming
  * pipeline (`StreamingQueryProgress.observedMetrics`).
  */
object Observe {

  /** Instrument a document-pipeline stage. Returns the instrumented
    * frame plus the handle; `handle.get` blocks until the next action
    * on the frame completes and yields the metric row. */
  def docMetrics(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(length(col("text"))).as("chars"),
      min(length(col("text"))).as("min_chars"),
      max(length(col("text"))).as("max_chars"))
    (instrumented, obs)
  }

  /** Streaming twin: the `Observation` handle is batch-only, so a
    * stream instruments with the name-based `observe` and reads each
    * trigger's metric row from
    * `StreamingQueryProgress.observedMetrics(name)` — per-micro-batch
    * stage metrics with zero extra passes (StreamingSpec drives it). */
  def docMetricsStream(df: DataFrame, name: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      sum(length(col("text"))).as("chars"),
      min(length(col("text"))).as("min_chars"),
      max(length(col("text"))).as("max_chars"))
}
