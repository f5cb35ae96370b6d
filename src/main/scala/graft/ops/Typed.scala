package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed Dataset[T] surface (the reference's strongly-typed Table API
  * ambition, `rust/datafusion/src/table.rs`, realized with case-class
  * Encoders): compile-time schemas, typed filters/maps, and a typed
  * Aggregator with partial+final merge — the §2.9 Accumulator contract
  * (`execution/physical_plan/mod.rs:63-86`) in its type-safe form.
  *
  * Scale note: typed lambdas are opaque to Catalyst (no pushdown
  * through a typed filter), so the hot path keeps column expressions;
  * this surface is for the API tier where type safety matters more
  * than the last filter pushdown — exactly how it's used here: the
  * typed filter sits above a column-pruned scan.
  */
object Typed {

  case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  case class PriorityStats(status: String, n: Long, total: Double)

  /** Typed sum-and-count aggregator: the Accumulator partial+final
    * contract — reduce = accumulate_batch, merge = create_reducer. */
  val sumCount: Aggregator[OrderRow, (Long, Double), (Long, Double)] =
    new Aggregator[OrderRow, (Long, Double), (Long, Double)] {
      def zero: (Long, Double) = (0L, 0.0)
      def reduce(b: (Long, Double), r: OrderRow): (Long, Double) =
        (b._1 + 1, b._2 + r.o_totalprice)
      def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
        (a._1 + b._1, a._2 + b._2)
      def finish(r: (Long, Double)): (Long, Double) = r
      def bufferEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      def outputEncoder: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    }

  /** Orders as a typed Dataset. */
  def orders(s: SparkSession, dir: String): Dataset[OrderRow] = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[OrderRow]
  }

  /** Typed pipeline: filter → groupByKey → typed aggregator. The
    * result goes back to columns only for the oracle-stable ordering.
    * (Double totals stay exact here: per-status sums are re-computed
    * with decimal arithmetic for the declared query below.) */
  def typedStats(ds: Dataset[OrderRow]): Dataset[PriorityStats] = {
    import ds.sparkSession.implicits._
    ds.filter(_.o_totalprice > 0)
      .groupByKey(_.o_orderstatus)
      .agg(sumCount.toColumn)
      .map { case (status, (n, total)) => PriorityStats(status, n, total) }
  }

  /** Declared query: typed path for counts (order-independent longs),
    * decimal column path for the money sum — one result, both APIs. */
  def qTypedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typedCounts = typedStats(orders(s, dir))
      .select($"status".as("o_orderstatus"), $"n")
    val decimalSums = Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .groupBy(col("o_orderstatus"))
      .agg(dsum(col("o_totalprice")).as("total_price"))
    typedCounts.join(decimalSums, "o_orderstatus")
      .select(col("o_orderstatus"), col("n"), col("total_price"))
      .orderBy("o_orderstatus")
  }

  val qTypedAggSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim
}
