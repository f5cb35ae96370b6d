package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, lit, round, udaf, udf}
import org.apache.spark.sql.{Encoder, Encoders}

import graft.sources.Tables

/** UDF / UDAF surface (SURVEY §2.9).
  *
  * The reference's model: scalar UDFs registered by name with declared
  * arg/return types (`rust/datafusion/src/logicalplan.rs:33-86`
  * FunctionMeta, looked up via SchemaProvider::get_function_meta) and
  * aggregate UDFs as an Accumulator with partial/final reduction
  * (`execution/physical_plan/mod.rs:63-86`).
  *
  * Spark mapping: `spark.udf.register` for scalars (typed signature =
  * declared types; Catalyst inserts the same implicit casts the
  * reference planner does at sql/planner.rs:392-398), and
  * `Aggregator[IN,BUF,OUT]` for aggregates (merge ≡ create_reducer —
  * Spark runs it as partial aggregation + merge, the exact two-phase
  * scheme of context.rs:272-310, so it scales map-side like any
  * built-in).
  */
object Udfs {

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the demo functions by name (the reference registry
    * surface). Returns the session for chaining. */
  def registerAll(spark: SparkSession): SparkSession = {
    // scalar: the classic my_sqrt of the DataFusion examples
    spark.udf.register("my_sqrt", udf((x: Double) => math.sqrt(x)))
    // scalar with declared arg coercion: int64 → utf8 tagging
    spark.udf.register("qty_bucket", udf((q: Double) =>
      if (q < 10) "low" else if (q < 35) "mid" else "high"))
    spark.udf.register("geo_mean", udaf(GeoMean))
    spark
  }

  /** Scalar UDF through the SQL registry, oracle-matched by sqrt(). */
  def qUdfScalar(s: SparkSession, dir: String): DataFrame = {
    registerAll(s)
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem_udf")
    s.sql("""
      SELECT l_orderkey, l_linenumber,
        ROUND(my_sqrt(l_extendedprice), 6) AS sqrt_price,
        qty_bucket(l_quantity) AS bucket
      FROM lineitem_udf
      WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, l_linenumber, sqrt_price, bucket
    """)
  }

  val qUdfScalarSql: String = """
    SELECT l_orderkey, l_linenumber,
      ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 35 THEN 'mid' ELSE 'high' END AS bucket
    FROM lineitem
    WHERE l_orderkey % 500 = 0
    ORDER BY l_orderkey, l_linenumber, sqrt_price, bucket
  """.trim

  /** UDAF (two-phase partial/final like the reference Accumulator),
    * oracle-matched by exp(avg(ln x)). */
  def qUdafGeoMean(s: SparkSession, dir: String): DataFrame = {
    registerAll(s)
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(org.apache.spark.sql.functions
          .call_udf("geo_mean", col("l_quantity")), 6).as("geo_qty"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val qUdafGeoMeanSql: String = """
    SELECT l_returnflag, ROUND(EXP(AVG(LN(l_quantity))), 6) AS geo_qty,
      COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """.trim
}
