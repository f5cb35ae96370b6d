package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-contract audit (the pipeline guardrail a 100 TB ingest runs
  * before anything downstream trusts the batch): range, null-key,
  * duplicate-key, and referential-integrity checks, each expressed as
  * a violation COUNT so the audit output is a tiny fixed-shape table
  * regardless of input size.
  *
  * Scale posture: each check is one aggregate over one scan (the two
  * RI checks are broadcast-able anti-join counts on key columns
  * only); no row-level violations ever leave the executors — a real
  * deployment would `observe` these on the ingest write itself
  * (ops/Observe) and alert on the counts.
  */
object Quality {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  def qDqAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    def row(name: String, d: DataFrame) =
      d.select(lit(name).as("check_name"), col("n_violations"))
    val qtyRange = li.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("n_violations"))
    val nullKeys = li.agg(
      sum(when(col("l_orderkey").isNull || col("l_partkey").isNull, 1L)
        .otherwise(0L)).as("n_violations"))
    // the fixture's known wart: ~8% duplicate (l_orderkey, l_linenumber)
    // pairs — the audit counts the surplus rows beyond each key's first
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1).as("n_violations"))
    val orphanOrders = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val orphanLines = li.join(orders,
        li("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    Seq(
      row("lineitem_qty_range", qtyRange),
      row("lineitem_null_keys", nullKeys),
      row("lineitem_dup_line_keys", dupKeys),
      row("orders_orphan_custkey", orphanOrders),
      row("lineitem_orphan_orderkey", orphanLines))
      .reduce(_.union(_))
      .orderBy("check_name")
  }

  val qDqAuditSql: String = """
    SELECT 'lineitem_dup_line_keys' AS check_name,
      CAST(SUM(c - 1) AS BIGINT) AS n_violations FROM (
        SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    UNION ALL
    SELECT 'lineitem_null_keys',
      CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', COUNT(*) FROM lineitem
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
    UNION ALL
    SELECT 'lineitem_qty_range',
      CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_orphan_custkey', COUNT(*) FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    ORDER BY check_name
  """.trim
}
