package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Session

/** The SQL entry point (SURVEY §2.10.1): the same queries the driver
  * oracle runs in DuckDB, executed by Spark SQL through graft.Session.
  * One SQL string serves both engines — the strongest possible parity
  * statement for the reference's `ExecutionContext.sql` surface.
  */
object Sql {

  /** Dialect-portable SQL (runs verbatim on Spark AND DuckDB). */
  val flagshipSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """.trim

  val joinSql: String = """
    SELECT n_name, COUNT(*) AS n_cust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
  """.trim

  val subquerySql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_big
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
  """.trim

  val caseWhenSql: String = """
    SELECT
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 35 THEN 'mid'
           ELSE 'high' END AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
  """.trim

  /** Register only the tables the query touches — registering all ten
    * fixtures reads parquet footers of tables the query never scans
    * (a measurable per-query cost; at 100 TB an unacceptable one). */
  private def run(s: SparkSession, dir: String, sql: String,
      tables: String*): DataFrame = {
    val sess = Session(s)
    tables.foreach(n => sess.registerTable(n, graft.sources.Tables(s, dir, n)))
    sess.sql(sql)
  }

  def qSqlFlagship(s: SparkSession, dir: String): DataFrame =
    run(s, dir, flagshipSql, "lineitem")
  def qSqlJoin(s: SparkSession, dir: String): DataFrame =
    run(s, dir, joinSql, "customer", "nation")
  def qSqlSubquery(s: SparkSession, dir: String): DataFrame =
    run(s, dir, subquerySql, "orders")
  def qSqlCaseWhen(s: SparkSession, dir: String): DataFrame =
    run(s, dir, caseWhenSql, "lineitem")

  /** Correlated EXISTS / NOT EXISTS — Catalyst rewrites these to
    * left-semi and left-anti hash joins (RewritePredicateSubquery),
    * so at scale they cost one shuffle each, never a per-row probe.
    * Same SQL text runs on both engines. */
  val existsSql: String = """
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
  """.trim

  def qSqlExists(s: SparkSession, dir: String): DataFrame =
    run(s, dir, existsSql, "customer", "orders")

  /** Correlated LATERAL derived table — top-2 nations per region
    * computed inside the lateral subquery (the SQL form of a grouped
    * top-k; Catalyst decorrelates it to a join + partitioned
    * window, so it scales like `topk_group`, not like a per-row
    * re-execution). Identical SQL text runs on DuckDB. */
  val lateralSql: String = """
    SELECT r_name, t.n_name, t.n_nationkey
    FROM region, LATERAL (
      SELECT n_name, n_nationkey FROM nation
      WHERE n_regionkey = r_regionkey
      ORDER BY n_name LIMIT 2) t
    ORDER BY r_name, t.n_name
  """.trim

  def qSqlLateral(s: SparkSession, dir: String): DataFrame =
    run(s, dir, lateralSql, "region", "nation")
}
