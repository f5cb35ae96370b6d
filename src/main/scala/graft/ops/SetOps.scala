package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Set operations (SURVEY §2.7). The reference's ceiling is physical
  * table concatenation (`cpp/src/arrow/table.h` ConcatenateTables =
  * unionAll); UNION/INTERSECT/EXCEPT distinct semantics are declared
  * Spark-native. INTERSECT/EXCEPT shuffle on the full row — at scale
  * prefer keyed semi/anti joins; both forms exposed here.
  */
object SetOps {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** UNION ALL (physical concat, reference ConcatenateTables) of two
    * disjoint slices, re-aggregated for a deterministic hash. */
  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    val high = o.filter(col("o_orderpriority") === "2-HIGH")
    urgent.unionAll(high)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val qUnionAllSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
    FROM (
      SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT * FROM orders WHERE o_orderpriority = '2-HIGH'
    ) GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** UNION DISTINCT of overlapping slices (dedup across inputs). */
  def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    a.union(b).distinct().orderBy(col("o_custkey"))
  }

  val qUnionDistinctSql: String = """
    SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_custkey
  """.trim

  /** INTERSECT: customers placing both an urgent and a low order. */
  def qIntersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      .intersect(
        o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  val qIntersectSql: String = """
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    ORDER BY o_custkey
  """.trim

  /** EXCEPT: customers with orders but never urgent ones. */
  def qExcept(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select(col("o_custkey"))
      .except(
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  val qExceptSql: String = """
    SELECT DISTINCT o_custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY o_custkey
  """.trim

  /** unionByName with schema reconciliation (missing columns nulled) —
    * the Spark analogue of the dataset layer's fragment schema
    * unification (`cpp/src/arrow/dataset/discovery.h:55` Inspect). */
  def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
      .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
        lit("supplier").as("kind"))
    val cust = t(s, dir, "customer")
      .select(col("c_name").as("name"), lit("customer").as("kind"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"))
    sup.unionByName(cust, allowMissingColumns = true)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("total_bal"),
        count(col("segment")).as("n_with_segment"))
      .orderBy(col("kind"))
  }

  val qUnionByNameSql: String = s"""
    SELECT kind, COUNT(*) AS n, ${dsumSql("acctbal")} AS total_bal,
      COUNT(segment) AS n_with_segment
    FROM (
      SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind, NULL AS segment FROM supplier
      UNION ALL
      SELECT c_name, c_acctbal, 'customer', c_mktsegment FROM customer
    ) GROUP BY kind ORDER BY kind
  """.trim

  /** MULTISET set ops (`intersectAll` / `exceptAll`, SQL INTERSECT
    * ALL / EXCEPT ALL): bag semantics — a value occurring a times on
    * the left and b on the right survives min(a,b) times in the
    * intersection and max(a−b, 0) in the difference. Catalyst plans
    * both as a single count-aggregate + generate replication (one
    * shuffle), NOT a distinct-then-join — the multiplicities are the
    * answer. Output folds each result to (op, value, multiplicity)
    * so the oracle comparison is order-free. */
  def qSetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 150000)
      .select(col("o_orderpriority").as("p"))
    val small = o.filter(col("o_totalprice") <= 150000)
      .select(col("o_orderpriority").as("p"))
    val ia = big.intersectAll(small)
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("p"), col("n"))
    val ea = big.exceptAll(small)
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("p"), col("n"))
    ia.unionAll(ea).orderBy("op", "p")
  }

  val qSetOpsAllSql: String = """
    WITH big AS (SELECT o_orderpriority AS p FROM orders WHERE o_totalprice > 150000),
      small AS (SELECT o_orderpriority AS p FROM orders WHERE o_totalprice <= 150000),
      ia AS (SELECT p FROM big INTERSECT ALL SELECT p FROM small),
      ea AS (SELECT p FROM big EXCEPT ALL SELECT p FROM small)
    SELECT 'intersect_all' AS op, p, COUNT(*) AS n FROM ia GROUP BY p
    UNION ALL
    SELECT 'except_all' AS op, p, COUNT(*) AS n FROM ea GROUP BY p
    ORDER BY op, p
  """.trim
}
