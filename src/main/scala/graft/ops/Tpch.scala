package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Canonical TPC-H query shapes (adapted to the driver fixture's
  * column subset — see FIXTURES.md §2): the standard scan/agg (Q1),
  * join+top-k (Q3), star-join (Q5), and selective-filter-agg (Q6)
  * benchmarks, written exactly as the 100 TB plan should look —
  * decimal money arithmetic, dims broadcast, facts shuffled once on
  * the join key, filters pushed to the scan.
  */
object Tpch {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def money(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Q1 pricing summary: full aggregate set over one pushdown scan. */
  def qTpchQ1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(money(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(money(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
          .cast(DoubleType).as("sum_disc_price"),
        // rescale to 6 before the double cast: at scale 10 the integer
        // mantissa exceeds 2^53 and decimal→double rounding differs
        // across engines by 1 ulp; at scale 6 it's exact on both
        sum(money(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))) *
          (lit(1).cast(DecimalType(9, 4)) + col("l_tax").cast(DecimalType(9, 4))))
          .cast(DecimalType(32, 6)).cast(DoubleType).as("sum_charge"),
        (sum(money(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(money(col("l_extendedprice"))).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast(DecimalType(9, 4))).cast(DoubleType) /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qTpchQ1Sql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4))) * (CAST(1 AS DECIMAL(9,4)) + CAST(l_tax AS DECIMAL(9,4)))) AS DECIMAL(32,6)) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """.trim

  /** Q3 shipping priority (adapted: o_orderpriority replaces the
    * fixture-absent o_shippriority): segment filter on the broadcast
    * customer dim, fact-fact join on orderkey, revenue top-10. */
  def qTpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-03-15").cast(TimestampType)
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val qTpchQ3Sql: String = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
  """.trim

  /** Q5 local supplier volume (adapted: joins via supplier+customer
    * nation equality). Plan discipline for 100 TB: customer and
    * supplier scale with SF → shuffle joins on their keys; only the
    * fixed-size nation/region dims broadcast. */
  def qTpchQ5(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)

  val qTpchQ5Sql: String = """
    SELECT n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
  """.trim

  /** Q4 order priority checking: correlated EXISTS — a left-semi join
    * whose condition mixes the equi key with a per-row inequality
    * (l_shipdate > o_orderdate). */
  def qTpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1994-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1994-07-01").cast(TimestampType))
    o.join(t(s, dir, "lineitem"),
      col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val qTpchQ4Sql: String = """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate < TIMESTAMP '1994-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Q10 returned-item reporting (adapted to fixture columns): top-20
    * customers by revenue lost to returns. Fact-fact shuffle on
    * orderkey, then custkey; nation broadcast (rule-injected). */
  def qTpchQ10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  val qTpchQ10Sql: String = """
    SELECT c_custkey, c_name, n_name,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
  """.trim

  /** Q14 promotion effect (adapted: 'red %' part names stand in for
    * PROMO types): conditional-aggregate ratio over one join. */
  def qTpchQ14(s: SparkSession, dir: String): DataFrame = {
    val rev = money(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4)))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        (sum(when(col("p_name").startsWith("red"), rev)
          .otherwise(lit(0).cast(DecimalType(28, 6)))).cast(DoubleType) * 100.0 /
          sum(rev).cast(DoubleType)).as("promo_pct"),
        count(lit(1)).as("n"))
  }

  val qTpchQ14Sql: String = """
    SELECT
      CAST(SUM(CASE WHEN p_name LIKE 'red%'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))
        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) * 100.0 /
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS promo_pct,
      COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
  """.trim

  /** Q7 volume shipping (adapted to fixture nations): revenue between
    * two nation pairs per ship year. Facts shuffle on their join keys;
    * the two nation lookups broadcast (rule-injected); the pair
    * disjunction is evaluated post-join on the two small key columns. */
  def qTpchQ7(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("nk1"))
      .join(n2, col("c_nationkey") === col("nk2"))
      .filter(
        (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
        .cast(DoubleType).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val qTpchQ7Sql: String = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4))) AS volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
  """.trim

  /** Q12 shipping modes & priority (adapted: l_linestatus stands in
    * for the fixture-absent l_shipmode; "late" = shipped > 60 days
    * after the order date): conditional two-way counts over one
    * fact-fact join — the canonical CASE-inside-SUM shape. */
  def qTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!highPrio, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  val qTpchQ12Sql: String = """
    SELECT l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus ORDER BY l_linestatus
  """.trim

  /** Q18 large-volume customers: the HAVING-on-a-grouped-fact shape —
    * aggregate lineitem per order, keep heavy orders, then enrich via
    * joins. The heavy-order set is tiny after the HAVING filter, so
    * it broadcasts into the enrichment joins at any scale. */
  def qTpchQ18(s: SparkSession, dir: String): DataFrame = {
    val heavy = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_quantity"))).cast(DoubleType).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    t(s, dir, "orders")
      .join(broadcast(heavy), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast(DateType).as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  val qTpchQ18Sql: String = """
    SELECT c_name, c_custkey, o_orderkey,
      CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, total_qty
    FROM orders
    JOIN (SELECT l_orderkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0) h
      ON o_orderkey = h.l_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
  """.trim

  /** Q19 discounted revenue (adapted to fixture columns): disjunction
    * of conjunctive (brand, size, quantity) ranges across the join —
    * the part-side half of each disjunct pushes to the part scan, the
    * mixed residual evaluates on joined rows. */
  def qTpchQ19(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4))))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  val qTpchQ19Sql: String = """
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
  """.trim

  /** Q6 forecasting revenue change: the selective filter-agg whose
    * whole point is pushdown — every predicate must reach the scan. */
  def qTpchQ6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1995-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(money(col("l_extendedprice")) *
        col("l_discount").cast(DecimalType(9, 4)))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  val qTpchQ6Sql: String = """
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
  """.trim

  private def volume = money(col("l_extendedprice")) *
    (lit(1).cast(DecimalType(9, 4)) - col("l_discount").cast(DecimalType(9, 4)))

  private val volumeSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))"

  /** Q8 national market share (adapted: PROMO-type parts, ASIA market,
    * NATION_3 suppliers): per-year ratio of one nation's supply volume
    * to the region's total. Ratio of two exact decimal sums → double,
    * so partial/final agg order never shifts the answer. part/customer/
    * supplier scale with SF → shuffle joins; nation/region broadcast. */
  def qTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("o_orderdate") <= lit("1996-12-31").cast(TimestampType)),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("cnk"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("snk"))
      .filter(col("r_name") === "ASIA")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", volume)
          .otherwise(lit(0).cast(DecimalType(28, 6)))).cast(DoubleType) /
        sum(volume).cast(DoubleType)).as("mkt_share"),
        count(lit(1)).as("n"))
      .orderBy("o_year")
  }

  val qTpchQ8Sql: String = s"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $volumeSql
        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) /
      CAST(SUM($volumeSql) AS DOUBLE) AS mkt_share,
      COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY o_year ORDER BY o_year
  """.trim

  /** Q13 customer order-count distribution: LEFT OUTER join with a
    * mixed ON condition (equi key + order-side filter), then a
    * two-level aggregation — per-customer count, then the histogram of
    * counts. Both group-bys shuffle on keys that stay well-distributed
    * at any SF (custkey, then the small count domain). */
  def qTpchQ13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority")),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val qTpchQ13Sql: String = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
  """.trim

  /** Q15 top supplier: the view-plus-scalar-max shape. Per-supplier
    * revenue aggregates once; the global max is a 1-row aggregate that
    * broadcasts back into the filter — no second scan of lineitem, no
    * correlated re-evaluation. Revenue is an exact decimal sum, so the
    * max-equality join is deterministic. */
  def qTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(sum(volume).cast(DoubleType).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
    t(s, dir, "supplier")
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(mx), col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val qTpchQ15Sql: String = s"""
    WITH revenue AS (
      SELECT l_suppkey, CAST(SUM($volumeSql) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
  """.trim

  /** Q17 small-quantity-order revenue (adapted: Brand#23 MEDIUM parts):
    * correlated per-part average quantity, decorrelated into one
    * grouped aggregate joined back on partkey. The threshold compare
    * (qty < 0.2*avg) is done in exact integer-decimal cross-multiplied
    * form — qty*5*count < sum — so no engine's division rounding can
    * flip a boundary row. */
  def qTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val pf = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "MEDIUM")
      .select(col("p_partkey"))
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(pf, col("l_partkey") === col("p_partkey"))
    // per-part average attached via an unbounded window over partkey:
    // ONE lineitem scan and ONE shuffle, where the groupBy+join
    // decorrelation would scan and exchange the fact twice
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    li.withColumn("sq", sum(col("l_quantity").cast(DecimalType(18, 2))).over(w))
      .withColumn("cq", count(lit(1)).over(w))
      .filter(col("l_quantity").cast(DecimalType(18, 2)) * lit(5) * col("cq") <
        col("sq"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  val qTpchQ17Sql: String = s"""
    SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly, COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (SELECT l_partkey AS pk,
            SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq, COUNT(*) AS cq
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
          GROUP BY l_partkey) a ON l_partkey = pk
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq
  """.trim

  /** Q2 minimum-cost supplier (adapted: s_acctbal stands in for the
    * fixture-absent ps_supplycost, lineitem links parts to suppliers,
    * EUROPE is the region filter): the per-group argmin join-back
    * shape — the min is computed once per partkey and joined back on
    * (partkey, min) equality. Top-100 by balance. */
  def qTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val euSupp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val links = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(euSupp, col("l_suppkey") === col("s_suppkey"))
    val minBal = links.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    links.join(minBal,
        col("l_partkey") === col("pk") && col("s_acctbal") === col("min_bal"))
      .join(t(s, dir, "part").filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  val qTpchQ2Sql: String = """
    WITH links AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM links
    JOIN eu ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size = 15
      AND s_acctbal = (SELECT MIN(e2.s_acctbal)
                       FROM links l2 JOIN eu e2 ON l2.l_suppkey = e2.s_suppkey
                       WHERE l2.l_partkey = links.l_partkey)
    ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
    LIMIT 100
  """.trim

  /** Q11 important stock (adapted: "inventory value" = quantity x
    * retail price over the lineitem link): per-nation value, keeping
    * nations above 5% of the global total — the HAVING-vs-global-
    * scalar shape, with the 1-row total cross-broadcast into the
    * filter rather than recomputed per group. */
  def qTpchQ11(s: SparkSession, dir: String): DataFrame = {
    val value = col("l_quantity").cast(DecimalType(18, 2)) *
      col("p_retailprice").cast(DecimalType(18, 2))
    val perNation = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(value).as("val_dec"))
    val total = perNation.agg(sum(col("val_dec")).as("tot"))
    perNation.crossJoin(broadcast(total))
      .filter(col("val_dec") * lit(20) > col("tot"))
      .select(col("n_name"),
        col("val_dec").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("n_name").asc)
  }

  val qTpchQ11Sql: String = """
    WITH per_nation AS (
      SELECT n_name,
        SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS val_dec
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(val_dec AS DOUBLE) AS value
    FROM per_nation
    WHERE val_dec * 20 > (SELECT SUM(val_dec) FROM per_nation)
    ORDER BY value DESC, n_name ASC
  """.trim

  /** Q9 product-type profit (adapted: p_retailprice stands in for the
    * fixture-absent ps_supplycost; 'blue' parts): per supplier-nation
    * per year, sum of revenue minus cost. Exact mixed-scale decimal
    * arithmetic summed before the final double cast; facts shuffle on
    * partkey/orderkey/suppkey, nation broadcasts. */
  def qTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val amount = volume -
      col("p_retailprice").cast(DecimalType(18, 2)) *
        col("l_quantity").cast(DecimalType(18, 2))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_name").contains("blue"))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  val qTpchQ9Sql: String = s"""
    SELECT n_name AS nation,
      CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      CAST(SUM($volumeSql
        - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%blue%'
    GROUP BY n_name, o_year
    ORDER BY n_name ASC, o_year DESC
  """.trim

  /** Q16 parts/supplier relationship (adapted: lineitem is the
    * part-supplier link, the fixture having no partsupp; negative
    * balance stands in for the complaints exclusion): DISTINCT
    * supplier count per part attribute triple. */
  def qTpchQ16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" &&
          col("p_size").isin(Seq[Any](1, 9, 14, 19, 23, 36, 45, 49): _*)),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "supplier").filter(col("s_acctbal") >= 0.0)
        .select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)

  val qTpchQ16Sql: String = """
    SELECT p_brand, p_type, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
  """.trim

  /** Q20 potential promotion (adapted: suppliers who moved more than
    * 300 units of 'red' parts in 1996 — lineitem as the stock link):
    * the grouped-HAVING set drives a left-semi join into supplier.
    * The heavy-supplier set is tiny → broadcast semi join at any SF. */
  def qTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val heavy = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .join(t(s, dir, "part").filter(col("p_name").startsWith("red"))
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty"))
      .filter(col("qty") > lit(300).cast(DecimalType(18, 2)))
    t(s, dir, "supplier")
      .join(broadcast(heavy), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy("s_suppkey")
  }

  val qTpchQ20Sql: String = """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
    ORDER BY s_suppkey
  """.trim

  /** Q21 suppliers who kept orders waiting (adapted: "late" =
    * l_shipdate > o_orderdate + 30 days, NATION_3 suppliers): the
    * double-correlated EXISTS / NOT EXISTS shape — a semi join against
    * other suppliers on the same order and an anti join against other
    * LATE suppliers, both hash joins on orderkey with non-equi
    * residuals. The lateness of the anti side reuses l1's o_orderdate
    * (same order), so no second orders join is needed. */
  def qTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val late = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
    val l2 = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
    val l3 = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"),
        col("l_shipdate").as("sd3"))
    late
      .join(l2, col("lo2") === col("l_orderkey") &&
        col("ls2") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("lo3") === col("l_orderkey") &&
        col("ls3") =!= col("l_suppkey") &&
        col("sd3") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_anti")
      .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"),
          col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  val qTpchQ21Sql: String = """
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
  """.trim

  /** Q22 global sales opportunity (adapted: c_nationkey stands in for
    * the fixture-absent phone country code): idle customers — no
    * orders, above-average positive balance — per nation. The global
    * average is a 1-row aggregate cross-broadcast into the filter, in
    * cross-multiplied decimal form (bal*count > sum) for exactness;
    * the no-orders test is a left-anti join on custkey. */
  def qTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val codes: Seq[Any] = Seq(0, 3, 8, 13, 17, 21, 24)
    val cust = t(s, dir, "customer")
      .filter(col("c_nationkey").isin(codes: _*))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val avgRef = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("sa"),
        count(lit(1)).as("ca"))
    cust.crossJoin(broadcast(avgRef))
      .filter(col("c_acctbal").cast(DecimalType(18, 2)) * col("ca") > col("sa"))
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val qTpchQ22Sql: String = s"""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
      ${dsumSql("c_acctbal")} AS totacctbal
    FROM customer,
      (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sa, COUNT(*) AS ca
       FROM customer WHERE c_acctbal > 0
         AND c_nationkey IN (0,3,8,13,17,21,24)) r
    WHERE c_nationkey IN (0,3,8,13,17,21,24)
      AND CAST(c_acctbal AS DECIMAL(18,2)) * ca > sa
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode ORDER BY cntrycode
  """.trim
}
