package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** Join surface (SURVEY §2.3). The reference tops out at IsIn/Match
  * semi-join filtering (`cpp/src/arrow/compute/kernels/isin.h:45`);
  * the full equi-join family is declared Spark-native. All joins are
  * written scale-first:
  *
  *   - fact ⋈ fact (lineitem ⋈ orders) → shuffle hash/sort-merge on the
  *     join key, Spark's native partitioned path; AQE re-plans skew.
  *   - fact ⋈ dim (customer/nation/region/supplier) → explicit
  *     `broadcast()` so the 100 TB fact side never shuffles for a
  *     kilobyte-scale dimension.
  *
  * Every query aggregates or totally orders its output so the driver
  * hash is deterministic.
  */
object Joins {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Inner equi-join fact⋈fact + group-agg: revenue per order priority.
    * At scale both sides shuffle on orderkey — the partitioning Spark
    * would pick for any distributed hash join. */
  def qJoinInner(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"), "inner")
      .groupBy(col("o_orderpriority"))
      .agg(
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1.0) - col("l_discount")).cast("decimal(9,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  val qJoinInnerSql: String = """
    SELECT o_orderpriority,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Star-schema broadcast chain: customer ⋈ nation ⋈ region, all dims
    * broadcast — zero shuffles on the big side; count per region. */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("r_name"))

  val qJoinBroadcastSql: String = s"""
    SELECT r_name, COUNT(*) AS n_customers, ${dsumSql("c_acctbal")} AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
  """.trim

  /** Left semi join — the direct Spark analogue of the reference's
    * IsIn capability ceiling: orders having at least one big lineitem. */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(
        t(s, dir, "lineitem").filter(col("l_quantity") >= 49.0),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val qJoinSemiSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49.0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** Left anti join: customers with no high-value order. */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_no_orders"))
      .orderBy(col("c_mktsegment"))

  val qJoinAntiSql: String = """
    SELECT c_mktsegment, COUNT(*) AS n_no_orders
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
  """.trim

  /** Left outer join with null-aware aggregation: per-customer order
    * counts including order-less customers (COUNT of right-side key
    * counts only matched rows). */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  val qJoinLeftSql: String = """
    SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders,
      CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
  """.trim

  /** Full outer join: supplier vs customer presence per nation key —
    * exercises both-null-side semantics. */
  def qJoinFull(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    val cust = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_customers"))
    sup.join(cust, col("nk_s") === col("nk_c"), "full_outer")
      .select(
        coalesce(col("nk_s"), col("nk_c")).as("nationkey"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"))
      .orderBy(col("nationkey"))
  }

  val qJoinFullSql: String = """
    SELECT COALESCE(nk_s, nk_c) AS nationkey,
      COALESCE(n_suppliers, 0) AS n_suppliers,
      COALESCE(n_customers, 0) AS n_customers
    FROM (SELECT s_nationkey AS nk_s, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) sup
    FULL OUTER JOIN (SELECT c_nationkey AS nk_c, COUNT(*) AS n_customers FROM customer GROUP BY 1) cust
      ON nk_s = nk_c
    ORDER BY nationkey
  """.trim

  /** Right outer join (mirror of left): all nations kept even without
    * suppliers; dims broadcast. */
  def qJoinRight(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"), "right")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("n_name"))

  val qJoinRightSql: String = """
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
  """.trim

  /** Salted inner equi-join for skewed keys: the manual skew weapon
    * when AQE's runtime skew split isn't enough (e.g. one key holding
    * 10% of a 100 TB fact table). The skewed (left) side gets a random
    * salt in [0, salts); the right side is replicated `salts` times
    * via a literal-array explode; the join key becomes (key, salt), so
    * one hot key spreads over `salts` reducers. Exact same rows as the
    * plain join — JoinsSpec pins the equality. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 7) * salts).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight,
      saltedLeft(leftKey) === replicatedRight(rightKey) &&
        saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")
  }

  /** Skew-resistant fact⋈dim aggregate, two-level form (guide §2.3
    * "aggregate before you shuffle" + §2.5 two-level aggregation):
    * the per-priority totals only need lineitem's (count, Σprice) PER
    * KEY, so the fact is partially aggregated by its join key BELOW
    * the join — a hot key collapses to one row before any join
    * machinery sees it, which neutralizes join-side skew
    * categorically (no salt replication of the other side needed; the
    * r1-r13 form salted via [[saltedJoin]], exploding orders 8× and
    * probing an 8×-size hash relation — measured 5.4× wall for 10×
    * data; this form is the same answer with ~2.5× fewer shuffled
    * rows and no explosion, and ScaleSpec keeps certifying
    * salted == plain for the users who do need the salting rewrite).
    * Revenue stays decimal through BOTH levels (exact, order- and
    * grouping-independent) and casts to double once at the end, so
    * the result is bit-identical to the single-level dsum. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("nk"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("rk"))
      .join(t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("nk")).as("n_items"),
        sum(col("rk")).cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderpriority"))

  val qSkewJoinSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
      ${dsumSql("l_extendedprice")} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Cross join (`datafusion` CrossJoinExec lineage): cartesian
    * product of the two smallest dims, then a filter that is NOT an
    * equi-condition (so Catalyst cannot turn it into a hash join) —
    * the honest cross-product shape. Spark plans this as
    * BroadcastNestedLoopJoin with the 5-row side broadcast, which is
    * exactly the right physical choice: at 100 TB a cross join is only
    * sane when one side fits in memory. */
  def qCrossJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").crossJoin(t(s, dir, "nation"))
      .filter(col("n_nationkey") % 5 === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("n_nationkey"))
      .orderBy(col("r_name"), col("n_name"))

  val qCrossJoinSql: String = """
    SELECT r_name, n_name, n_nationkey
    FROM region CROSS JOIN nation
    WHERE n_nationkey % 5 = r_regionkey
    ORDER BY r_name, n_name
  """.trim

  /** Fact-to-fact join forced onto SortMergeJoin via the MERGE hint —
    * the physical strategy a 100 TB fact×fact join must take when
    * neither side broadcasts (hash-shuffle both sides on the key,
    * merge sorted runs; spills via the external sorter instead of
    * building a giant hash map). Plan-asserted in ScaleSpec; the
    * result is identical to the unhinted join. */
  def qJoinSortMerge(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").hint("MERGE")
      .join(t(s, dir, "lineitem").hint("MERGE"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
      .orderBy(col("o_orderpriority"))

  val qJoinSortMergeSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** SHUFFLE_HASH-hinted fact-fact join — the third physical join
    * strategy next to broadcast (`join_broadcast`) and sort-merge
    * (`join_sortmerge`): both sides shuffle on the key, but the
    * smaller side becomes a per-partition hash map and the bigger
    * side streams against it with NO sort on either side. The right
    * choice at scale when one side is far smaller than the other yet
    * too big to broadcast (a pruned orders slice vs full lineitem).
    * ScaleSpec pins that the hint actually plans a ShuffledHashJoin. */
  def qJoinShuffleHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").hint("SHUFFLE_HASH")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy(col("o_orderstatus"))

  val qJoinShuffleHashSql: String = """
    SELECT o_orderstatus, COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * MATCH each other instead of vanishing — the join a dimension
    * with an "unknown" bucket needs. Catalyst plans `<=>` as an
    * ordinary hash join (null-safe keys still hash-partition: all
    * NULLs land in one bucket), so the scale shape is identical to
    * `=`; only the match semantics differ. Keys are NULLIF-built so
    * the fixture actually exercises the NULL↔NULL path. */
  def qJoinNullSafe(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "events")
      .filter(col("event_id") % 97 === 0)
      .select(col("event_id"), nullif(col("user_id") % 5, lit(0)).as("k"),
        col("value"))
    val b = s.range(0, 5)
      .select(nullif(col("id"), lit(0)).as("k"), (col("id") * 10).as("w"))
    a.join(b, a("k") <=> b("k"))
      .groupBy(col("event_id"), col("w"))
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("total_v"))
      .orderBy(col("event_id"), col("w"))
  }

  val qJoinNullSafeSql: String = """
    WITH a AS (SELECT event_id, NULLIF(user_id % 5, 0) AS k, value
               FROM events WHERE event_id % 97 = 0),
    b AS (SELECT NULLIF(n, 0) AS k, n * 10 AS w
          FROM (SELECT UNNEST(range(0, 5)) AS n))
    SELECT a.event_id, b.w,
      CAST(SUM(CAST(a.value AS DECIMAL(18,6))) AS DOUBLE) AS total_v
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.event_id, b.w ORDER BY a.event_id, b.w
  """.trim
}
