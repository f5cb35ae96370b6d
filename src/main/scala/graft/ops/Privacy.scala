package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** PII handling for training-data pipelines (builder brief: the
  * operations a large-scale pipeline needs): regex redaction of
  * identifying substrings plus stable pseudonymization, the two
  * standard moves before a corpus leaves its trust boundary.
  *
  * Reference analogue: Gandiva's regexp/replace string kernel tier
  * (/root/reference/cpp/src/gandiva/function_registry_string.cc) —
  * re-expressed as Spark `regexp_replace`/`sha2` so the whole row
  * transform stays inside whole-stage codegen.
  *
  * Scale shape: narrow per-row map over one scan — no shuffle, no
  * UDF, embarrassingly parallel at any row count. The pseudonym is
  * a pure function of the value (first 16 hex chars of SHA-256), so
  * the same entity maps to the same token across files, runs, and
  * incremental re-ingests — exactly what entity-consistent anonymized
  * corpora need; 64 bits keeps collisions negligible below ~2^32
  * distinct entities.
  */
object Privacy {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** The redaction transform on any customer-shaped frame: redact
    * digit runs from the display name, attach the stable pseudonym,
    * and coarsen the account balance to a 1000-unit bucket
    * (k-anonymity-style generalization of a quasi-identifier).
    * Pure per-row Columns — batch/stream unified (StreamingSpec runs
    * it unchanged on a MemoryStream).
    *
    * Caveats a REAL release must address (retained here deliberately
    * so the oracle can key on them, the [[qDpCounts]] precedent):
    * `c_custkey` itself rides through for the join/order key — a true
    * release drops it and keys on the pseudonym; and the pseudonym is
    * an UNSALTED sha256 prefix of a low-entropy name, invertible by
    * enumeration — a real pipeline uses a keyed hash (HMAC with a
    * secret). What this op pins is the transform mechanics. */
  def redact(df: DataFrame): DataFrame =
    df.select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "[0-9]", "X").as("redacted_name"),
      substring(sha2(col("c_name"), 256), 1, 16).as("pseudonym"),
      (floor(col("c_acctbal") / 1000) * 1000).cast(LongType).as("acctbal_bucket"),
      col("c_mktsegment"))

  def qPiiRedact(s: SparkSession, dir: String): DataFrame =
    redact(t(s, dir, "customer").filter(col("c_custkey") < 200))
      .orderBy("c_custkey")

  val qPiiRedactSql: String = """
    SELECT c_custkey,
      regexp_replace(c_name, '[0-9]', 'X', 'g') AS redacted_name,
      substr(sha256(c_name), 1, 16) AS pseudonym,
      CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bucket,
      c_mktsegment
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
  """.trim

  /** k-anonymity audit over the coarsened quasi-identifiers
    * (mktsegment × nation × 1000-unit balance bucket): every
    * equivalence class with fewer than k=5 members must be SUPPRESSED
    * before release — the audit reports, per segment, the class
    * count, how many classes fail k, and the row share that
    * suppression would cost. One partial+final agg over the QI tuple,
    * then a tiny per-segment rollup; nothing row-level leaves the
    * executors. */
  def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"),
        (floor(col("c_acctbal") / 1000) * 1000).cast(LongType).as("bal_bucket"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < 5, 1L).otherwise(0L)).as("n_below_k"),
        sum(when(col("class_size") < 5, col("class_size")).otherwise(0L))
          .as("rows_suppressed"),
        sum(col("class_size")).as("n_rows"),
        min(col("class_size")).as("min_class"))
      .orderBy(col("c_mktsegment"))

  val qKAnonymitySql: String = """
    WITH classes AS (
      SELECT c_mktsegment, c_nationkey,
        CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_bucket,
        COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2, 3)
    SELECT c_mktsegment, COUNT(*) AS n_classes,
      CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
      CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS rows_suppressed,
      CAST(SUM(class_size) AS BIGINT) AS n_rows,
      CAST(MIN(class_size) AS BIGINT) AS min_class
    FROM classes GROUP BY c_mktsegment ORDER BY c_mktsegment
  """.trim

  /** l-diversity audit (Machanavajjhala et al. 2007) — the gate AFTER
    * k-anonymity: a class of 5 identical quasi-identifier rows still
    * leaks if all 5 share the sensitive value. Classes = coarsened
    * (status, order year, 5000-wide price bucket); sensitive =
    * o_orderpriority; l = distinct sensitive values per class. Emits
    * per-status class counts, the minimum l, sub-l=2 class counts and
    * their exposed rows — the suppression worklist.
    *
    * Scale posture: two hash aggregations (class roll-up, then
    * segment roll-up) — the distinct-count runs inside the first
    * partial+final agg over class-local rows, never a global
    * distinct; one scan end-to-end. */
  def qLDiversity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderstatus"), year(col("o_orderdate")).as("yr"),
        (floor(col("o_totalprice") / 5000) * 5000).cast(LongType)
          .as("price_bucket"),
        col("o_orderpriority"))
      .groupBy(col("o_orderstatus"), col("yr"), col("price_bucket"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("o_orderpriority")).as("l"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < 2, 1L).otherwise(0L)).as("n_below_l"),
        sum(when(col("l") < 2, col("class_size")).otherwise(0L))
          .as("rows_exposed"),
        sum(col("class_size")).as("n_rows"))
      .orderBy(col("o_orderstatus"))

  val qLDiversitySql: String = """
    WITH classes AS (
      SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS yr,
        CAST(FLOOR(o_totalprice / 5000) * 5000 AS BIGINT) AS price_bucket,
        COUNT(*) AS class_size,
        COUNT(DISTINCT o_orderpriority) AS l
      FROM orders GROUP BY 1, 2, 3)
    SELECT o_orderstatus, COUNT(*) AS n_classes,
      CAST(MIN(l) AS BIGINT) AS min_l,
      CAST(SUM(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_l,
      CAST(SUM(CASE WHEN l < 2 THEN class_size ELSE 0 END) AS BIGINT) AS rows_exposed,
      CAST(SUM(class_size) AS BIGINT) AS n_rows
    FROM classes GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the gate
    * AFTER [[qLDiversity]]: an l-diverse class still leaks when its
    * sensitive-value DISTRIBUTION diverges from the table's (5
    * distinct values that are 96% '5-LOW' tells an attacker plenty).
    * Classes = (status, order year); sensitive = o_orderpriority, an
    * ORDERED attribute, so closeness is the 1-D earth-mover's
    * distance: t = Σᵢ |cum_class(i)/n − cum_global(i)/N| / (m−1),
    * the normalized area between the two CDFs.
    *
    * Exactness: both CDFs stay as integer cumulative counts and the
    * comparison is cross-multiplied — Σᵢ |cumᵢ·N − gcumᵢ·n| — so the
    * whole EMD is ONE double division of exact integers (at 100 TB
    * the products approach 2⁶³: swap the Σ term to decimal there).
    *
    * Scale posture: global distribution is one m+1-column aggregate
    * row collected to the driver (bounded by m, the [[Sketches
    * .heavyHitters]] precedent) and folded into the class-level
    * expressions as literals; classes are one partial+final agg with
    * the m per-category counts as conditional sums — no cross join of
    * classes × categories, no window, one scan + one shuffle.
    *
    * Eager-action note: the global-distribution `head()` below runs a
    * full-scan job AT PLAN-BUILD time (same precedent as
    * heavyHitters), so constructing this DataFrame is not free and
    * the folded literals snapshot the table as of build time — a
    * table mutated between build and execution would make the
    * t-statistics stale. Acceptable for a batch audit; a live
    * pipeline should rebuild the frame per run. */
  def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    val m = Priorities.size
    val orders = t(s, dir, "orders").select(col("o_orderstatus"),
      year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
    def catCounts(alias: Int => String) = Priorities.zipWithIndex.map {
      case (p, i) => sum(when(col("o_orderpriority") === p, 1L)
        .otherwise(0L)).as(alias(i))
    }
    val gAggs = count(lit(1)).as("n_total") +: catCounts(i => s"g$i")
    val gRow = orders.agg(gAggs.head, gAggs.tail: _*).head()
    val bigN = gRow.getAs[Long]("n_total")
    val gcum = Priorities.indices
      .map(i => gRow.getAs[Long](s"g$i")).scanLeft(0L)(_ + _).tail
    val cAggs = count(lit(1)).as("n") +: catCounts(i => s"c$i")
    val cums = Priorities.indices
      .map(i => (0 to i).map(j => col(s"c$j")).reduce(_ + _))
    val tNum = Priorities.indices
      .map(i => abs(cums(i) * bigN - lit(gcum(i)) * col("n")))
      .reduce(_ + _)
    orders.groupBy(col("o_orderstatus"), col("yr"))
      .agg(cAggs.head, cAggs.tail: _*)
      .select(col("o_orderstatus"), col("yr"), col("n"),
        (tNum.cast(DoubleType) /
          (col("n") * bigN * (m - 1)).cast(DoubleType)).as("t"))
      .withColumn("breach", col("t") > 0.15)
      .orderBy("o_orderstatus", "yr")
  }

  val qTClosenessSql: String = {
    def cat(i: Int, of: String) =
      s"SUM(CASE WHEN o_orderpriority = '${Priorities(i)}' THEN 1 ELSE 0 END) AS $of$i"
    val gSel = Priorities.indices.map(i => cat(i, "g")).mkString(", ")
    val cSel = Priorities.indices.map(i => cat(i, "c")).mkString(", ")
    def cum(of: String, i: Int) =
      (0 to i).map(j => s"$of$j").mkString("(", " + ", ")")
    val tNum = Priorities.indices
      .map(i => s"ABS(${cum("c", i)} * g.n_total - ${cum("g", i)} * c.n)")
      .mkString(" + ")
    s"""WITH o AS (
       |  SELECT o_orderstatus, EXTRACT(year FROM o_orderdate) AS yr,
       |    o_orderpriority FROM orders),
       |g AS (SELECT COUNT(*) AS n_total, $gSel FROM o),
       |cls AS (
       |  SELECT o_orderstatus, yr, COUNT(*) AS n, $cSel
       |  FROM o GROUP BY 1, 2)
       |SELECT c.o_orderstatus, c.yr, CAST(c.n AS BIGINT) AS n,
       |  CAST($tNum AS DOUBLE)
       |    / CAST(c.n * g.n_total * ${Priorities.size - 1} AS DOUBLE) AS t,
       |  CAST($tNum AS DOUBLE)
       |    / CAST(c.n * g.n_total * ${Priorities.size - 1} AS DOUBLE)
       |    > 0.15 AS breach
       |FROM cls c, g
       |ORDER BY o_orderstatus, yr""".stripMargin
  }

  /** The deterministic deletion list: a pure function of the key so
    * the oracle can recompute it (a real run would read a requests
    * table). ~3% of customers. */
  private def deletionSet(c: org.apache.spark.sql.Column) = pmod(c * 48271L, lit(97L)) < 3

  /** Deletion-list propagation — the "right to be forgotten" pass: a
    * small key list must erase every derived row across the fact
    * tables. Each fact anti-joins the BROADCAST deletion list (a
    * deletion list is always tiny relative to the corpus), so the
    * scrub is one broadcast + one scan per table — no shuffle of fact
    * data anywhere. Output: per-table rows before/after/deleted, the
    * audit record a compliance pass has to produce. */
  def qDeletionPropagate(s: SparkSession, dir: String): DataFrame = {
    val del = t(s, dir, "customer").filter(deletionSet(col("c_custkey")))
      .select(col("c_custkey").as("del_key"))
    // One scan per table: broadcast left-join marks doomed rows, a
    // global agg counts them — before/after/deleted in a single pass.
    def audit(name: String, df: org.apache.spark.sql.DataFrame, key: String) =
      df.join(broadcast(del), df(key) === del("del_key"), "left_outer")
        .agg(count(lit(1)).as("n_before"),
          sum(when(col("del_key").isNull, 1L).otherwise(0L)).as("n_after"),
          count(col("del_key")).as("n_deleted"))
        .select(lit(name).as("table_name"), col("n_before"), col("n_after"),
          col("n_deleted"))
    audit("customer", t(s, dir, "customer"), "c_custkey")
      .unionAll(audit("orders", t(s, dir, "orders"), "o_custkey"))
      .orderBy("table_name")
  }

  val qDeletionPropagateSql: String = """
    WITH del AS (
      SELECT c_custkey AS del_key FROM customer
      WHERE (c_custkey * 48271) % 97 < 3)
    SELECT * FROM (
      SELECT 'customer' AS table_name,
        (SELECT COUNT(*) FROM customer) AS n_before,
        (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT del_key FROM del)) AS n_after,
        (SELECT COUNT(*) FROM customer WHERE c_custkey IN (SELECT del_key FROM del)) AS n_deleted
      UNION ALL
      SELECT 'orders',
        (SELECT COUNT(*) FROM orders),
        (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT del_key FROM del)),
        (SELECT COUNT(*) FROM orders WHERE o_custkey IN (SELECT del_key FROM del)))
    ORDER BY table_name
  """.trim

  // ---- Differentially-private release ----------------------------------

  private val DpEpsilon = 1.0

  /** DP-SHAPED noisy histogram (Laplace mechanism arithmetic, Dwork
    * et al. 2006: per-group counts + Laplace(Δf/ε) noise, Δf = 1).
    * NOT a differentially-private release as published here: the
    * noise is a DETERMINISTIC function of the public group key (md5
    * inverse-CDF — the cross-engine-stable pattern that makes an
    * exact DuckDB oracle possible), so anyone can recompute and
    * subtract it, and `n_true` is emitted alongside `n_noisy` for
    * the oracle's benefit. A real ε-DP release keeps the mechanism
    * but (a) seeds the noise with a SECRET release key, (b) omits
    * `n_true`, and (c) accounts ε across repeated releases. What
    * this query pins is the distributed mechanism shape and its
    * exact arithmetic.
    *
    * Scale shape: one partial+final hash aggregation over the scan,
    * then per-row noise arithmetic — no second pass, no driver state. */
  def qDpCounts(s: SparkSession, dir: String): DataFrame = {
    val grp = concat(col("event_type"), lit(":"), (col("user_id") % 10).cast("string"))
    val u = conv(substring(md5(concat(lit("dp1:"), col("grp"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val centered = u - lit(0.5)
    val noise = -lit(1.0 / DpEpsilon) * signum(centered) *
      log(greatest(lit(1e-12), lit(1.0) - lit(2.0) * abs(centered)))
    t(s, dir, "events")
      .groupBy(grp.as("grp"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("n_noisy", round(col("n_true") + noise, 6))
      .orderBy(col("grp"))
  }

  val qDpCountsSql: String = """
    WITH g AS (
      SELECT event_type || ':' || CAST(user_id % 10 AS VARCHAR) AS grp,
        COUNT(*) AS n_true
      FROM events GROUP BY 1),
    u AS (
      SELECT grp, n_true,
        ((strpos('0123456789abcdef', substr(md5('dp1:' || grp), 1, 1)) - 1) * 268435456.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 2, 1)) - 1) * 16777216.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 3, 1)) - 1) * 1048576.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 4, 1)) - 1) * 65536.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 5, 1)) - 1) * 4096.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 6, 1)) - 1) * 256.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 7, 1)) - 1) * 16.0
       + (strpos('0123456789abcdef', substr(md5('dp1:' || grp), 8, 1)) - 1) * 1.0
        ) / 4294967296.0 AS u
      FROM g)
    SELECT grp, n_true,
      ROUND(n_true + (-1.0 * SIGN(u - 0.5) *
        ln(GREATEST(1e-12, 1.0 - 2.0 * ABS(u - 0.5)))), 6) AS n_noisy
    FROM u ORDER BY grp
  """.trim
}
