package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

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

  /** Winsorization (percentile outlier clipping) of `n_chars` at
    * p05/p95 — the length-outlier repair every corpus-cleaning
    * pipeline runs before length-sensitive sampling or packing.
    *
    * Scale shape: the quantiles are ONE tiny global aggregate
    * (2 doubles) cross-joined back onto the corpus — a broadcast of a
    * 1-row frame, then a per-row codegen'd clip. NOT a window: a
    * percentile window over the full table would sort everything in
    * one frame. Exact `percentile` (Spark) and `quantile_cont`
    * (DuckDB) both interpolate by the same R-7 rule index =
    * p·(n−1), so the bounds agree bit-for-bit on the int64 input;
    * the rendered bounds go through the fixed-point convention
    * anyway. */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"))
    def fx(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)).cast(LongType)
    docs.crossJoin(broadcast(bounds))
      .select(
        col("doc_id"), col("n_chars"),
        fx(col("lo")).as("p05_fx"),
        fx(col("hi")).as("p95_fx"),
        fx(greatest(least(col("n_chars").cast("double"), col("hi")),
          col("lo"))).as("clipped_fx"),
        (col("n_chars") < col("lo") || col("n_chars") > col("hi"))
          .as("is_outlier"))
      .orderBy("doc_id")
  }

  val qWinsorizeSql: String = """
    WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS lo,
                      quantile_cont(n_chars, 0.95) AS hi FROM documents)
    SELECT doc_id, n_chars,
      CAST(floor(lo * 10000.0 + 0.5) AS BIGINT) AS p05_fx,
      CAST(floor(hi * 10000.0 + 0.5) AS BIGINT) AS p95_fx,
      CAST(floor(greatest(least(CAST(n_chars AS DOUBLE), hi), lo)
        * 10000.0 + 0.5) AS BIGINT) AS clipped_fx,
      (n_chars < lo OR n_chars > hi) AS is_outlier
    FROM documents, b ORDER BY doc_id
  """.trim

  /** Robust per-group outlier detection — median/MAD, the
    * distribution-free counterpart to z-scores (a handful of corrupt
    * billion-value rows drag a mean/stddev fence arbitrarily far; the
    * median and the median-absolute-deviation have breakdown point
    * 50%). Per priority class of orders: median price, MAD, and the
    * rows outside median ± 5·MAD — the standard data-quality fence
    * before a corpus-level numeric column is trusted.
    *
    * Exactness: prices become exact integer cents via a decimal(18,2)
    * cast (the [[Relational.q1Agg]] money convention); a 0.5-quantile
    * over integers interpolates to an exact .0/.5 double under ANY
    * interpolation formula (values ≪ 2⁵³, midpoint exact), so Spark
    * `percentile` and DuckDB `quantile_cont` agree bit-for-bit, as do
    * the |x−med| deviations and the 5·MAD fence comparisons.
    *
    * Scale posture: groups are low-cardinality (the per-GROUP exact
    * median is a grouped sort of class-local rows, partial-agg'd;
    * for high-cardinality keys swap in `approx_quantile`'s GK path);
    * medians re-attach by BROADCAST hash join — the fact table
    * streams through map-side only, twice. */
  def qRobustOutliers(s: SparkSession, dir: String): DataFrame = {
    val cents = t(s, dir, "orders").select(
      col("o_orderpriority").as("pri"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("cents"))
    val med = cents.groupBy("pri")
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val dev = cents.join(broadcast(med), "pri")
      .select(col("pri"), col("cents"), col("med"),
        abs(col("cents") - col("med")).as("adev"))
    val mad = dev.groupBy("pri")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "pri")
      .groupBy("pri")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(col("adev") > col("mad") * 5, 1L).otherwise(0L))
          .as("n_outliers"),
        max(when(col("adev") > col("mad") * 5, col("cents"))).as("worst_cents"))
      .orderBy("pri")
  }

  val qRobustOutliersSql: String = """
    WITH c AS (
      SELECT o_orderpriority AS pri,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    m AS (SELECT pri, quantile_cont(cents, 0.5) AS med FROM c GROUP BY pri),
    d AS (
      SELECT c.pri, cents, med, ABS(cents - med) AS adev
      FROM c JOIN m USING (pri)),
    md AS (SELECT pri, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY pri)
    SELECT d.pri, COUNT(*) AS n, MAX(d.med) AS med_cents,
      MAX(md.mad) AS mad_cents,
      CAST(SUM(CASE WHEN adev > mad * 5 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_outliers,
      MAX(CASE WHEN adev > mad * 5 THEN cents END) AS worst_cents
    FROM d JOIN md USING (pri)
    GROUP BY d.pri ORDER BY d.pri
  """.trim

  /** Snapshot-to-snapshot distribution drift — the monitoring gate a
    * recurring 100 TB ingest runs before mixing a new batch into the
    * training pool: per categorical feature (language, source, and a
    * bucketed length), the total-variation distance between the
    * previous snapshot's distribution and the new one, plus the
    * single most-shifted bucket. TVD = ½·Σ|p_a − p_b| is used instead
    * of PSI/KL because it needs NO logarithm: with counts c and
    * totals n, Σ|c_a·n_b − c_b·n_a| is an exact integer sum (decimal
    * accumulation — order-independent at any partition count,
    * overflow-safe at 10^11-row snapshots), and the one double
    * division per feature at the end is bit-identical in the DuckDB
    * replay. A bucket absent from one side contributes its full mass,
    * so schema-adding batches (a NEW language appearing) register as
    * drift — the case that matters operationally.
    *
    * The two snapshots here are the even/odd doc_id halves (the
    * fixture has no ingest timeline); a deployment would pass two
    * TableLog versions (`log_time_travel`) instead. Scale shape: one
    * scan, a 3-way stack to (feature, bucket) pairs, two partial+final
    * aggs, and a per-feature rollup over O(buckets) rows — no window,
    * no driver state. */
  def qDriftDetect(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        floor(col("n_chars") / 200L).cast("string").as("len_bkt"))
      .select(col("doc_id"),
        expr("stack(3, 'lang', lang, 'source', source, 'len', len_bkt)")
          .as(Seq("feature", "bucket")))
    val counts = d.groupBy("feature", "bucket").agg(
      sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("cb"))
    val totals = counts.groupBy("feature").agg(
      sum("ca").as("na"), sum("cb").as("nb"))
    val dec = DecimalType(38, 0)
    val num = abs(col("ca").cast(dec) * col("nb") -
      col("cb").cast(dec) * col("na"))
    counts.join(broadcast(totals), Seq("feature"))
      .withColumn("num", num)
      .groupBy("feature").agg(
        count(lit(1)).as("n_buckets"),
        max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(col("num")).as("tvd_num"),
        max(struct(col("num"), col("bucket"))).getField("bucket")
          .as("worst_bucket"))
      .select(col("feature"), col("n_buckets"), col("na"), col("nb"),
        (col("tvd_num").cast("double") /
          (lit(2.0) * (col("na").cast(dec) * col("nb")).cast("double")))
          .as("tvd"),
        col("worst_bucket"))
      .withColumn("drifted", col("tvd") > 0.05)
      .orderBy("feature")
  }

  /** Snapshot reconciliation — classify every key of two table
    * snapshots as unchanged / changed / added / removed with one
    * full-outer join on the key, the audit a pipeline runs after any
    * backfill, migration, or vendor re-delivery ("what ACTUALLY
    * differs?"). Values compare by direct column equality — never via
    * a rendered-string row hash, whose float/decimal formatting would
    * be engine-specific. The "new" snapshot here is derived from the
    * base by a deterministic md5-nibble edit script (nibble 0 deleted,
    * 1 price-bumped, 2 cloned under a fresh negative key — disjoint by
    * sign, so no driver-side max-key scalar is needed); a deployment
    * diffs two real snapshots (e.g. two TableLog versions).
    *
    * Scale shape: ONE shuffle join on the key and a 4-group rollup;
    * per-class min/max keys give the auditor an entry point without
    * materializing row-level diffs (that's what the classified join
    * output is for when actually needed). */
  def qTableDiff(s: SparkSession, dir: String): DataFrame = {
    def nib(k: Column) = substring(md5(k.cast("string")), 1, 1)
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    val next = base.filter(nib(col("key")) =!= "0")
      .withColumn("price",
        when(nib(col("key")) === "1", col("price") + lit(1.0))
          .otherwise(col("price")))
      .unionByName(base.filter(nib(col("key")) === "2")
        .select((-col("key") - 1).as("key"), col("price"), col("status")))
    val a = base.select(col("key").as("ak"), col("price").as("ap"),
      col("status").as("as_"))
    val b = next.select(col("key").as("bk"), col("price").as("bp"),
      col("status").as("bs"))
    a.join(b, col("ak") === col("bk"), "full_outer")
      .select(
        when(col("bk").isNull, "removed")
          .when(col("ak").isNull, "added")
          .when(col("ap") =!= col("bp") || col("as_") =!= col("bs"),
            "changed")
          .otherwise("unchanged").as("class"),
        coalesce(col("ak"), col("bk")).as("key"))
      .groupBy("class")
      .agg(count(lit(1)).as("n"), min("key").as("min_key"),
        max("key").as("max_key"))
      .orderBy("class")
  }

  val qTableDiffSql: String = """
    WITH base AS (
      SELECT o_orderkey AS key, o_totalprice AS price,
        o_orderstatus AS status FROM orders),
    next AS (
      SELECT key,
        CASE WHEN substr(md5(CAST(key AS VARCHAR)), 1, 1) = '1'
             THEN price + 1.0 ELSE price END AS price, status
      FROM base WHERE substr(md5(CAST(key AS VARCHAR)), 1, 1) <> '0'
      UNION ALL
      SELECT -key - 1, price, status FROM base
      WHERE substr(md5(CAST(key AS VARCHAR)), 1, 1) = '2'),
    d AS (
      SELECT CASE WHEN b.key IS NULL THEN 'removed'
                  WHEN a.key IS NULL THEN 'added'
                  WHEN a.price <> b.price OR a.status <> b.status
                    THEN 'changed'
                  ELSE 'unchanged' END AS class,
        COALESCE(a.key, b.key) AS key
      FROM base a FULL OUTER JOIN next b ON a.key = b.key)
    SELECT class, COUNT(*) AS n, MIN(key) AS min_key, MAX(key) AS max_key
    FROM d GROUP BY class ORDER BY class
  """.trim

  val qDriftDetectSql: String = """
    WITH f AS (
      SELECT doc_id, feature, bucket FROM (
        SELECT doc_id, 'lang' AS feature, lang AS bucket FROM documents
        UNION ALL
        SELECT doc_id, 'source', source FROM documents
        UNION ALL
        SELECT doc_id, 'len', CAST(CAST(FLOOR(n_chars / 200) AS BIGINT) AS VARCHAR)
        FROM documents)),
    counts AS (
      SELECT feature, bucket,
        SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
        SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
      FROM f GROUP BY 1, 2),
    totals AS (
      SELECT feature, SUM(ca) AS na, SUM(cb) AS nb FROM counts GROUP BY 1),
    nums AS (
      SELECT feature, bucket, ca, cb, na, nb,
        ABS(ca * nb - cb * na) AS num
      FROM counts JOIN totals USING (feature))
    SELECT feature, COUNT(*) AS n_buckets,
      CAST(MAX(na) AS BIGINT) AS na, CAST(MAX(nb) AS BIGINT) AS nb,
      CAST(SUM(num) AS DOUBLE) /
        (2.0 * CAST(MAX(na) * MAX(nb) AS DOUBLE)) AS tvd,
      (MAX(struct_pack(num := num, bucket := bucket))).bucket AS worst_bucket,
      CAST(SUM(num) AS DOUBLE) /
        (2.0 * CAST(MAX(na) * MAX(nb) AS DOUBLE)) > 0.05 AS drifted
    FROM nums GROUP BY feature ORDER BY feature
  """.trim

  /** Population Stability Index per feature bucket — the
    * scorecard-monitoring standard alongside `drift_detect`'s TVD:
    * PSI_bucket = (pa − pb)·ln(pa/pb), summed over buckets when a
    * single scalar is wanted. The two snapshots are the even/odd
    * event_id halves (same convention as drift_detect; a deployment
    * passes two TableLog versions). Laplace-smoothed — pa = (ca+1)/
    * (na+k) with k = bucket count — so a bucket empty on one side
    * contributes a finite term instead of ±∞.
    *
    * Float discipline (the pmi_cooccur pattern): bucket identity and
    * row ORDER are integers/strings only; the PSI value is an exactly-
    * rounded division chain plus one round-6 ln, never a sort key or
    * a threshold. No per-feature total row: a cross-row float SUM's
    * value depends on reduction order, which a distributed engine
    * must not bake into a hash-compared artifact.
    *
    * Scale shape: one scan, a 2-way stack to (feature, bucket) pairs,
    * one partial+final agg, and a broadcast of the O(buckets) totals
    * — no window, no driver state. */
  def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), expr(
        "stack(2, 'type', event_type, " +
          "'val', CAST(CAST(FLOOR(value / 50) AS BIGINT) AS STRING))")
        .as(Seq("feature", "bucket")))
    val counts = e.groupBy("feature", "bucket").agg(
      sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("cb"))
    val totals = counts.groupBy("feature").agg(
      sum("ca").as("na"), sum("cb").as("nb"), count(lit(1)).as("k"))
    counts.join(broadcast(totals), Seq("feature"))
      .withColumn("pa",
        (col("ca") + 1).cast("double") / (col("na") + col("k")).cast("double"))
      .withColumn("pb",
        (col("cb") + 1).cast("double") / (col("nb") + col("k")).cast("double"))
      .select(col("feature"), col("bucket"), col("ca"), col("cb"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6).as("psi"))
      // NULLS LAST pinned: a NULL bucket (a null feature value) sorts
      // first under Spark's ASC default but last under DuckDB's — the
      // same divergence SqlSyntax.rewriteOrderByAll pins against
      .orderBy(col("feature"), col("bucket").asc_nulls_last)
  }

  val qPsiDriftSql: String = """
    WITH e AS (
      SELECT event_id, feature, bucket FROM (
        SELECT event_id, 'type' AS feature, event_type AS bucket FROM events
        UNION ALL
        SELECT event_id, 'val',
          CAST(CAST(FLOOR(value / 50) AS BIGINT) AS VARCHAR) FROM events)),
    counts AS (
      SELECT feature, bucket,
        CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM e GROUP BY feature, bucket),
    tot AS (
      SELECT feature, CAST(SUM(ca) AS BIGINT) AS na,
        CAST(SUM(cb) AS BIGINT) AS nb, COUNT(*) AS k
      FROM counts GROUP BY feature),
    j AS (
      SELECT c.feature, c.bucket, c.ca, c.cb,
        CAST(c.ca + 1 AS DOUBLE) / CAST(t.na + t.k AS DOUBLE) AS pa,
        CAST(c.cb + 1 AS DOUBLE) / CAST(t.nb + t.k AS DOUBLE) AS pb
      FROM counts c JOIN tot t USING (feature))
    SELECT feature, bucket, ca, cb,
      ROUND((pa - pb) * ln(pa / pb), 6) AS psi
    FROM j ORDER BY feature, bucket
  """.trim

  /** Two-sample Kolmogorov–Smirnov drift test per feature — the
    * continuous-distribution complement to `drift_detect`'s TVD and
    * `psi_drift`'s PSI: D = max over thresholds of |CDF_a − CDF_b|,
    * with the α=0.05 rejection decided EXACTLY. Everything is integer
    * arithmetic until one final display division: D's numerator is
    * max |cum_a·n_b − cum_b·n_a| (decimal-exact cross-multiply), and
    * the Smirnov rejection D > 1.36·√((na+nb)/(na·nb)) is squared into
    * the integer comparison 10000·num² > 18496·na·nb·(na+nb) — so the
    * BOOLEAN ships hash-exact cross-engine, no sqrt anywhere. The
    * squared form is exact while na+nb ≤ 4·10⁸ per feature (decimal38/
    * HUGEINT headroom); beyond that the operator refuses loudly
    * rather than let a decimal overflow null the boolean silently.
    *
    * Scale shape: the cumulative window runs over the AGGREGATED
    * (feature, bucket) table — O(buckets) rows partitioned by feature
    * — never over raw events; one scan, one agg shuffle, a broadcast
    * of per-feature totals, a final O(features) rollup. */
  def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(s, dir, "events")
      .select(col("event_id"), expr(
        "stack(2, 'val', CAST(FLOOR(value * 10) AS BIGINT), " +
          "'hour', CAST(hour(ts) AS BIGINT))")
        .as(Seq("feature", "bucket")))
    val counts = e.groupBy("feature", "bucket").agg(
      sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("cb"))
    // NULLS LAST pinned on the cumulative order: a NULL bucket must
    // accumulate at the SAME end on both engines or cuma/cumb prefixes
    // (and therefore D and worst_bucket) diverge cross-engine
    val w = Window.partitionBy("feature").orderBy(col("bucket").asc_nulls_last)
    val cum = counts
      .withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
    val totals = counts.groupBy("feature").agg(
      sum("ca").as("na"), sum("cb").as("nb"))
    val dec = DecimalType(38, 0)
    cum.join(broadcast(totals), Seq("feature"))
      .withColumn("num", abs(col("cuma").cast(dec) * col("nb") -
        col("cumb").cast(dec) * col("na")))
      .groupBy("feature").agg(
        count(lit(1)).as("n_buckets"),
        max("na").as("na"), max("nb").as("nb"),
        max("num").as("d_num"),
        max(struct(col("num"), col("bucket"))).getField("bucket")
          .as("worst_bucket"))
      .select(col("feature"), col("n_buckets"), col("na"), col("nb"),
        (col("d_num").cast("double") /
          (col("na").cast(dec) * col("nb")).cast("double")).as("d"),
        col("worst_bucket"),
        // headroom contract, checked not assumed: num ≤ na·nb, so
        // num²·10⁴ stays inside decimal(38,0) (and the oracle's
        // HUGEINT) only while na+nb ≤ 4·10⁸ per feature — past that
        // Spark's non-ANSI decimal multiply would return NULL and the
        // boolean would silently vanish; refuse loudly instead
        // (rebucket or shard the snapshot pair). The guard is one
        // comparison on the O(features) post-agg rows.
        when(col("na") + col("nb") > 400000000L,
          raise_error(lit("ks_drift: the exact Smirnov comparison " +
            "overflows decimal(38) past 4e8 rows per feature — " +
            "rebucket or shard the snapshot pair")).cast("boolean"))
          .otherwise(
            col("d_num") * col("d_num") * lit(10000) >
              lit(18496).cast(dec) * col("na") * col("nb") *
                (col("na") + col("nb")).cast(dec)).as("rejected"))
      .orderBy("feature")
  }

  val qKsDriftSql: String = """
    WITH e AS (
      SELECT event_id, feature, bucket FROM (
        SELECT event_id, 'val' AS feature,
          CAST(FLOOR(value * 10) AS BIGINT) AS bucket FROM events
        UNION ALL
        SELECT event_id, 'hour', CAST(EXTRACT(hour FROM ts) AS BIGINT)
        FROM events)),
    counts AS (
      SELECT feature, bucket,
        CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM e GROUP BY feature, bucket),
    cum AS (
      SELECT feature, bucket, ca, cb,
        SUM(ca) OVER (PARTITION BY feature ORDER BY bucket) AS cuma,
        SUM(cb) OVER (PARTITION BY feature ORDER BY bucket) AS cumb
      FROM counts),
    tot AS (
      SELECT feature, CAST(SUM(ca) AS BIGINT) AS na,
        CAST(SUM(cb) AS BIGINT) AS nb
      FROM counts GROUP BY feature),
    nums AS (
      SELECT c.feature, c.bucket, t.na, t.nb,
        ABS(CAST(c.cuma AS HUGEINT) * t.nb - CAST(c.cumb AS HUGEINT) * t.na)
          AS num
      FROM cum c JOIN tot t USING (feature))
    SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_buckets,
      CAST(MAX(na) AS BIGINT) AS na, CAST(MAX(nb) AS BIGINT) AS nb,
      CAST(MAX(num) AS DOUBLE) /
        CAST(CAST(MAX(na) AS HUGEINT) * MAX(nb) AS DOUBLE) AS d,
      (MAX(struct_pack(num := num, bucket := bucket))).bucket AS worst_bucket,
      MAX(num) * MAX(num) * 10000 >
        18496 * CAST(MAX(na) AS HUGEINT) * MAX(nb) * (MAX(na) + MAX(nb))
        AS rejected
    FROM nums GROUP BY feature ORDER BY feature
  """.trim
}
