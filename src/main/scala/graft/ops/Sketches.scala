package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Frequency-sketch operators — the two-pass heavy-hitter pipeline
  * every corpus-scale vocabulary job reduces to: a tiny deterministic
  * per-partition sketch proposes candidates (no shuffle of the full
  * token stream), then an exact pass verifies ONLY the candidates, so
  * the aggregation shuffle shrinks from |vocabulary| to |candidates|
  * while the final answer stays exact.
  *
  * Candidate generation is Misra–Gries: a capacity-c summary
  * guarantees any item with in-partition frequency > n_p/c survives.
  * With c = ceil(2/θ), an item with GLOBAL frequency ≥ θ·n must have
  * frequency ≥ θ·n_p in at least one partition (pigeonhole) and
  * therefore survives that partition's sketch — the union of
  * per-partition survivors is a candidate superset with NO false
  * negatives, at most c items per partition. False positives are
  * killed by the exact count, so — like the bloom prefilter in
  * [[Dedup.qDedupBloom]] — the sketch changes the plan, never the
  * answer, and the oracle is plain exact SQL.
  */
object Sketches {

  /** Misra–Gries update loop over one iterator: at most `cap` live
    * counters; survivors are every item whose frequency exceeds
    * n/cap. Deterministic (no hashing, no sampling). */
  private[graft] def misraGries(items: Iterator[String], cap: Int)
      : collection.Map[String, Long] = {
    val counters = collection.mutable.HashMap.empty[String, Long]
    items.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters(x) = c + 1
        case None if counters.size < cap => counters(x) = 1L
        case None =>
          // decrement-all step; amortized O(1) per arrival overall
          val dead = collection.mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(counters.remove)
      }
    }
    counters
  }

  /** Exact heavy hitters: every word with frequency ≥ `theta` of all
    * word occurrences, with its exact count. Two passes over the
    * token stream, zero full-vocabulary shuffles:
    *  1. per-partition Misra–Gries (capacity 2/θ) → ≤ cap survivors
    *     per partition, unioned on the driver (≤ cap × partitions
    *     strings — the documented driver-side bound) and broadcast;
    *  2. exact count of candidate tokens only, then the θ·n gate with
    *     n from the same scan pair.
    * The answer is provably the exact heavy-hitter set: no false
    * negatives by the pigeonhole/MG guarantee, no false positives
    * past the exact gate. */
  def heavyHitters(docs: DataFrame, textCol: String, theta: Double)
      : DataFrame = {
    require(theta > 0 && theta < 1, "theta in (0,1)")
    val cap = math.ceil(2.0 / theta).toInt
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Iterator.empty else t.split(" ").iterator)
    val candidates = words
      .mapPartitions(it => misraGries(it, cap).keysIterator)
      .distinct().collect().toSeq
    // total token count from a column aggregate over the source frame —
    // a scan, but no explode and no shuffle (vs counting `words`)
    val total = docs.agg(
      sum(when(col(textCol).isNull, 0)
        .otherwise(size(split(col(textCol), " ")))))
      .head().getLong(0)
    val threshold = math.ceil(theta * total).toLong
    words.toDF("w")
      .filter(col("w").isInCollection(candidates))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col("w").as("word"), col("n").as("n"),
        lit(total).as("n_total"))
      .orderBy(desc("n"), col("word"))
  }

  /** Heavy hitters over the documents corpus at θ = 1 %. */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables(s, dir, "documents"), "text", 0.01)

  // ---------------------------------------------------------------- KMV

  private val KmvK = 256

  /** 2^63 and 2^64 as exact doubles — the [-2^63, 2^63) signed-long
    * domain maps to a [0,1) fraction with two correctly-rounded ops,
    * so both engines compute the identical estimate. */
  private val TwoPow63 = 9.223372036854776e18
  private val TwoPow64 = 1.8446744073709552e19

  /** KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct-count
    * sketch over trigram-shingle sets, plus the KMV set-operation
    * estimators (union size + Jaccard) between two corpus halves —
    * the sketch a 100 TB pipeline ships per shard to answer "how many
    * distinct shingles, and how much do two crawls overlap" without
    * ever co-shuffling the shard vocabularies.
    *
    * Estimator: with h mapping elements uniformly into [0,1), the
    * k-th smallest hash h_k of a set of D distinct elements
    * concentrates at k/D, so D̂ = (k-1)/h_k (the unbiased form); a
    * sketch that never filled (|set| < k) IS the exact distinct set.
    * Jaccard: the k smallest hashes of A∪B are a uniform k-sample of
    * the union, so the fraction of them belonging to BOTH sets
    * estimates |A∩B|/|A∪B|; every union-sketch member that is in A is
    * necessarily in A's own bottom-k (k smallest of a subset), so
    * membership needs only the per-set sketches — sketches compose
    * without revisiting the data.
    *
    * Determinism: the hash is the engine's fused [[graft.functions
    * .md5_shingles64]] kernel (first 64 md5 bits, the cross-engine
    * hash), the fraction map is two exact double ops, and the
    * estimate one division — the DuckDB oracle replays every bit, so
    * even the ESTIMATES are hash-checked (unlike HLL/GK whose sketch
    * state is engine-private, SURVEY §2.12 oracle floor).
    *
    * Scale posture: per-part distinct hashes are one map-side-partial
    * hash agg; bottom-k rides the [[graft.plans.TopKPerGroup]]
    * physical operator (per-partition bounded heaps, k-capped
    * shuffle) and the union sketch a TakeOrderedAndProject — nothing
    * driver-side beyond the final ≤ 2k+3 rows. Output: one row per
    * part (a, b) + one union row carrying the Jaccard estimators. */
  def qKmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.md5_shingles64
    val k = KmvK
    def frac(h: org.apache.spark.sql.Column) =
      (h.cast(DoubleType) + lit(TwoPow63)) / lit(TwoPow64)
    def estOf(n: org.apache.spark.sql.Column, hk: org.apache.spark.sql.Column) =
      when(n < k, n.cast(DoubleType)).otherwise(lit((k - 1).toDouble) / frac(hk))
    val dh = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(when(col("doc_id") % 2 === 0, "a").otherwise("b").as("part"),
        explode(md5_shingles64(col("text"), 3)).as("h"))
      .distinct()
      .localCheckpoint(true) // reused 5×: sketches, exacts, membership
    val sk = graft.plans.TopKPerGroup(dh, Seq("part"), Seq("h" -> true), k)
    val partRows = sk.groupBy("part")
      .agg(count(lit(1)).as("sketch_n"), max("h").as("hk"))
      .join(dh.groupBy("part").agg(count(lit(1)).as("n_exact")), "part")
      .select(col("part"), col("n_exact"), col("sketch_n"),
        estOf(col("sketch_n"), col("hk")).as("est"),
        lit(null).cast(DoubleType).as("jacc_est"),
        lit(null).cast(DoubleType).as("jacc_exact"))
    val uh = dh.select("h").distinct()
    val sku = uh.orderBy("h").limit(k) // TakeOrderedAndProject: k-capped
    val flagged = sku
      .join(dh.filter(col("part") === "a").select(col("h"), lit(1).as("ina")),
        Seq("h"), "left")
      .join(dh.filter(col("part") === "b").select(col("h"), lit(1).as("inb")),
        Seq("h"), "left")
    // three single-row aggregates merged by union+max (no join — a
    // constant-key join would constant-fold into a nested-loop cross)
    val nulls = lit(null).cast(LongType)
    val ustat = flagged.agg(
      count(lit(1)).as("sketch_n"), max("h").as("hk"),
      sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
        .otherwise(0L)).as("n_inter"))
      .select(col("sketch_n"), col("hk"), col("n_inter"),
        nulls.as("n_exact"), nulls.as("n_int_exact"))
    val uex = uh.agg(count(lit(1)).as("n_exact"))
      .select(nulls.as("sketch_n"), nulls.as("hk"), nulls.as("n_inter"),
        col("n_exact"), nulls.as("n_int_exact"))
    val uinterEx = dh.groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") === 2).agg(count(lit(1)).as("n_int_exact"))
      .select(nulls.as("sketch_n"), nulls.as("hk"), nulls.as("n_inter"),
        nulls.as("n_exact"), col("n_int_exact"))
    val unionRow = ustat.unionAll(uex).unionAll(uinterEx)
      .agg(max("sketch_n").as("sketch_n"), max("hk").as("hk"),
        max("n_inter").as("n_inter"), max("n_exact").as("n_exact"),
        max("n_int_exact").as("n_int_exact"))
      .select(lit("union").as("part"), col("n_exact"), col("sketch_n"),
        estOf(col("sketch_n"), col("hk")).as("est"),
        (col("n_inter").cast(DoubleType) / col("sketch_n")).as("jacc_est"),
        (col("n_int_exact").cast(DoubleType) / col("n_exact")).as("jacc_exact"))
    partRows.unionAll(unionRow).orderBy("part")
  }

  /** DuckDB replay: same shingle hash (signed first-64-md5-bits, the
    * [[graft.ops.Dedup]] hex-parse form), same bottom-k, same two-op
    * fraction map and divisions. */
  val qKmvDistinctSql: String = {
    val g = "array_to_string(w[i:i+2], ' ')"
    val h64 =
      s"""(('0x' || substr(md5($g), 1, 8))::BIGINT
         |  - CASE WHEN ('0x' || substr(md5($g), 1, 8))::BIGINT >= 2147483648
         |         THEN 4294967296 ELSE 0 END) * 4294967296
         |+ ('0x' || substr(md5($g), 9, 8))::BIGINT""".stripMargin
    def est(n: String, hk: String) =
      s"""CASE WHEN $n < $KmvK THEN CAST($n AS DOUBLE)
         |  ELSE CAST(${KmvK - 1} AS DOUBLE) /
         |    ((CAST($hk AS DOUBLE) + CAST(9223372036854775808 AS DOUBLE))
         |      / CAST(18446744073709551616 AS DOUBLE)) END""".stripMargin
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL),
       |sh AS (
       |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS part,
       |    $h64 AS h
       |  FROM words, unnest(range(1, len(w) - 1)) t(i)
       |  WHERE len(w) >= 3),
       |dh AS (SELECT DISTINCT part, h FROM sh),
       |sk AS (SELECT part, h FROM (
       |    SELECT part, h, ROW_NUMBER() OVER (PARTITION BY part ORDER BY h) rn
       |    FROM dh) WHERE rn <= $KmvK),
       |pstat AS (SELECT part, COUNT(*) AS n_exact FROM dh GROUP BY part),
       |skstat AS (SELECT part, COUNT(*) AS sketch_n, MAX(h) AS hk
       |           FROM sk GROUP BY part),
       |uh AS (SELECT DISTINCT h FROM dh),
       |sku AS (SELECT h FROM (
       |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn FROM uh)
       |  WHERE rn <= $KmvK),
       |uflag AS (
       |  SELECT s.h, a.h IS NOT NULL AS ina, b.h IS NOT NULL AS inb
       |  FROM sku s
       |  LEFT JOIN (SELECT h FROM dh WHERE part = 'a') a ON a.h = s.h
       |  LEFT JOIN (SELECT h FROM dh WHERE part = 'b') b ON b.h = s.h),
       |ustat AS (SELECT COUNT(*) AS sketch_n, MAX(h) AS hk,
       |    SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS n_inter
       |  FROM uflag),
       |uex AS (SELECT COUNT(*) AS n_exact FROM uh),
       |uinter AS (SELECT COUNT(*) AS n_int_exact FROM (
       |    SELECT h FROM dh GROUP BY h HAVING COUNT(*) = 2))
       |SELECT p.part, p.n_exact, s.sketch_n,
       |  ${est("s.sketch_n", "s.hk")} AS est,
       |  CAST(NULL AS DOUBLE) AS jacc_est, CAST(NULL AS DOUBLE) AS jacc_exact
       |FROM pstat p JOIN skstat s USING (part)
       |UNION ALL
       |SELECT 'union', uex.n_exact, u.sketch_n,
       |  ${est("u.sketch_n", "u.hk")},
       |  CAST(u.n_inter AS DOUBLE) / u.sketch_n,
       |  CAST(uinter.n_int_exact AS DOUBLE) / uex.n_exact
       |FROM ustat u, uex, uinter
       |ORDER BY part""".stripMargin
  }

  // ------------------------------------------------------- Count-Min

  private val CmsD = 4   // hash rows
  private val CmsW = 512 // buckets per row

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    * stream, audited against exact counts: d=4 md5-derived hash rows
    * × w=512 counters; a point estimate is the MIN over rows of the
    * addressed counters, never an undercount, over by at most the
    * collision mass (≤ 2N/w per row w.h.p.). The output probes the
    * exact top-15 tokens and reports estimate vs truth — the
    * error-audit a pipeline runs before trusting CMS counters for
    * filtering decisions.
    *
    * Determinism: bucket addresses are md5-derived integers and every
    * counter an integer sum — the DuckDB oracle replays sketch BUILD
    * and PROBE bit-for-bit (same oracle-floor story as [[qKmvDistinct]]).
    *
    * Scale posture: token counts first collapse to one row per
    * distinct word (map-side-partial agg — the sketch never sees the
    * raw stream twice), then vocab×d cell contributions sum into a
    * d×w=2048-cell table that is CONSTANT-SIZE in the corpus; probes
    * broadcast-join the cell table. */
  def qCmsFreq(s: SparkSession, dir: String): DataFrame = {
    def bucket(j: Int, c: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(c, lit(s"#c$j"))), 1, 4), 16, 10)
        .cast(LongType) % CmsW
    def cellsOf(c: org.apache.spark.sql.Column) = array((1 to CmsD).map(j =>
      struct(lit(j).as("j"), bucket(j, c).as("b"))): _*)
    val counts = Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // reused: sketch build + probe selection
    val cells = counts
      .select(col("n"), explode(cellsOf(col("word"))).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(sum("n").as("cell"))
    counts.orderBy(desc("n"), col("word")).limit(15)
      .select(col("word"), col("n"), explode(cellsOf(col("word"))).as("jb"))
      .join(cells, col("jb.j") === cells("j") && col("jb.b") === cells("b"))
      .groupBy("word")
      .agg(max("n").as("n_exact"), min("cell").as("n_est"))
      .select(col("word"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
      .orderBy(desc("n_exact"), col("word"))
  }

  val qCmsFreqSql: String = {
    def bucket(j: Int, c: String) =
      s"('0x' || substr(md5($c || '#c$j'), 1, 4))::BIGINT % $CmsW"
    val buildRows = (1 to CmsD).map(j =>
      s"SELECT $j AS j, ${bucket(j, "word")} AS b, n FROM counts")
      .mkString("\n  UNION ALL ")
    val probeRows = (1 to CmsD).map(j =>
      s"SELECT word, n, $j AS j, ${bucket(j, "word")} AS b FROM probes")
      .mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
       |  WHERE text IS NOT NULL),
       |counts AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
       |cells AS (
       |  SELECT j, b, CAST(SUM(n) AS BIGINT) AS cell FROM (
       |  $buildRows) GROUP BY j, b),
       |probes AS (
       |  SELECT word, n FROM counts ORDER BY n DESC, word LIMIT 15),
       |pj AS (
       |  $probeRows)
       |SELECT p.word, CAST(MAX(p.n) AS BIGINT) AS n_exact,
       |  CAST(MIN(c.cell) AS BIGINT) AS n_est,
       |  CAST(MIN(c.cell) - MAX(p.n) AS BIGINT) AS overcount
       |FROM pj p JOIN cells c ON c.j = p.j AND c.b = p.b
       |GROUP BY p.word
       |ORDER BY n_exact DESC, word""".stripMargin
  }

  val qHeavyHittersSql: String = """
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM w)
    SELECT word, COUNT(*) AS n, (SELECT n_total FROM tot) AS n_total
    FROM w GROUP BY word
    HAVING COUNT(*) >= CEIL(0.01 * (SELECT n_total FROM tot))
    ORDER BY n DESC, word
  """.trim

  // ---- join-size estimation by correlated key sampling -----------------

  /** Join-cardinality estimation BEFORE executing the join — the
    * plan-a-100-TB-shuffle-or-broadcast question, answered from a key
    * sample (correlated sampling, Vengerov et al., VLDB 2015): both
    * sides keep only keys whose md5 leading nibble ∈ {0,1} (the
    * engine's standard partitioning-invariant hash gate, rate 1/8 —
    * CORRELATED because both sides sample the same key subset, which
    * is what makes Σ f_A·f_B unbiased where independent row samples
    * square the rate), then |A ⋈ B| ≈ 8·Σ_sampled f_A(v)·f_B(v).
    * The output row audits the estimate against the true join count
    * with an integer basis-point error — the cms_freq convention:
    * sketches ship with their error measured, not assumed.
    *
    * Scale shape: each side is ONE scan with the hash gate applied
    * before the per-key aggregation, so only the 1/8 key sample
    * shuffles; the estimator join touches sampled keys only. The
    * audit side runs the real join — at 100 TB a deployment would
    * skip it (it IS the thing being estimated); here it is the
    * oracle-checked ground truth. All arithmetic integer (counts,
    * ×8, floor-div basis points) — exact replay. */
  def qJoinSizeEst(s: SparkSession, dir: String): DataFrame = {
    def gate(k: org.apache.spark.sql.Column) =
      substring(md5(k.cast(StringType)), 1, 1).isin("0", "1")
    val fa = Tables(s, dir, "orders")
      .filter(gate(col("o_orderkey")))
      .groupBy(col("o_orderkey").as("key")).agg(count(lit(1)).as("fa"))
    val fb = Tables(s, dir, "lineitem")
      .filter(gate(col("l_orderkey")))
      .groupBy(col("l_orderkey").as("key")).agg(count(lit(1)).as("fb"))
    // DECIMAL(38,0) accumulation (the drift_detect convention): a few
    // hot keys with fa ~ fb ~ 2^32 would silently wrap a Long product,
    // and the DuckDB replay sums in int128 — the decimal sum keeps the
    // engines in agreement at any skew; the final BIGINT cast mirrors
    // the oracle's
    val samp = fa.join(fb, "key")
      .agg(count(lit(1)).as("n_sampled_keys"),
        (sum(col("fa").cast(DecimalType(38, 0)) * col("fb")) * 8)
          .cast(LongType).as("est_rows"))
    val exact = Tables(s, dir, "orders")
      .join(Tables(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("exact_rows"))
    // two single-row aggregates merged by union+max (a constant-key
    // join would constant-fold into a nested-loop cross)
    val nl = lit(null).cast(LongType)
    samp.select(col("n_sampled_keys"), col("est_rows"), nl.as("exact_rows"))
      .unionAll(exact.select(nl.as("n_sampled_keys"), nl.as("est_rows"),
        col("exact_rows")))
      .agg(max("n_sampled_keys").as("n_sampled_keys"),
        max("est_rows").as("est_rows"), max("exact_rows").as("exact_rows"))
      .select(col("n_sampled_keys"), col("est_rows"), col("exact_rows"),
        expr("abs(est_rows - exact_rows) * 10000 DIV exact_rows")
          .as("err_bp"))
  }

  val qJoinSizeEstSql: String = """
    WITH fa AS (
      SELECT o_orderkey AS key, COUNT(*) AS fa FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
      GROUP BY 1),
    fb AS (
      SELECT l_orderkey AS key, COUNT(*) AS fb FROM lineitem
      WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
      GROUP BY 1),
    samp AS (
      SELECT COUNT(*) AS n_sampled_keys,
        CAST(SUM(fa * fb) * 8 AS BIGINT) AS est_rows
      FROM fa JOIN fb USING (key)),
    ex AS (
      SELECT COUNT(*) AS exact_rows
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
    SELECT n_sampled_keys, est_rows, exact_rows,
      CAST(ABS(est_rows - exact_rows) * 10000 // exact_rows AS BIGINT)
        AS err_bp
    FROM samp, ex
  """.trim
}
