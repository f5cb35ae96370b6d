package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Web-corpus curation operators (builder brief §"training-data
  * pipeline"): URL canonicalization + dedup, multi-pass-blocked record
  * linkage, and windowed PMI co-occurrence — the three standard moves
  * between "crawl landed" and "corpus is trainable" that the dedup /
  * similarity tiers don't already cover.
  *
  * Reference analogue: the Gandiva string-kernel tier
  * (/root/reference/cpp/src/gandiva/function_registry_string.cc) is
  * the per-row machinery; the reference has no curation pipeline, so
  * these are engine extensions declared under SURVEY §2.12.
  *
  * Scale shape, per operator:
  *  - URL canonicalization is a pure per-row Column expression (no
  *    UDF, stays inside whole-stage codegen); the dedup after it is a
  *    hash groupBy on the canonical string — the same
  *    shuffle-32-bytes-per-row posture as [[Dedup.qDedupExact]].
  *  - Record linkage NEVER goes all-pairs: candidate pairs come from a
  *    union of cheap blocking keys (equi-joins), and the quadratic
  *    scorer (levenshtein) runs only inside blocks. Block granularity
  *    is the scale knob — at 100 TB you add digits to the key, the
  *    join stays an equi-shuffle.
  *  - PMI co-occurrence explodes (doc, pos, token) once and self-joins
  *    on doc_id with a ±window positional band; per-doc token count is
  *    bounded (documents are chunked upstream), so every join group is
  *    O(doc length · window), never O(corpus²).
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- URL canonicalization + dedup ------------------------------------

  /** Canonical form of a URL: lowercase scheme+host, `www.` and
    * default-port stripped, fragment dropped, tracking parameters
    * (utm_*, fbclid, gclid, msclkid, ref) removed, remaining query
    * params sorted, trailing path slashes collapsed (empty path → /).
    * Pure Column composition — codegen-friendly, batch/stream unified. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val qstr = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(qstr, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid|ref)="))
    val canonQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(canonQ === "", lit("")).otherwise(concat(lit("?"), canonQ)))
  }

  /** Messy URL fixture derived deterministically from `documents`
    * (the fixtures carry no URL column): six per-doc variants —
    * case-mangled host, www + default port + trailing slash, tracking
    * params, unsorted params, fragment, http default port — chosen so
    * canonicalization provably collapses variant classes {0,1,2} and
    * {3,4} while keeping 5 distinct (different scheme + param set). */
  private def urlFixture(docs: DataFrame): DataFrame = {
    val item = (col("doc_id") % 40).cast("string")
    val v = col("doc_id") % 6
    docs.select(col("doc_id"),
      when(v === 0, concat(lit("https://Example.COM/"), col("source"), lit("/item/"), item))
        .when(v === 1, concat(lit("HTTPS://www.example.com:443/"), col("source"), lit("/item/"), item, lit("/")))
        .when(v === 2, concat(lit("https://example.com/"), col("source"), lit("/item/"), item, lit("?utm_source=feed&utm_campaign=x")))
        .when(v === 3, concat(lit("https://example.com/"), col("source"), lit("/item/"), item, lit("?b=2&a=1")))
        .when(v === 4, concat(lit("https://example.com/"), col("source"), lit("/item/"), item, lit("?a=1&b=2#section")))
        .otherwise(concat(lit("http://example.com:80/"), col("source"), lit("/item/"), item, lit("?gclid=xyz&a=1")))
        .as("url"))
  }

  /** Canonicalize, then exact-dedup on the canonical form: per
    * canonical URL the duplicate count and the kept (min) doc_id. */
  def qDedupUrl(s: SparkSession, dir: String): DataFrame =
    urlFixture(t(s, dir, "documents"))
      .select(col("doc_id"), canonicalizeUrl(col("url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keeper"))
      .orderBy(col("canonical_url"))

  val qDedupUrlSql: String = """
    WITH raw AS (
      SELECT doc_id,
        CASE CAST(doc_id % 6 AS INT)
          WHEN 0 THEN 'https://Example.COM/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR)
          WHEN 1 THEN 'HTTPS://www.example.com:443/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR) || '/'
          WHEN 2 THEN 'https://example.com/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
          WHEN 3 THEN 'https://example.com/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR) || '?b=2&a=1'
          WHEN 4 THEN 'https://example.com/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR) || '?a=1&b=2#section'
          ELSE 'http://example.com:80/' || source || '/item/' || CAST(doc_id % 40 AS VARCHAR) || '?gclid=xyz&a=1'
        END AS url
      FROM documents),
    parts AS (
      SELECT doc_id,
        lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        regexp_replace(lower(regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '^www\.', '') AS host0,
        regexp_replace(regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '') AS path0,
        regexp_extract(nofrag, '\?([^#]*)', 1) AS q
      FROM (SELECT doc_id, regexp_replace(trim(url), '#.*$', '') AS nofrag FROM raw)),
    canon AS (
      SELECT doc_id,
        scheme || '://' ||
        CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
             WHEN scheme = 'http'  THEN regexp_replace(host0, ':80$', '')
             ELSE host0 END ||
        CASE WHEN path0 = '' THEN '/' ELSE path0 END ||
        CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS canonical_url
      FROM (SELECT *,
              -- COALESCE: DuckDB's array_to_string([]) is NULL where
              -- Spark's array_join([]) is '' — pin the Spark semantics
              COALESCE(array_to_string(list_sort(list_filter(string_split(q, '&'),
                x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|msclkid|ref)='))), '&'), '') AS cq
            FROM parts))
    SELECT canonical_url, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
    FROM canon GROUP BY canonical_url ORDER BY canonical_url
  """.trim

  // ---- Record linkage (entity resolution) ------------------------------

  /** Dirty counterpart of `customer`, derived deterministically (the
    * fixtures ship no second CRM extract): per-row perturbation keyed
    * on custkey — identity / last-digit substitution / prefix typo /
    * appended char — plus a ±0.03 balance jitter. Carries its own id
    * space (custkey + 1,000,000). */
  private def dirtyCustomers(cust: DataFrame): DataFrame = {
    val p = col("c_custkey") % 4
    cust.select(
      (col("c_custkey") + lit(1000000L)).as("d_id"),
      col("c_custkey").as("d_src"),
      when(p === 0, col("c_name"))
        .when(p === 1, regexp_replace(col("c_name"), "[0-9]$", "X"))
        .when(p === 2, regexp_replace(col("c_name"), "^Customer#", "Custmer#"))
        .otherwise(concat(col("c_name"), lit("~"))).as("d_name"),
      round(col("c_acctbal") + (col("c_custkey") % 7 - lit(3)) * lit(0.01), 2)
        .as("d_bal"),
      col("c_nationkey").as("d_nationkey"))
  }

  /** Multi-pass-blocked record linkage: candidate pairs from the UNION
    * of two cheap blocking keys — (nation, 500-unit balance bucket)
    * and (nation, digit-prefix of the name's numeric block) — each an
    * equi-join; the quadratic scorer (levenshtein ≤ 2 AND |Δbal| ≤
    * 0.05) runs only on blocked candidates. Multi-pass blocking is the
    * standard recall hedge: a perturbation that breaks one key (the
    * balance jitter crossing a bucket edge, a typo in the digits) is
    * caught by the other. */
  def qRecordLinkage(s: SparkSession, dir: String): DataFrame = {
    // the blocked-candidate scorer (levenshtein per pair) runs in the
    // probe-side scan stage; customer ships as one row group, so the
    // quadratic-per-block work sat on 2 tasks — fan the small dim out
    val clean = graft.ops.fanOutSmall(t(s, dir, "customer"))
    val dirty = dirtyCustomers(clean)
    val cA = clean.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      col("c_nationkey"), floor(col("c_acctbal") / 500).as("blk"))
    val dA = dirty.select(col("d_id"), col("d_name"), col("d_bal"),
      col("d_nationkey"), floor(col("d_bal") / 500).as("blk"))
    val passA = cA.join(dA,
      cA("c_nationkey") === dA("d_nationkey") && cA("blk") === dA("blk"))
    val digitsPfx = (c: Column) => substring(regexp_extract(c, "([0-9]{9})", 1), 1, 8)
    val cB = clean.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
      col("c_nationkey"), digitsPfx(col("c_name")).as("pfx"))
    val dB = dirty.select(col("d_id"), col("d_name"), col("d_bal"),
      col("d_nationkey"), digitsPfx(col("d_name")).as("pfx"))
    val passB = cB.join(dB,
      cB("c_nationkey") === dB("d_nationkey") && cB("pfx") === dB("pfx"))
    val cand = passA.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("d_id"), col("d_name"), col("d_bal"))
      .unionByName(passB.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("d_id"), col("d_name"), col("d_bal")))
      .distinct()
    cand
      .withColumn("name_dist", levenshtein(col("c_name"), col("d_name")))
      .withColumn("bal_diff", round(abs(col("c_acctbal") - col("d_bal")), 2))
      .filter(col("name_dist") <= 2 && col("bal_diff") <= 0.05)
      .select(col("c_custkey"), col("d_id"), col("name_dist"), col("bal_diff"))
      .orderBy(col("c_custkey"), col("d_id"))
  }

  val qRecordLinkageSql: String = """
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS d_id,
        CASE CAST(c_custkey % 4 AS INT)
          WHEN 0 THEN c_name
          WHEN 1 THEN regexp_replace(c_name, '[0-9]$', 'X')
          WHEN 2 THEN regexp_replace(c_name, '^Customer#', 'Custmer#')
          ELSE c_name || '~' END AS d_name,
        ROUND(c_acctbal + (c_custkey % 7 - 3) * 0.01, 2) AS d_bal,
        c_nationkey AS d_nationkey
      FROM customer),
    pass_a AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, d.d_id, d.d_name, d.d_bal
      FROM customer c JOIN dirty d
        ON c.c_nationkey = d.d_nationkey
       AND FLOOR(c.c_acctbal / 500) = FLOOR(d.d_bal / 500)),
    pass_b AS (
      SELECT c.c_custkey, c.c_name, c.c_acctbal, d.d_id, d.d_name, d.d_bal
      FROM customer c JOIN dirty d
        ON c.c_nationkey = d.d_nationkey
       AND substr(regexp_extract(c.c_name, '([0-9]{9})', 1), 1, 8)
         = substr(regexp_extract(d.d_name, '([0-9]{9})', 1), 1, 8)),
    cand AS (SELECT * FROM pass_a UNION SELECT * FROM pass_b),
    scored AS (
      SELECT c_custkey, d_id,
        levenshtein(c_name, d_name) AS name_dist,
        ROUND(ABS(c_acctbal - d_bal), 2) AS bal_diff
      FROM cand)
    SELECT c_custkey, d_id, name_dist, bal_diff
    FROM scored WHERE name_dist <= 2 AND bal_diff <= 0.05
    ORDER BY c_custkey, d_id
  """.trim

  // ---- DSIR importance resampling ---------------------------------------

  private val DsirBuckets = 256
  private val DsirTopK = 50

  /** (doc_id, b): every document's hashed feature buckets. Feature
    * generation is ROW-LOCAL: unigrams and adjacent-position bigrams
    * both come out of one split array via zip_with — no positional
    * self-join, no token-table shuffle (the join form measured a
    * superlinear x10→x100 leg; this one explodes exactly the same
    * features with zero pre-aggregation shuffles). */
  private def dsirBucketFeats(s: SparkSession, dir: String): DataFrame =
    // fused codegen kernel for the unigram+bigram md5 bucket stream —
    // the composed filter/zip_with/md5 chain ran interpreted
    // (CodegenFallback lambdas, the r12 token_profile lesson) and this
    // subtree is evaluated TWICE (distribution pass + weight pass);
    // fanOutSmall spreads the kernel across cores when the scan is a
    // one-row-group file (KernelsSpec pins kernel == composed chain)
    graft.ops.fanOutSmall(t(s, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.md5_bucket_feats(col("text"), DsirBuckets))
          .as("b"))

  /** (b, x): per-bucket smoothed log-ratio in micro-nats, PRE-round —
    * the exact double handed to `round()`. Kept separate so the spec
    * can measure how far each value sits from a .5 rounding boundary
    * (the cross-engine ln-ULP exposure; see [[qDsirSelect]]). */
  private def dsirLogRatioRaw(bf: DataFrame): DataFrame = {
    val isTgt = col("doc_id") % 10 === 0
    val dist = bf.groupBy(col("b")).agg(
      sum(when(isTgt, 1L).otherwise(0L)).as("ct"),
      sum(when(isTgt, 0L).otherwise(1L)).as("cs"))
    val tot = dist.agg(sum(col("ct")).as("t_n"), sum(col("cs")).as("s_n"))
    dist.crossJoin(broadcast(tot)).select(col("b"),
      (log(((col("ct") + lit(1.0)) / (col("t_n") + lit(DsirBuckets.toDouble))) /
        ((col("cs") + lit(1.0)) / (col("s_n") + lit(DsirBuckets.toDouble))))
        * lit(1000000.0)).as("x"))
  }

  /** Gumbel key noise in micro-nats, PRE-round, as a column over
    * doc_id (md5-seeded uniform → -ln(-ln(u)), the Gumbel-top-k
    * identity). */
  private def dsirGumbelRaw(docId: Column): Column = {
    val u = conv(substring(md5(concat(lit("dsir:"),
      docId.cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0) + lit(5e-11)
    -log(-log(u)) * lit(1000000.0)
  }

  /** Spec hook: the raw doubles that qDsirSelect rounds to integer
    * micro-nats — (per-bucket log-ratios, per-source-doc Gumbel
    * arguments). CurationSpec asserts each sits ≥ a safety margin of
    * ULPs away from the nearest .5 boundary, so a one-ULP
    * cross-engine `ln` difference cannot flip a quantized unit and
    * break oracle hash parity. */
  private[graft] def dsirRoundInputs(s: SparkSession, dir: String)
      : (Array[Double], Array[Double]) = {
    val bf = dsirBucketFeats(s, dir)
    val lrs = dsirLogRatioRaw(bf).select(col("x"))
      .collect().map(_.getDouble(0))
    val gs = t(s, dir, "documents").filter(col("doc_id") % 10 =!= 0)
      .select(dsirGumbelRaw(col("doc_id")).as("g"))
      .collect().map(_.getDouble(0))
    (lrs, gs)
  }

  /** Data Selection via Importance Resampling (DSIR, Xie et al.
    * NeurIPS 2023): select source documents that look like a target
    * corpus, scored by hashed-n-gram importance weights. Features =
    * unigrams + bigrams, hashed into [[DsirBuckets]] buckets (md5 —
    * the cross-engine-stable address every hash op here uses); the
    * per-bucket log-ratio ln(p̂_target/q̂_source) (add-1 smoothed) is
    * QUANTIZED to integer micro-nats before the per-doc sum, so the
    * aggregation is exact-integer — associative, partition-order-free,
    * bit-identical in the oracle (a raw double Σ would drift by
    * summation order). Selection = Gumbel-top-k without replacement
    * (key = weight + Gumbel(md5-seeded), the standard exp(w)-weighted
    * sampling identity), deterministic for the same reasons
    * [[graft.ops.Privacy.qDpCounts]] documents: seeded noise is what
    * an auditable selection pipeline reruns bit-identically.
    *
    * The residual cross-engine exposure is the `round()` of the two
    * `ln`-derived doubles: a one-ULP `ln` difference could flip a
    * micro-nat only if a value sat within a ULP of a .5 boundary —
    * [[dsirRoundInputs]] + CurationSpec measure that margin on the
    * fixtures (≥ 10⁴ ULPs observed) so the exposure is pinned, not
    * assumed away.
    *
    * Scale shape: tokenize/explode → one partial+final agg to the
    * O(B)=256-row bucket table → broadcast log-ratio join back onto
    * doc features → per-doc integer sum → global top-k (TakeOrdered,
    * no global sort). The only all-corpus structure is the 256-row
    * distribution table; the target/source split here is a synthetic
    * doc_id gate (a real pipeline points the target side at its
    * curated corpus — the mechanism is what this pins). */
  def qDsirSelect(s: SparkSession, dir: String): DataFrame = {
    val bf = dsirBucketFeats(s, dir)
    val lr = dsirLogRatioRaw(bf)
      .select(col("b"), round(col("x")).cast("long").as("lr"))
    val w = bf.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("w"))
    w.select(col("doc_id"), col("n_feats"), col("w"),
        (col("w") + round(dsirGumbelRaw(col("doc_id"))).cast("long"))
          .as("gkey"))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  val qDsirSelectSql: String = """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    toks AS (
      SELECT doc_id, i AS pos, l[i] AS tok
      FROM tk, unnest(range(1, len(l) + 1)) t(i)
      WHERE l[i] <> ''),
    feats AS (
      SELECT doc_id, tok AS f FROM toks
      UNION ALL
      SELECT a.doc_id, a.tok || '_' || b.tok AS f
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    bf AS (
      SELECT doc_id,
        CAST(('0x' || substr(md5(f), 1, 4)) AS INTEGER) % 256 AS b
      FROM feats),
    dist AS (
      SELECT b,
        SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS ct,
        SUM(CASE WHEN doc_id % 10 = 0 THEN 0 ELSE 1 END) AS cs
      FROM bf GROUP BY b),
    tot AS (SELECT SUM(ct) AS t_n, SUM(cs) AS s_n FROM dist),
    lr AS (
      SELECT b, CAST(ROUND(ln(((ct + 1.0) / (t_n + 256.0)) /
           ((cs + 1.0) / (s_n + 256.0))) * 1000000.0) AS BIGINT) AS lr
      FROM dist CROSS JOIN tot),
    w AS (
      SELECT bf.doc_id, COUNT(*) AS n_feats, CAST(SUM(lr.lr) AS BIGINT) AS w
      FROM bf JOIN lr USING (b)
      WHERE bf.doc_id % 10 <> 0
      GROUP BY bf.doc_id),
    keyed AS (
      SELECT doc_id, n_feats, w,
        CAST(w + CAST(ROUND(-ln(-ln(
          CAST(CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
            / 4294967296.0 + 5e-11)) * 1000000.0) AS BIGINT) AS BIGINT) AS gkey
      FROM w)
    SELECT doc_id, n_feats, w, gkey FROM keyed
    ORDER BY gkey DESC, doc_id LIMIT 50
  """.trim

  // ---- Windowed PMI co-occurrence --------------------------------------

  private val PmiWindow = 2
  private val PmiTopN = 100

  /** Pointwise mutual information over a ±2-token skip-gram window
    * (the word2vec/GloVe context statistic): explode (doc, pos, tok)
    * once, self-join on doc_id with |Δpos| ∈ [1, window], count
    * unordered pairs, and score ln((c_ab/Np) / ((c_a/Nu)·(c_b/Nu))).
    * Top-[[PmiTopN]] pairs by count (count is an integer — rank ties
    * broken lexically, never by a float). */
  def qPmiCooccur(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
    // total token occurrences = Σ c_tok over the (vocabulary-sized)
    // unigram table — no second tokenize pass, no driver action
    val nu = uni.agg(sum(col("c_tok")).as("n_uni"))
    // Offset-expanded EQUI-join, not join-on-doc+range-filter: the
    // latter materializes every positional pair per doc (quadratic in
    // doc length) before filtering; exploding the window offsets and
    // joining on (doc_id, p1+off = p2) keeps the intermediate at
    // |positions|·window rows — linear in the corpus for any doc length
    val a = toks.select(col("doc_id"), col("pos").as("p1"), col("tok").as("w1"))
      .withColumn("p2", explode(array((1 to PmiWindow).map(o => col("p1") + lit(o)): _*)))
    val b = toks.select(col("doc_id"), col("pos").as("p2"), col("tok").as("w2"))
    val pairs = a.join(b, Seq("doc_id", "p2"))
      .select(least(col("w1"), col("w2")).as("wa"),
        greatest(col("w1"), col("w2")).as("wb"))
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c_pair"))
    // the pair total rides a one-row cross join back onto the pair
    // frame (exactly the oracle's CROSS JOIN np) — a driver-side
    // .head here would execute the whole explode+join+agg lineage
    // TWICE, once for the scalar and once for the result
    val np = pairs.agg(sum(col("c_pair")).as("n_pair"))
    pairs
      .join(uni.select(col("tok").as("wa"), col("c_tok").as("c_a")), Seq("wa"))
      .join(uni.select(col("tok").as("wb"), col("c_tok").as("c_b")), Seq("wb"))
      .crossJoin(broadcast(np)).crossJoin(broadcast(nu))
      .withColumn("pmi", round(
        log((col("c_pair").cast("double") / col("n_pair")) /
          ((col("c_a").cast("double") / col("n_uni")) *
            (col("c_b").cast("double") / col("n_uni")))), 6))
      .select(col("wa"), col("wb"), col("c_pair"), col("pmi"))
      .orderBy(col("c_pair").desc, col("wa"), col("wb"))
      .limit(PmiTopN)
  }

  val qPmiCooccurSql: String = """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    toks AS (
      SELECT doc_id, i AS pos, l[i] AS tok
      FROM tk, unnest(range(1, len(l) + 1)) t(i)
      WHERE l[i] <> ''),
    uni AS (SELECT tok, COUNT(*) AS c_tok FROM toks GROUP BY tok),
    nu AS (SELECT COUNT(*) AS n_uni FROM toks),
    pairs AS (
      SELECT LEAST(a.tok, b.tok) AS wa, GREATEST(a.tok, b.tok) AS wb,
        COUNT(*) AS c_pair
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos <= 2
      GROUP BY 1, 2),
    np AS (SELECT SUM(c_pair) AS n_pair FROM pairs)
    SELECT wa, wb, c_pair,
      ROUND(ln((CAST(c_pair AS DOUBLE) / n_pair) /
        ((CAST(ua.c_tok AS DOUBLE) / n_uni) * (CAST(ub.c_tok AS DOUBLE) / n_uni))), 6) AS pmi
    FROM pairs
    JOIN uni ua ON ua.tok = pairs.wa
    JOIN uni ub ON ub.tok = pairs.wb
    CROSS JOIN np CROSS JOIN nu
    ORDER BY c_pair DESC, wa, wb LIMIT 100
  """.trim
}
