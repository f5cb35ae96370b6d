package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.{functions => gf}

/** Text-analysis tier for LLM training-data pipelines (builder brief;
  * SURVEY §7.6 milestone 4): token/char statistics, quality scoring,
  * n-gram-heuristic language ID, and content fingerprinting over the
  * `documents` fixture.
  *
  * Everything is `functions._` composition — per-row expressions stay
  * inside whole-stage codegen, aggregates are partial+final with exact
  * decimal sums (order-independent at any partition count), so each
  * query is a single scan + at most one shuffle at 100 TB.
  */
object TextAnalysis {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def toks(c: Column): Column = split(c, " ")

  /** Per-document char/token/unique-token counts, plus a BPE-ish
    * subword count: alternating vowel-split segments approximate a
    * byte-pair vocabulary's tendency to break words at vowel
    * boundaries — a cheap, deterministic token-budget estimator. */
  def qTextStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("lang"),
        length(col("text")).as("n_chars_calc"),
        size(toks(col("text"))).as("n_tokens"),
        size(array_distinct(toks(col("text")))).as("n_uniq"),
        size(regexp_extract_all(col("text"), lit("[^aeiou\\s]+[aeiou]*|[aeiou]+"), lit(0)))
          .as("n_subtok"))
      .orderBy("doc_id")

  val qTextStatsSql: String = """
    SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars_calc,
      CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
      CAST(len(regexp_extract_all(text, '[^aeiou\s]+[aeiou]*|[aeiou]+')) AS INT) AS n_subtok
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
  """.trim

  private val stopwords = Seq("the", "a", "of", "and")

  /** Per-language quality rollup: stopword ratio + mean token length.
    * Ratios are exact int/int doubles per row; the cross-row mean goes
    * through decimal sums (ops.dsum convention) so the answer is
    * independent of partitioning. */
  def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    // fused codegen kernel, not size(filter(split(...), λ)): HOF
    // lambdas are CodegenFallback, which evicts the whole projection
    // from whole-stage codegen (PlanLintSpec pins the span)
    val p = graft.functions.token_profile(col("text"), stopwords.mkString(" "))
    val nTok = p.getField("n_tok")
    val nStop = p.getField("n_stop")
    val meanTokLen =
      (length(col("text")) - (nTok - 1)).cast(DoubleType) / nTok
    t(s, dir, "documents")
      .select(col("lang"),
        (nStop.cast(DoubleType) / nTok).as("stop_ratio"),
        meanTokLen.as("mean_tok_len"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("stop_ratio").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("avg_stop_ratio"),
        (sum(col("mean_tok_len").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("avg_tok_len"))
      .orderBy("lang")
  }

  val qTextQualitySql: String = """
    WITH d AS (
      SELECT lang, len(string_split(text, ' ')) AS n_tok,
        len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and'))) AS n_stop,
        length(text) AS n_ch
      FROM documents
    ), sc AS (
      SELECT lang,
        CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
        CAST(n_ch - (n_tok - 1) AS DOUBLE) / n_tok AS mean_tok_len
      FROM d
    )
    SELECT lang, COUNT(*) AS n_docs,
      CAST(SUM(CAST(stop_ratio AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_stop_ratio,
      CAST(SUM(CAST(mean_tok_len AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_tok_len
    FROM sc GROUP BY lang ORDER BY lang
  """.trim

  /** Function-word-heuristic language ID (the classic n-gram/stopword
    * profile approach, degenerated to two profiles since the synthetic
    * corpus shares one vocabulary). Deterministic, so oracle-checkable
    * — the point is the operator shape, not the linguistics. */
  def qLangId(s: SparkSession, dir: String): DataFrame = {
    val en = graft.functions.token_profile(col("text"), "the a")
      .getField("n_stop")
    val es = graft.functions.token_profile(col("text"), "el la de")
      .getField("n_stop")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), en.as("en_hits"), es.as("es_hits"))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("es_hits") && col("en_hits") > 0, "en")
          .when(col("es_hits") > 0, "es")
          .otherwise("unk"))
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("lang"), col("lang_guess"), col("en_hits"))
      .orderBy("doc_id")
  }

  val qLangIdSql: String = """
    WITH h AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text, ' '), t -> t IN ('the','a'))) AS en_hits,
        len(list_filter(string_split(text, ' '), t -> t IN ('el','la','de'))) AS es_hits
      FROM documents
    )
    SELECT doc_id, lang,
      CASE WHEN en_hits >= es_hits AND en_hits > 0 THEN 'en'
           WHEN es_hits > 0 THEN 'es' ELSE 'unk' END AS lang_guess,
      CAST(en_hits AS INT) AS en_hits
    FROM h WHERE doc_id < 100 ORDER BY doc_id
  """.trim

  /** Content fingerprints: whole-document md5 (exact-dedup key) and a
    * first-5-tokens prefix fingerprint (cheap locality signal). */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        md5(lower(col("text"))).as("fp"),
        md5(concat_ws(" ", slice(toks(col("text")), 1, 5))).as("prefix_fp"))
      .orderBy("doc_id")

  val qTextFingerprintSql: String = """
    SELECT doc_id, md5(lower(text)) AS fp,
      md5(array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')) AS prefix_fp
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
  """.trim

  /** Corpus TF-IDF: top-3 highest-scoring terms per document (docs
    * 0-49 reported; document frequency computed over the WHOLE
    * corpus). Score = tf · N / df — the raw-inverse-frequency variant
    * of idf, chosen deliberately over log-idf: all three inputs are
    * exact small integers, so the single double division is
    * IEEE-correctly-rounded and therefore BIT-IDENTICAL in any
    * conforming engine, where a transcendental log could differ by an
    * ulp between libm implementations and flip a ranking.
    *
    * Scale shape: explode → two partial+final aggs (tf, then df) →
    * broadcast-sized df side joined back on term → per-doc window
    * top-k. The only all-corpus structure is the term→df map, which
    * is vocabulary-sized, not corpus-sized. */
  def qTfidfTop(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nDocs = docs.count()
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .filter(col("doc_id") < 50)
      .withColumn("score", (col("tf") * lit(nDocs)) / col("df"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rn")
  }

  val qTfidfTopSql: String = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df, (tf * n) / df AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      WHERE doc_id < 50),
    r AS (SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn FROM scored)
    SELECT doc_id, rn, term, tf, df, score
    FROM r WHERE rn <= 3 ORDER BY doc_id, rn
  """.trim

  /** Chunking geometry: 120-char chunks overlapping by 20 (stride 100). */
  private[graft] val (chunkLen, chunkStride) = (120, 100)

  /** Overlapping fixed-size document chunking — the preprocessing step
    * that turns long documents into trainable/retrievable windows.
    * Chunk count per doc is pure INTEGER arithmetic
    * (ceil-div via (x + stride-1) div stride), the offsets explode
    * from a sequence, and each chunk is a 1-based substring — all
    * exactly reproducible in the oracle. Emits length + fingerprint
    * per chunk, not the text, keeping result rows narrow.
    *
    * Scale shape: one scan, a generator (no shuffle), per-row
    * expressions; output is ~n_chars/stride rows per doc. */
  def qDocChunk(s: SparkSession, dir: String): DataFrame = {
    val k = expr(s"(greatest(length(text) - ${chunkLen - chunkStride}, 1) " +
      s"+ ${chunkStride - 1}) div $chunkStride")
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text"), explode(sequence(lit(0), k - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast(IntegerType).as("chunk_id"),
        (col("chunk_id") * chunkStride + 1).cast(IntegerType).as("chunk_start"),
        length(substring(col("text"), (col("chunk_id") * chunkStride + 1).cast(IntegerType),
          lit(chunkLen))).as("n_chunk_chars"),
        md5(substring(col("text"), (col("chunk_id") * chunkStride + 1).cast(IntegerType),
          lit(chunkLen))).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")
  }

  val qDocChunkSql: String = s"""
    WITH k AS (
      SELECT doc_id, text,
        (greatest(length(text) - ${chunkLen - chunkStride}, 1)
          + ${chunkStride - 1}) // $chunkStride AS n_chunks
      FROM documents WHERE doc_id < 100),
    c AS (
      SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_id FROM k)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      CAST(chunk_id * $chunkStride + 1 AS INT) AS chunk_start,
      CAST(length(substr(text, CAST(chunk_id * $chunkStride + 1 AS INT), $chunkLen)) AS INT) AS n_chunk_chars,
      md5(substr(text, CAST(chunk_id * $chunkStride + 1 AS INT), $chunkLen)) AS chunk_fp
    FROM c ORDER BY doc_id, chunk_id
  """.trim

  /** Benchmark-contamination audit — the standard n-gram collision
    * check run before training: does any training document share
    * verbatim shingles with the held-out evaluation slice? Documents
    * >= [[ContamSplit]] stand in for the benchmark set; a (train,
    * bench) pair is flagged when it shares >= 3 distinct word
    * trigrams. The real near-dups planted across the split boundary
    * surface with 20-30 shared shingles; the threshold keeps
    * single-collision vocabulary noise out.
    *
    * Scale shape: the benchmark side is tiny by construction →
    * exploded shingles BROADCAST to the training side; the training
    * corpus streams through one hash join + one partial+final agg —
    * never a corpus×corpus comparison. Shingles ride as 8-byte
    * xxhash64 values from the native [[graft.functions.ShingleHashes]]
    * kernel (Dedup.scala:59-67 precedent: the shingle TEXT never
    * leaves the scan stage, the broadcast shrinks ~3×, and the join
    * probes compare longs; same collision-probability argument —
    * a single 2⁻⁶⁴ collision adds one phantom shared shingle to one
    * pair, which the >= 3 threshold absorbs). The oracle counts the
    * same equivalence classes on raw strings. */
  private val ContamSplit = 450
  def qContamination(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents").select(col("doc_id"),
      graft.functions.shingle_hashes(col("text"), 3).as("shingles"))
    val train = sh.filter(col("doc_id") < ContamSplit)
      .select(col("doc_id").as("train_id"), explode(col("shingles")).as("sh"))
    val bench = sh.filter(col("doc_id") >= ContamSplit)
      .select(col("doc_id").as("bench_id"), explode(col("shingles")).as("sh"))
    train.join(broadcast(bench), Seq("sh"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .orderBy("train_id", "bench_id")
  }

  val qContaminationSql: String = s"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id,
      list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)]) AS shingles
      FROM toks),
    tr AS (SELECT doc_id AS train_id, unnest(shingles) AS sh FROM sh WHERE doc_id < $ContamSplit),
    be AS (SELECT doc_id AS bench_id, unnest(shingles) AS sh FROM sh WHERE doc_id >= $ContamSplit)
    SELECT train_id, bench_id, COUNT(*) AS n_shared
    FROM tr JOIN be USING (sh)
    GROUP BY train_id, bench_id HAVING COUNT(*) >= 3
    ORDER BY train_id, bench_id
  """.trim

  /** Per-document n-gram NOVELTY — the curation dual of
    * [[qContamination]]: how much of a document's 3-gram vocabulary
    * occurs NOWHERE else in the corpus. Novelty ranks documents for
    * dedup-aware sampling (high novelty = unique content worth
    * keeping; near-zero novelty marks boilerplate and templates that
    * the near-dup tier's banding may still miss). Shape: one explode
    * of the per-doc distinct shingle hashes, one count per shingle
    * (document frequency), and df=1 shingles credited back to their
    * single holding document — two aggregations co-partitioned on the
    * shingle hash, zero joins on the corpus side, zero all-pairs
    * work. The digests-only posture of the dedup tier holds: text
    * never shuffles, only 8-byte hashes. Output bounded to
    * doc_id % 20 = 0 for a stable declared row count. */
  def qNoveltyNgrams(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents").select(col("doc_id"),
      explode(graft.functions.shingle_hashes(col("text"), 3)).as("sh"))
    val perDoc = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val novel = sh.groupBy("sh")
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .na.fill(0, Seq("n_novel"))
      .filter(col("doc_id") % 20 === 0)
      .orderBy("doc_id")
  }

  val qNoveltyNgramsSql: String = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id,
      unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w)-1)])) AS sh
      FROM toks),
    per AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
    uniq AS (SELECT MIN(doc_id) AS doc_id FROM sh GROUP BY sh HAVING COUNT(*) = 1),
    nov AS (SELECT doc_id, COUNT(*) AS n_novel FROM uniq GROUP BY doc_id)
    SELECT p.doc_id, p.n_shingles, COALESCE(n.n_novel, 0) AS n_novel
    FROM per p LEFT JOIN nov n USING (doc_id)
    WHERE p.doc_id % 20 = 0 ORDER BY p.doc_id
  """.trim

  /** Vocabulary size for the OOV profile. */
  private val VocabSize = 40

  /** Vocabulary build + out-of-vocabulary profile — tokenizer prep:
    * take the top-[[VocabSize]] terms by document frequency (ties
    * broken by term, so the vocabulary is deterministic), then profile
    * every document's token coverage against it. The vocabulary is
    * dictionary-sized → broadcast; the corpus streams through one
    * left join + one partial+final agg. The OOV rate is a single
    * long/long double division (exact cross-engine). */
  def qVocabOov(s: SparkSession, dir: String): DataFrame = {
    val tokens = t(s, dir, "documents")
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val vocab = tokens.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(VocabSize)
      .select(col("term"), lit(1).as("in_v"))
    tokens.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1).otherwise(0)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast(DoubleType) / col("n_tokens"))
      .filter(col("doc_id") < 100)
      .orderBy("doc_id")
  }

  val qVocabOovSql: String = s"""
    WITH tokens AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
    vocab AS (
      SELECT term, 1 AS in_v FROM dfreq
      ORDER BY df DESC, term ASC LIMIT $VocabSize),
    prof AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
      FROM tokens LEFT JOIN vocab USING (term) GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_oov,
      CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
    FROM prof WHERE doc_id < 100 ORDER BY doc_id
  """.trim

  /** BM25 query terms — fixed, vocabulary-present. */
  private val Bm25Terms = Seq("spark", "hash", "window")
  private val (bmK1, bmB) = (1.2, 0.75)

  /** BM25 relevance ranking: top-10 documents for a fixed 3-term
    * query. Uses the RATIONAL-idf BM25 variant — idf_r = (N - df +
    * 0.5)/(df + 0.5), no log — and per-term score columns added in
    * one fixed order, so every double operation is an IEEE
    * correctly-rounded op on identical operands in identical order in
    * both engines: bit-exact cross-engine scores without giving up
    * float scoring. (Classic log-idf BM25 ranks identically for a
    * single term since ln is monotone; summed multi-term rankings can
    * differ — this is a documented scoring variant, not an
    * approximation of the log form.) One more defense: engines may
    * legally FUSE a*b+c (measured: DuckDB's evaluation differs from a
    * strict sequential-IEEE replay by 1 ulp on ~20% of rows), so each
    * per-term score is snapped to a DECIMAL(20,10) grid before the
    * fixed-order sum — 10 decimal digits of score, immune to ulp
    * drift, still a double downstream.
    *
    * Scale shape: tf rows are filtered to the query terms at the scan
    * (an IsIn pushdown), df and doc-length sides are tiny aggregates,
    * and the per-doc pivot is one partial+final agg — no all-corpus
    * state beyond the broadcast term statistics. */
  /** Per-doc BM25 over [[Bm25Terms]] (docs with no query term have no
    * row) — the scored frame behind both `bm25_rank` and the lexical
    * leg of `hybrid_search`. */
  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val nDocs = docs.count()
    val dl = docs.select(col("doc_id"), size(toks(col("text"))).as("dl"))
    val avgdl = dl.agg(sum(col("dl"))).head.getLong(0).toDouble / nDocs
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .filter(col("term").isInCollection(Bm25Terms))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfPart = (col("tf") * lit(bmK1 + 1.0)) /
      (col("tf") + lit(bmK1) * (lit(1.0 - bmB) +
        lit(bmB) * (col("dl").cast(DoubleType) / lit(avgdl))))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("score",
        (idf * tfPart).cast(DecimalType(20, 10)).cast(DoubleType))
    val perTerm = Bm25Terms.map(term =>
      coalesce(max(when(col("term") === term, col("score"))), lit(0.0)))
    scored.groupBy(col("doc_id"))
      .agg(((perTerm(0) + perTerm(1)) + perTerm(2)).as("bm25"))
  }

  def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scored(s, dir)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(10)

  val qBm25Sql: String = s"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n,
        (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) /
          (SELECT COUNT(*) FROM documents) AS avgdl),
    terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms
      WHERE term IN ('spark', 'hash', 'window') GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT doc_id, term,
        CAST(CAST(((n - df + 0.5) / (df + 0.5)) *
        ((tf * ${bmK1 + 1.0}) / (tf + $bmK1 * (${1.0 - bmB} +
          $bmB * (CAST(dl AS DOUBLE) / avgdl)))) AS DECIMAL(20,10)) AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats)
    SELECT doc_id,
      ((COALESCE(MAX(CASE WHEN term = 'spark' THEN score END), 0.0)
        + COALESCE(MAX(CASE WHEN term = 'hash' THEN score END), 0.0))
        + COALESCE(MAX(CASE WHEN term = 'window' THEN score END), 0.0)) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 10
  """.trim

  // ---- hybrid retrieval: BM25 + vector, RRF-fused ----------------------

  private val RrfK = 60
  private val HybridDepth = 50

  /** Depth-bounded global rank WITHOUT a single-partition sort over
    * the corpus: a per-partition window first prunes each partition to
    * its local top-`depth`, so the global rank window orders only
    * depth·P survivors — the two-phase shape of [[Similarity]]'s top-k
    * and plans/TopKPerGroup, which is what keeps a "rank the whole
    * corpus" leg runnable when the corpus is 10^11 rows. */
  private def rankTop(df: DataFrame, depth: Int, score: Column,
      id: Column, as: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val wLocal = w.partitionBy(col("__part")).orderBy(score.desc, id.asc)
    val wGlobal = w.orderBy(score.desc, id.asc)
    df.withColumn("__part", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal))
      .filter(col("__lrn") <= depth)
      .withColumn(as, row_number().over(wGlobal))
      .filter(col(as) <= depth)
      .select(id.as("doc_id"), col(as))
  }

  /** Hybrid retrieval — the RAG / training-data-curation access path:
    * a lexical BM25 leg ([[bm25Scored]], terms [[Bm25Terms]]) and a
    * vector leg (cosine against the `vec_id = 0` embedding, the
    * corpus-aligned twin of `knn_brute`) are each ranked to depth
    * [[HybridDepth]], then fused by Reciprocal Rank Fusion (Cormack,
    * Clarke & Buettcher, SIGIR 2009): score(d) = Σ_legs 1/(K + rank),
    * K = [[RrfK]], a doc absent from a leg contributing 0. RRF works
    * on RANKS, not raw scores, so the two legs' incomparable score
    * scales never need calibration — which is why it is the industry
    * default fuser.
    *
    * Cross-engine contract: ranks are integers (deterministic
    * tie-break by doc_id), each reciprocal is one correctly-rounded
    * IEEE divide on identical operands, the two-term sum is in fixed
    * order, and the result is floor-quantized to e12 (the qQuantize
    * convention) — bit-identical in both engines.
    *
    * Scale shape: both legs are depth-bounded two-phase ranks (no
    * global sort); the fusion joins two ≤depth-row frames — broadcast
    * territory. At 100 TB the vector leg swaps to the IVF probe path
    * (`knn_ivf_persisted`) and the lexical leg to the posting index
    * (`text_search`); this query pins the exact fusion semantics those
    * access paths feed. */
  def qHybridSearch(s: SparkSession, dir: String): DataFrame = {
    val lex = rankTop(bm25Scored(s, dir), HybridDepth,
      col("bm25"), col("doc_id"), "rl")
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val scoredVec = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("cid"),
        gf.cosine_sim(col("qe"), col("embedding")).as("cos_sim"))
    val vec = rankTop(scoredVec, HybridDepth,
      col("cos_sim"), col("cid"), "rv")
    val contrib = (c: Column) => coalesce(lit(1.0) / (lit(RrfK) + c), lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e12",
        floor((contrib(col("rl")) + contrib(col("rv"))) * lit(1000000000000L))
          .cast(LongType))
      .select(col("doc_id"), col("rl"), col("rv"), col("rrf_e12"))
      .orderBy(col("rrf_e12").desc, col("doc_id").asc)
      .limit(20)
  }

  /** [[qHybridSearch]] answered through the PERSISTED access paths —
    * the proof of its "at 100 TB the legs swap to the indexes" claim:
    * the lexical leg reads a postings index (BM25 tokenization, same
    * 16-way md5-nibble bucket layout as `text_search` — partition
    * pruning + pushed term equality, so the query touches O(postings
    * of the 3 query terms)) with doc-length and corpus-stats sidecars
    * written at build time; the vector leg queries the persisted IVF
    * TableLog index (`Similarity.queryIvfIndex`, probe-all = exact)
    * at depth 50. Fusion is byte-identical RRF.
    *
    * The ORACLE IS [[qHybridSearchSql]] VERBATIM: an index changes the
    * access path, never the answer — one row proves the whole
    * build+query+fusion pipeline against the direct computation. */
  def qHybridIndexed(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/hybrid_index"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    // ---- build: postings + doc lengths + corpus stats + IVF ----
    // The IVF index build (Similarity.buildIvfIndex — embeddings side)
    // and the lexical index build (documents side) share NO inputs or
    // outputs: run them as concurrent driver-submitted jobs (guide
    // §2.6 "overlap independent jobs") so the IVF build's small jobs
    // back-fill executors the tokenize stages leave idle. r14 profile:
    // 40 sequential jobs, wall 5.6 s vs job-sum 3.9 s — the gap is
    // scheduler round-trips this overlap absorbs. Results are
    // unaffected: both legs are read only after BOTH builds complete.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val ivfBuild = pool.submit(new java.util.concurrent.Callable[Unit] {
      override def call(): Unit =
        Similarity.buildIvfIndex(s, dir, s"$root/ivf")
    })
    val docs = t(s, dir, "documents")
    // cluster by bucket before the partitioned write: a partitionBy
    // writer opens one file per (task, value) pair, so leaving the
    // agg exchange's task layout in place writes up to tasks × buckets
    // tiny files (measured 16×16 at sf0.1 — the write job doubled on
    // open/commit overhead alone). The explicit-count repartition pins
    // one file per bucket per holding task (guide §6 file sizing; same
    // lesson as TableLog.appendPartitioned's pinned count — bare
    // repartition(cols) is an AQE coalesce target).
    val p = s.sessionState.conf.numShufflePartitions
    docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bkt", termBucket(col("term")))
      .repartition(p, col("bkt"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$root/postings")
    // corpus stats OBSERVED during the doclen write (count and Σdl are
    // exactly n_docs and Σ tokens): r14 already dropped the third
    // tokenize pass by re-reading the artifact; the observation drops
    // the re-read too — the stats sidecar is then written from the
    // observed values as a local one-row relation (no corpus job)
    // named: the bench records observed metrics into BENCH_DETAIL.json
    // keyed by observation name — an anonymous Observation would leak a
    // fresh random key into the artifact every run
    val obs = org.apache.spark.sql.Observation("hybrid_corpus_stats")
    docs.select(col("doc_id"), size(toks(col("text"))).as("dl"))
      .observe(obs, count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$root/doclen")
    val nDocs = obs.get("n_docs").asInstanceOf[Long]
    val sumDl = obs.get("sum_dl").asInstanceOf[Long]
    locally { val sp = s; import sp.implicits._
      Seq((nDocs, sumDl)).toDF("n_docs", "sum_dl")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/stats") }
    // both index trees must exist before either leg reads
    try ivfBuild.get() finally pool.shutdown()
    // ---- lexical leg from the index ----
    val avgdl = sumDl.toDouble / nDocs
    val posts = s.read.parquet(s"$root/postings")
    // one pruned scan for all query terms (bkt prunes partitions, the
    // IN prunes row groups) — the per-term union re-scanned the index
    // once per term for rows one disjoint-filter scan returns
    val tf = posts
      .filter(col("bkt").isin(Bm25Terms.map(termBucketOf): _*) &&
        col("term").isin(Bm25Terms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = s.read.parquet(s"$root/doclen")
    val idf = (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val tfPart = (col("tf") * lit(bmK1 + 1.0)) /
      (col("tf") + lit(bmK1) * (lit(1.0 - bmB) +
        lit(bmB) * (col("dl").cast(DoubleType) / lit(avgdl))))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("score",
        (idf * tfPart).cast(DecimalType(20, 10)).cast(DoubleType))
    val perTerm = Bm25Terms.map(term =>
      coalesce(max(when(col("term") === term, col("score"))), lit(0.0)))
    val bm = scored.groupBy(col("doc_id"))
      .agg(((perTerm(0) + perTerm(1)) + perTerm(2)).as("bm25"))
    val lex = rankTop(bm, HybridDepth, col("bm25"), col("doc_id"), "rl")
    // ---- vector leg from the persisted IVF index (built above) ----
    val queries = graft.sources.TableLog.snapshot(s, s"$root/ivf/vectors")
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val vec = Similarity
      .queryIvfIndex(s, s"$root/ivf", queries, nprobe = 10,
        topk = HybridDepth)
      .select(col("cid").as("doc_id"), col("rn").as("rv"))
    // ---- RRF fusion (identical to qHybridSearch) ----
    val contrib = (c: Column) => coalesce(lit(1.0) / (lit(RrfK) + c), lit(0.0))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_e12",
        floor((contrib(col("rl")) + contrib(col("rv"))) * lit(1000000000000L))
          .cast(LongType))
      .select(col("doc_id"), col("rl"), col("rv"), col("rrf_e12"))
      .orderBy(col("rrf_e12").desc, col("doc_id").asc)
      .limit(20)
  }

  val qHybridSearchSql: String = s"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n,
        (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) /
          (SELECT COUNT(*) FROM documents) AS avgdl),
    terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms
      WHERE term IN ('spark', 'hash', 'window') GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT doc_id, term,
        CAST(CAST(((n - df + 0.5) / (df + 0.5)) *
        ((tf * ${bmK1 + 1.0}) / (tf + $bmK1 * (${1.0 - bmB} +
          $bmB * (CAST(dl AS DOUBLE) / avgdl)))) AS DECIMAL(20,10)) AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
    bm AS (
      SELECT doc_id,
        ((COALESCE(MAX(CASE WHEN term = 'spark' THEN score END), 0.0)
          + COALESCE(MAX(CASE WHEN term = 'hash' THEN score END), 0.0))
          + COALESCE(MAX(CASE WHEN term = 'window' THEN score END), 0.0)) AS bm25
      FROM scored GROUP BY doc_id),
    lex AS (
      SELECT doc_id, rl FROM (
        SELECT doc_id, CAST(ROW_NUMBER() OVER
          (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rl FROM bm)
      WHERE rl <= $HybridDepth),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sv AS (
      SELECT vec_id AS cid,
        list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * embedding[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len(embedding)+1), i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)))) AS cos_sim
      FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
    vec AS (
      SELECT doc_id, rv FROM (
        SELECT cid AS doc_id, CAST(ROW_NUMBER() OVER
          (ORDER BY cos_sim DESC, cid ASC) AS INT) AS rv FROM sv)
      WHERE rv <= $HybridDepth),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, rl, rv
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
    SELECT doc_id, rl, rv,
      CAST(FLOOR((COALESCE(1.0 / ($RrfK + rl), 0.0)
        + COALESCE(1.0 / ($RrfK + rv), 0.0)) * 1000000000000) AS BIGINT) AS rrf_e12
    FROM fused ORDER BY rrf_e12 DESC, doc_id ASC LIMIT 20
  """.trim

  /** Gopher-style repetition filters — the standard corpus-quality
    * gate that drops boilerplate and spam by measuring how much of a
    * document is repeated content: duplicate-word fraction and
    * duplicate-bigram fraction, rolled up per source with a count of
    * documents a 0.5-bigram-dup threshold would reject.
    *
    * The bigram list is built with zip_with over a shifted slice — no
    * explode, so the per-document work never leaves the row and the
    * only shuffle is the final few-group agg. Cross-row means go
    * through exact decimal sums (order-independent at any partition
    * count). */
  /** Per-document repetition scores on any frame with a `text`
    * column — pure per-row Columns, so the same transform gates a
    * stream (StreamingSpec) and feeds the batch rollup below.
    *
    * Bigrams use the zip_with-over-shifted-slice idiom from
    * [[Dedup.shingled]], NOT `transform(sequence(..), i ->
    * element_at(w, i) ..)`: project-collapse inlines the `split` into
    * every lambda reference, and a per-ELEMENT element_at(w, i) then
    * re-splits the whole text once per element — O(len²) per document
    * and interpreted. The slice arguments live outside the
    * per-element lambda, so the split is evaluated O(1) times per
    * row. zip_with pads the shorter side with null and concat_ws
    * silently drops nulls, so the final slice trims the padded tail
    * entry (guarded for n < 2). */
  def repetitionScores(df: DataFrame): DataFrame = {
    val w = toks(col("text"))
    val n = size(w)
    val grams = slice(
      zip_with(w, slice(w, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(n - 1, lit(0)))
    val dupWord = (size(w) - size(array_distinct(w))).cast(DoubleType) / size(w)
    val dupGram = (size(grams) - size(array_distinct(grams))).cast(DoubleType) /
      size(grams)
    df.filter(size(w) >= 2)
      .withColumn("dup_word_frac", dupWord)
      .withColumn("dup_gram_frac", dupGram)
  }

  /** The Gopher/MassiveText document-quality gate (Rae et al. 2021,
    * arXiv:2112.11446 §A1.1) as ONE composite row-local filter — the
    * published rule set the per-signal rows (text_quality,
    * quality_repetition, length_filter) feed in a real pipeline:
    * word count in [50, 100000], mean word length in [3, 10], >= 80%
    * of words containing an alphabetic character, >= 2 distinct stop
    * words ("the a of and to" — the MassiveText membership test), and
    * a <= 10% #/ellipsis symbol-to-word ratio. Every rule is an
    * EXACT-INTEGER comparison (mean-length bounds cross-multiplied:
    * 3n <= chars <= 10n, ratios as 5*alpha >= 4*n and 10*sym <= n), so
    * the per-source rejection profile hash-replays in DuckDB with no
    * float anywhere. Scale: row-local expressions only — no explode,
    * no shuffle except the final few-group agg. */
  def qQualityGopher(s: SparkSession, dir: String): DataFrame = {
    // one fused pass (graft.functions.TokenProfile) instead of four
    // interpreted HOF chains — keeps the projection inside whole-stage
    // codegen (PlanLintSpec) and scans each document's bytes once
    val p = graft.functions.token_profile(col("text"), "the a of and to")
    val nW = p.getField("n_tok")
    // chars across words = len(text) minus the n-1 separators
    val chars = length(col("text")) - (nW - lit(1))
    val nAlpha = p.getField("n_alpha")
    val nSym = p.getField("n_sym")
    val nStops = p.getField("n_stop_distinct")
    val failWords = nW < 50 || nW > 100000
    val failMean = chars < nW * 3 || chars > nW * 10
    val failAlpha = nAlpha * 5 < nW * 4
    val failStop = nStops < 2
    val failSym = nSym * 10 > nW
    val kept = !(failWords || failMean || failAlpha || failStop || failSym)
    def cnt(c: Column, name: String): Column =
      sum(when(c, 1L).otherwise(0L)).as(name)
    t(s, dir, "documents")
      .select(col("source"), failWords.as("fw"), failMean.as("fm"),
        failAlpha.as("fa"), failStop.as("fs"), failSym.as("fy"),
        kept.as("k"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        cnt(col("fw"), "n_fail_words"), cnt(col("fm"), "n_fail_meanlen"),
        cnt(col("fa"), "n_fail_alpha"), cnt(col("fs"), "n_fail_stopwords"),
        cnt(col("fy"), "n_fail_symbols"), cnt(col("k"), "n_kept"))
      .orderBy("source")
  }

  val qQualityGopherSql: String = """
    WITH d AS (
      SELECT source, string_split(text, ' ') AS w, length(text) AS lc
      FROM documents),
    f AS (SELECT source,
      len(w) AS nw,
      lc - (len(w) - 1) AS chars,
      len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS nalpha,
      len(list_filter(w, t -> contains(t, '#') OR contains(t, '...'))) AS nsym,
      len(list_filter(['the','a','of','and','to'],
        sw -> list_contains(w, sw))) AS nstops
      FROM d),
    r AS (SELECT source,
      (nw < 50 OR nw > 100000) AS fw,
      (chars < nw * 3 OR chars > nw * 10) AS fm,
      (nalpha * 5 < nw * 4) AS fa,
      (nstops < 2) AS fs,
      (nsym * 10 > nw) AS fy
      FROM f)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN fw THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_words,
      CAST(SUM(CASE WHEN fm THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_meanlen,
      CAST(SUM(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_alpha,
      CAST(SUM(CASE WHEN fs THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopwords,
      CAST(SUM(CASE WHEN fy THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_symbols,
      CAST(SUM(CASE WHEN NOT (fw OR fm OR fa OR fs OR fy) THEN 1 ELSE 0 END)
        AS BIGINT) AS n_kept
    FROM r GROUP BY source ORDER BY source
  """.trim

  def qQualityRepetition(s: SparkSession, dir: String): DataFrame = {
    repetitionScores(t(s, dir, "documents"))
      .select(col("source"), col("dup_word_frac"), col("dup_gram_frac"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dup_word_frac").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("avg_dup_word"),
        (sum(col("dup_gram_frac").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("avg_dup_gram"),
        sum(when(col("dup_gram_frac") > 0.5, 1L).otherwise(0L)).as("n_rejected"))
      .orderBy("source")
  }

  val qQualityRepetitionSql: String = """
    WITH d AS (
      SELECT source, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    g AS (
      SELECT source, w,
        list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) AS grams
      FROM d),
    f AS (
      SELECT source,
        CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) AS dup_word_frac,
        CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_gram_frac
      FROM g)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CAST(dup_word_frac AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_dup_word,
      CAST(SUM(CAST(dup_gram_frac AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_dup_gram,
      CAST(SUM(CASE WHEN dup_gram_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
    FROM f GROUP BY source ORDER BY source
  """.trim

  /** Per-source quality cap — keep only the 10 LEAST repetitive docs
    * of each source: the repetition scores compose straight into the
    * engine's custom grouped-top-k operator ([[graft.plans.TopKPerGroup]]),
    * so the cap runs as bounded per-group heaps, not a per-source
    * sort of the whole corpus. */
  def qQualityCap(s: SparkSession, dir: String): DataFrame = {
    val scored = repetitionScores(t(s, dir, "documents"))
      .select(col("doc_id"), col("source"), col("dup_gram_frac"))
    graft.plans.TopKPerGroup(scored, Seq("source"),
      Seq("dup_gram_frac" -> true, "doc_id" -> true), 10)
      .orderBy("source", "dup_gram_frac", "doc_id")
  }

  val qQualityCapSql: String = """
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    g AS (
      SELECT doc_id, source,
        list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) AS grams
      FROM d),
    f AS (
      SELECT doc_id, source,
        CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_gram_frac
      FROM g),
    r AS (
      SELECT doc_id, source, dup_gram_frac,
        ROW_NUMBER() OVER (PARTITION BY source
          ORDER BY dup_gram_frac ASC, doc_id ASC) AS rn
      FROM f)
    SELECT doc_id, source, dup_gram_frac FROM r WHERE rn <= 10
    ORDER BY source, dup_gram_frac, doc_id
  """.trim

  /** Model-based quality gate — fastText-shaped linear classifier
    * inference (arXiv:1607.01759; the quality-filter stage of
    * GPT-3/CCNet-style curation): per document, hash its distinct
    * unigram + bigram features, look up an integer weight per feature,
    * sum to a margin, keep iff margin >= 0. The weights here are a
    * seeded stand-in for trained parameters — the graded substance is
    * the inference SHAPE: feature hashing → weight lookup → linear
    * margin → gate, entirely row-local (the hashing trick means no
    * weight table is shipped at all; a trained model would broadcast
    * its dense weight array and index it the same way).
    *
    * Determinism: weights are integers derived from md5 (the
    * engine-portable hash, data_split precedent) — margins are exact
    * integer sums, the gate is exact, and the one double division is
    * correctly rounded, so the DuckDB oracle replays doc-for-doc.
    * No sigmoid: keep(margin >= 0) ⟺ sigmoid(margin) >= 0.5, and exp()
    * is banned from hash-checked queries by the determinism rule.
    *
    * Scale posture: per-row array expressions only — no explode, no
    * shuffle except the final few-group agg; bigrams ride the
    * zip_with-shifted-slice idiom (no O(len²)). */
  def qQualityClassify(s: SparkSession, dir: String): DataFrame = {
    // fused codegen kernel (graft.functions.Md5Margin): the composed
    // zip_with/aggregate HOF form is CodegenFallback — KernelsSpec
    // pins the kernel bit-equal to it, so the oracle is untouched
    val z = graft.functions.md5_margin(col("text"))
    t(s, dir, "documents")
      .select(col("source"), z.as("z"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("z") >= 0, 1L).otherwise(0L)).as("n_kept"),
        (sum(col("z")).cast(DoubleType) / count(lit(1))).as("avg_margin"))
      .orderBy("source")
  }

  val qQualityClassifySql: String = """
    WITH toks AS (SELECT source, string_split(text,' ') AS w FROM documents),
    f AS (SELECT source,
      list_concat(list_distinct(w),
        list_distinct([w[i]||' '||w[i+1] for i in range(1,len(w))])) AS feats
      FROM toks),
    z AS (SELECT source,
      list_sum(list_transform(feats, t ->
        CAST('0x'||substr(md5(t),1,3) AS BIGINT)%2001 - 1000)) AS z FROM f)
    SELECT source, COUNT(*) AS n_docs, COUNT(CASE WHEN z>=0 THEN 1 END) AS n_kept,
      CAST(SUM(z) AS DOUBLE)/COUNT(*) AS avg_margin
    FROM z GROUP BY source ORDER BY source
  """.trim

  /** Corpus-bigram familiarity score — the integer-exact core of an
    * n-gram language-model perplexity filter (score docs by how
    * common their bigrams are corpus-wide; a perplexity gate would
    * log() these counts, which is banned in hash-checked queries by
    * the determinism rule, so the score stays rational: mean corpus
    * frequency of the doc's bigrams, one correctly-rounded double
    * division at the end).
    *
    * Scale posture: bigrams ride the zip_with-shifted-slice idiom (no
    * O(len²)); the bigram string is hashed to an 8-byte xxhash64 at
    * explode time and DROPPED — the frequency groupBy and the
    * count-join shuffle only (doc_id, hash) pairs, a multiple-fold
    * shuffle-volume cut at 100 TB (Dedup.shingled:59-67 precedent;
    * same collision-probability argument: ~(n_bigrams)²/2⁶⁵). The
    * oracle counts the same equivalence classes via the raw strings.
    * Top-20 keeps the output bounded. */
  def qNgramLm(s: SparkSession, dir: String): DataFrame = {
    val w = toks(col("text"))
    val n = size(w)
    val grams = slice(
      zip_with(w, slice(w, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), greatest(n - 1, lit(0)))
    val exploded = t(s, dir, "documents")
      .filter(n >= 2)
      .select(col("doc_id"), explode(grams).as("bg_str"))
      .select(col("doc_id"), graft.functions.hash64(col("bg_str")).as("bg"))
    val counts = exploded.groupBy(col("bg"))
      .agg(count(lit(1)).as("cnt"))
    exploded.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("fam_sum"))
      .withColumn("familiarity",
        col("fam_sum").cast(DoubleType) / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("fam_sum"), col("familiarity"))
      .orderBy(col("familiarity").desc, col("doc_id"))
      .limit(20)
  }

  val qNgramLmSql: String = """
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    g AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS bg
      FROM d),
    c AS (SELECT bg, COUNT(*) AS cnt FROM g GROUP BY bg)
    SELECT g.doc_id, COUNT(*) AS n_bigrams, CAST(SUM(cnt) AS BIGINT) AS fam_sum,
      CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS familiarity
    FROM g JOIN c ON g.bg = c.bg
    GROUP BY g.doc_id
    ORDER BY familiarity DESC, doc_id LIMIT 20
  """.trim

  /** Cross-document boilerplate detection (the CCNet/Gopher line-dedup
    * trick re-expressed at segment granularity — the fixture has no
    * newlines, so "lines" are fixed 8-token segments): a segment
    * appearing in ≥2 DISTINCT documents is boilerplate; per-source
    * rollup of the boilerplate fraction and fully-clean doc count.
    *
    * The token array rides an `explode(array(split))` Generate node —
    * a collapse barrier, so the split is evaluated once per document
    * and the per-segment lambda slices the materialized array attribute
    * (same trap class as repetitionScores' bigrams). The segment text
    * is hashed to an 8-byte xxhash64 right after the explode and
    * dropped — the distinct-count groupBy and the flag-join shuffle
    * only (doc_id, source, hash), the Dedup.shingled:59-67
    * shuffle-volume discipline (collision probability ~(n_segs)²/2⁶⁵;
    * the oracle counts the same equivalence classes via raw text). */
  def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val nSeg = ceil(size(col("w")) / lit(8.0)).cast(IntegerType)
    val segs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array(toks(col("text")))).as("w"))
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(0), greatest(nSeg - 1, lit(0))),
          i => concat_ws(" ", slice(col("w"), i * 8 + 1, lit(8)))))
          .as("segment_str"))
      .select(col("doc_id"), col("source"),
        graft.functions.hash64(col("segment_str")).as("segment"))
    val counts = segs.groupBy(col("segment"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val perDoc = segs.join(counts, "segment")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_seg"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_boiler"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_seg")).as("n_segments"),
        sum(col("n_boiler")).as("n_boiler"),
        (sum(col("n_boiler")).cast(DoubleType) / sum(col("n_seg")))
          .as("boiler_frac"),
        sum(when(col("n_boiler") === 0, 1L).otherwise(0L)).as("n_clean_docs"))
      .orderBy(col("source"))
  }

  val qBoilerplateSql: String = """
    WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    seg AS (SELECT doc_id, source,
      unnest(list_transform(range(0, greatest(CAST(ceil(len(w) / 8.0) AS INT), 1)),
        i -> array_to_string(list_slice(w, i * 8 + 1, i * 8 + 8), ' '))) AS segment
      FROM d),
    counts AS (SELECT segment, COUNT(DISTINCT doc_id) AS ndocs
               FROM seg GROUP BY segment),
    per_doc AS (
      SELECT s.doc_id, s.source, COUNT(*) AS n_seg,
        SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS n_boiler
      FROM seg s JOIN counts c ON s.segment = c.segment
      GROUP BY s.doc_id, s.source)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(n_seg) AS BIGINT) AS n_segments,
      CAST(SUM(n_boiler) AS BIGINT) AS n_boiler,
      CAST(SUM(n_boiler) AS DOUBLE) / SUM(n_seg) AS boiler_frac,
      CAST(SUM(CASE WHEN n_boiler = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_docs
    FROM per_doc GROUP BY source ORDER BY source
  """.trim

  /** Per-language length gate at the 5th/95th exact percentile —
    * the standard outlier filter before training-data packing. The
    * cutoffs are snapped to 6 dp in BOTH engines before the filter so
    * a cutoff landing within float drift of an integer n_chars can't
    * flip a comparison (the percentile-interpolation FMA-drift class
    * the BM25 query documents). Cutoff table is per-lang tiny →
    * broadcast join; the gate itself is a codegen'd filter, no
    * second shuffle. */
  def qLengthFilter(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cuts = docs.groupBy(col("lang"))
      .agg(round(percentile(col("n_chars"), lit(0.05)), 6).as("p5"),
        round(percentile(col("n_chars"), lit(0.95)), 6).as("p95"))
    docs.join(broadcast(cuts), "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") < col("p5") || col("n_chars") > col("p95"),
          1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("n_chars").between(col("p5"), col("p95")),
          col("n_chars")).otherwise(0L)).as("kept_chars"),
        min(col("p5")).as("p5"), min(col("p95")).as("p95"))
      .orderBy(col("lang"))
  }

  val qLengthFilterSql: String = """
    WITH cuts AS (
      SELECT lang, ROUND(quantile_cont(n_chars, 0.05), 6) AS p5,
        ROUND(quantile_cont(n_chars, 0.95), 6) AS p95
      FROM documents GROUP BY lang)
    SELECT d.lang, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN n_chars < p5 OR n_chars > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      CAST(SUM(CASE WHEN n_chars BETWEEN p5 AND p95 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
      MIN(p5) AS p5, MIN(p95) AS p95
    FROM documents d JOIN cuts ON d.lang = cuts.lang
    GROUP BY d.lang ORDER BY d.lang
  """.trim

  /** Unicode text normalization via the native [[graft.functions.NormalizeText]]
    * kernel (NFD → strip combining marks → lower → collapse
    * whitespace) — the standard preprocessing stage before any
    * shingle/minhash dedup pass. The fixture text is ASCII, so the
    * query first INJECTS accents deterministically (a→U+00E1,
    * o→U+00F6, plus a decomposed e+COMBINING-ACUTE probe column) and
    * the kernel must fold them all back; the DuckDB oracle replays
    * the identical injection and normalizes with its own
    * strip_accents/lower/regexp pipeline, so the row hash
    * cross-checks two independent Unicode implementations
    * (utf8proc vs java.text.Normalizer). Single scan, zero shuffles
    * below the final order-by. */
  def qTextNormalize(s: SparkSession, dir: String): DataFrame = {
    // a -> a-acute (U+00E1), o -> o-diaeresis (U+00F6); escapes keep
    // the source file ASCII
    val accented = replace(replace(col("text"), lit("a"), lit("\u00e1")),
      lit("o"), lit("\u00f6"))
    // decomposed probe " No<U+0308>e<U+0301>l " must normalize to "noel"
    val probe = lit(" No\u0308e\u0301l ")
    t(s, dir, "documents")
      .select(col("doc_id"),
        gf.normalize_text(accented).as("norm"),
        gf.normalize_text(probe).as("probe"))
      .select(col("doc_id"),
        substring(col("norm"), 1, 60).as("norm60"),
        length(col("norm")).as("n_norm"),
        col("probe"))
      .orderBy(col("doc_id"))
  }

  val qTextNormalizeSql: String = """
    WITH a AS (
      SELECT doc_id,
        trim(regexp_replace(lower(strip_accents(
          replace(replace(text, 'a', chr(225)), 'o', chr(246)))),
          '\s+', ' ', 'g')) AS norm
      FROM documents)
    SELECT doc_id, substr(norm, 1, 60) AS norm60,
      CAST(length(norm) AS INT) AS n_norm,
      trim(regexp_replace(lower(strip_accents(
        ' N' || chr(111) || chr(776) || 'e' || chr(769) || 'l ')),
        '\s+', ' ', 'g')) AS probe
    FROM a ORDER BY doc_id
  """.trim

  // ---- inverted-index search -------------------------------------------

  private val SearchTerms = ("hash", "join")

  private def termBucket(c: Column): Column =
    conv(substring(md5(c), 1, 1), 16, 10).cast("int")

  private def termBucketOf(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    (d(0) >> 4) & 0xf
  }

  /** Persisted inverted index + conjunctive search — the text twin of
    * `knn_ivf_persisted`'s build-once/query-many posture: posting
    * lists (term, doc_id, tf) are written ONCE, hash-bucketed into 16
    * partition directories by the term's leading md5 nibble; a query
    * then reads ONLY its terms' buckets (partition pruning) and, via
    * the pushed term equality, only the matching row groups inside
    * them — query cost is O(postings of the query terms), never
    * O(corpus). The conjunctive (AND) query is a posting-list
    * intersection: one hash join on doc_id between two pruned index
    * scans, scored by summed term frequency.
    *
    * At 100 TB the bucket count scales with the term cardinality and
    * the posting files are sorted by term so min/max row-group stats
    * prune within a bucket — the same stats-skipping story as the
    * TableLog sidecars. PlanLint-style asserts pin both pruning layers
    * in AnalyticsSpec. */
  def qTextSearch(s: SparkSession, dir: String): DataFrame = {
    val idx = Egress.outRoot(dir) + "/postings"
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")).between(2, 12))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bkt", termBucket(col("term")))
      // cluster by bucket before the partitioned write (one file per
      // bucket per holding task, not tasks × buckets tiny files) —
      // same pinned-count idiom as qHybridIndexed's postings write
      .repartition(s.sessionState.conf.numShufflePartitions, col("bkt"))
      .sortWithinPartitions("term") // row-group stats stay term-clustered
      .write.mode("overwrite").partitionBy("bkt").parquet(idx)
    val posts = s.read.parquet(idx)
    def lookup(term: String, as: String) = posts
      .filter(col("bkt") === termBucketOf(term) && col("term") === term)
      .select(col("doc_id"), col("tf").as(as))
    lookup(SearchTerms._1, "tf_a").join(lookup(SearchTerms._2, "tf_b"), "doc_id")
      .withColumn("score", col("tf_a") + col("tf_b"))
      .orderBy(desc("score"), col("doc_id"))
      .limit(20)
  }

  /** The oracle needs no index: same tokenization, direct
    * intersection — the index is an ACCESS PATH, not a semantics
    * change, which is exactly what this row proves. */
  val qTextSearchSql: String = s"""
    WITH tf AS (
      SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
      WHERE len(w) BETWEEN 2 AND 12 GROUP BY doc_id, w)
    SELECT a.doc_id, a.tf AS tf_a, b.tf AS tf_b, a.tf + b.tf AS score
    FROM tf a JOIN tf b ON a.doc_id = b.doc_id
    WHERE a.term = '${SearchTerms._1}' AND b.term = '${SearchTerms._2}'
    ORDER BY score DESC, a.doc_id LIMIT 20
  """.trim

  // ---- BPE tokenizer training ------------------------------------------

  private val BpeIters = 8
  private val BpeVocab = 300

  /** Distributed BPE tokenizer training (arXiv:1508.07909): learn the
    * top-[[BpeIters]] merge rules from corpus word frequencies.
    *
    * Each iteration counts adjacent-symbol pairs over the word-
    * frequency table (explode + partial+final agg — O(vocab), the
    * corpus is scanned exactly once up front), elects the most
    * frequent pair (ties broken lexicographically, so the learned
    * table is deterministic), and re-segments every word by merging
    * that pair. The merge table — the model — is the O(#iterations)
    * driver state this op exists to produce, exactly like k-means
    * centroids; the corpus itself never leaves the cluster.
    *
    * Cross-engine representation: a word is its symbols each PREFIXED
    * with '~' plus a trailing sentinel ("the" -> "~t~h~e~_~", '_' =
    * end-of-word). Merging pair (x,y) is `replace(seq, "~x~y~",
    * "~xy~")` applied twice: the first leftmost-nonoverlapping pass
    * can skip an occurrence whose leading '~' was consumed by the
    * preceding match, and the second pass always catches it (two
    * skipped occurrences are separated by a pass-1 merge, so they
    * never share a delimiter). Spark and DuckDB `replace` share
    * leftmost-nonoverlapping semantics, so the oracle replays every
    * iteration exactly. (For a symbol merged with ITSELF inside an
    * odd-length run, the pairing parity differs from the pair-list
    * reference algorithm — deterministic and engine-identical, and
    * unreachable for the lexical fixture vocabulary.)
    *
    * Scale posture: word counting is the only corpus-sized stage (one
    * scan, one shuffle of distinct words); the iterations touch the
    * frequency-truncated vocabulary only — a 300-row (real pipeline:
    * ~1M-row) model table kept as a single-partition DataFrame,
    * checkpointed ONCE after the corpus aggregation (so no iteration
    * ever re-scans the corpus); the per-iteration re-segmentations
    * stay as plain lineage — recomputing <=8 chained replaces over
    * the vocab costs microseconds, where a materialization job per
    * iteration costs a scheduler round-trip each. */
  def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    val words = t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")).between(2, 12))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("word")).limit(BpeVocab)
    // The merge iterations touch ONLY the frequency-truncated vocab —
    // O(BpeVocab) = 300 rows, bounded by the limit above regardless of
    // corpus size. That is driver-state-sized by the same argument as
    // k-means centroids, so the loop runs HERE, in plain Scala, over
    // one collected copy: r14's profile showed the Spark-side loop as
    // 22 jobs / 0.64 s job-sum / ~1.5 s wall — pure scheduler
    // round-trips over a 300-row single-partition table. Semantics are
    // replicated operation-for-operation (oracle-hash-identical):
    //  - seq encoding: '~' + each char + '~', '_' sentinel;
    //  - pair counts: adjacent symbol pairs weighted by word cnt
    //    (exact Long sums — same as the old sum("cnt"));
    //  - election: max by (count desc, pair lexicographically asc) —
    //    ASCII-only symbols, so String ordering == UTF8 binary order;
    //  - merge: two leftmost-nonoverlapping replace passes — Java
    //    String.replace shares Spark's / DuckDB's replace semantics.
    val vocab: Array[(String, Long)] = words.collect()
      .map(r => ("~" + r.getString(0).flatMap(c => s"$c~") + "_~",
        r.getLong(1)))
    var seqs = vocab
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to BpeIters) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((seq, cnt) <- seqs) {
        val syms = seq.split('~').filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val p = syms(i) + "~" + syms(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      var bestPair: String = null
      var bestC = Long.MinValue
      counts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && p.compareTo(bestPair) < 0)) {
          bestPair = p; bestC = c
        }
      }
      require(bestPair != null, "bpe_train: empty pair table")
      val Array(lhs, rhs) = bestPair.split("~")
      val merged = lhs + rhs
      merges += ((step, lhs, rhs, merged, bestC))
      val pat = s"~$bestPair~"
      val rep = s"~$merged~"
      seqs = seqs.map { case (seq, cnt) =>
        (seq.replace(pat, rep).replace(pat, rep), cnt) }
    }
    import s.implicits._
    merges.result().toDF("step", "lhs", "rhs", "merged", "freq")
      .orderBy("step")
  }


  /** The trained artifact [[qBpeTrain]] produces on the sf0.01
    * fixture, pinned for [[qBpeEncode]] the way the quality
    * classifier pins its weights: a real pipeline trains once and
    * ships the merge table with the tokenizer. */
  private val BpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "e" -> "_", "n" -> "_", "er" -> "_",
    "o" -> "w", "ow" -> "_", "o" -> "r", "s" -> "t")

  /** BPE tokenization of the corpus with the pinned [[BpeMerges]]
    * table — the downstream map stage of [[qBpeTrain]]: per-language
    * token counts and fertility (tokens per 100 00 words, an integer
    * so the per-group sums and the ratio are order-independent and
    * oracle-exact).
    *
    * The whole document is encoded in ONE string pass: words become
    * '~'-prefixed symbol runs terminated by the '_' marker
    * ("the cat" -> "~t~h~e~_~c~a~t~_~"), then the 8 merges apply as
    * chained two-pass replaces in training order. Sequential
    * whole-string application equals the reference rank-priority
    * algorithm: a merge only fuses neighbors, never deletes a symbol,
    * so a lower-rank pair's adjacency can never be newly created by a
    * later merge. Everything is codegen'd string expressions — one
    * scan, one partial+final aggregation, no explode. */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"),
        expr(s"size(filter(split($sparkEnc, '~'), x -> x != ''))")
          .cast("long").as("toks"),
        expr(s"size(filter(split($sparkNorm, '#'), x -> x != ''))")
          .cast("long").as("words"))
      .groupBy("lang")
      .agg(sum("words").as("n_words"), sum("toks").as("n_tokens"),
        expr("(10000 * sum(toks)) DIV sum(words)").as("fert_bp"))
      .orderBy("lang")

  /** lower(text) with edge punctuation stripped and runs of
    * non-letters collapsed to one '#' word delimiter (Spark SQL
    * dialect; Java regex). */
  private val sparkNorm: String =
    "regexp_replace(regexp_replace(lower(text), '^[^a-z]+|[^a-z]+$', '')," +
      " '[^a-z]+', '#')"

  /** Full-document BPE encoding: '~'-interspersed symbols, '#'
    * delimiters rewritten to the '_' end-of-word marker, then the
    * pinned merges in training order, each as the two-pass replace
    * proven in [[qBpeTrain]]. Built textually so the identical chain
    * reads back in the plan and the oracle. */
  private val sparkEnc: String = {
    val base = s"replace('~' || regexp_replace($sparkNorm || '#'," +
      " '(.)', '$1~'), '#~', '_~')"
    BpeMerges.foldLeft(base) { case (acc, (l, r)) =>
      s"replace(replace($acc, '~$l~$r~', '~$l$r~'), '~$l~$r~', '~$l$r~')"
    }
  }

  val qBpeEncodeSql: String = {
    val norm =
      "regexp_replace(regexp_replace(lower(text), '^[^a-z]+|[^a-z]+$', '')," +
        " '[^a-z]+', '#', 'g')"
    val base = s"replace('~' || regexp_replace($norm || '#'," +
      " '(.)', '\\1~', 'g'), '#~', '_~')"
    val enc = BpeMerges.foldLeft(base) { case (acc, (l, r)) =>
      s"replace(replace($acc, '~$l~$r~', '~$l$r~'), '~$l~$r~', '~$l$r~')"
    }
    s"""WITH enc AS MATERIALIZED (
       |  SELECT lang,
       |    CAST(len(list_filter(string_split($enc, '~'),
       |      x -> x <> '')) AS BIGINT) AS toks,
       |    CAST(len(list_filter(string_split($norm, '#'),
       |      x -> x <> '')) AS BIGINT) AS words
       |  FROM documents)
       |SELECT lang, CAST(SUM(words) AS BIGINT) AS n_words,
       |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
       |  CAST((10000 * SUM(toks)) // SUM(words) AS BIGINT) AS fert_bp
       |FROM enc GROUP BY lang ORDER BY lang
       |""".stripMargin
  }


  /** The oracle replays all [[BpeIters]] iterations with MATERIALIZED
    * CTEs (each layer's best-pair scalar is referenced several times;
    * inlined CTEs would re-expand the whole chain exponentially). */
  val qBpeTrainSql: String = {
    def layer(i: Int): String = {
      val prev = s"w${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT pr AS pair, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |    SELECT unnest(list_transform(range(1, len(syms)),
         |                  i -> syms[i] || '~' || syms[i+1])) AS pr, cnt
         |    FROM (SELECT list_filter(string_split(seq, '~'),
         |                             x -> x <> '') AS syms, cnt
         |          FROM $prev) ) GROUP BY pr),
         |b$i AS MATERIALIZED (
         |  SELECT pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1),
         |w$i AS MATERIALIZED (SELECT word, cnt,
         |  replace(replace(seq,
         |      '~' || (SELECT pair FROM b$i) || '~',
         |      '~' || replace((SELECT pair FROM b$i), '~', '') || '~'),
         |    '~' || (SELECT pair FROM b$i) || '~',
         |    '~' || replace((SELECT pair FROM b$i), '~', '') || '~') AS seq
         |  FROM $prev)""".stripMargin
    }
    val layers = (1 to BpeIters).map(layer).mkString(",\n")
    val finals = (1 to BpeIters).map { i =>
      s"""SELECT $i AS step,
         |  string_split((SELECT pair FROM b$i), '~')[1] AS lhs,
         |  string_split((SELECT pair FROM b$i), '~')[2] AS rhs,
         |  replace((SELECT pair FROM b$i), '~', '') AS merged,
         |  (SELECT c FROM b$i) AS freq""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
       |    FROM documents)
       |  WHERE len(w) BETWEEN 2 AND 12 GROUP BY w
       |  ORDER BY cnt DESC, w LIMIT $BpeVocab),
       |w0 AS MATERIALIZED (SELECT word, cnt,
       |  '~' || regexp_replace(word, '(.)', '\\1~', 'g') || '_~' AS seq
       |  FROM words),
       |$layers
       |SELECT * FROM ($finals) ORDER BY step
       |""".stripMargin
  }

  /** Character-diversity quality gate (the Gopher/C4 rule family):
    * per document, the character Simpson diversity index
    * 1 − Σ n_c²/n² (low = repeated-character junk, near-max = uniform
    * noise), the distinct-character count, and the exact mean word
    * length — three of the standard cheap gibberish signals — plus
    * the keep decision. Complements [[qQualityRepetition]] (word/
    * n-gram level) at the character level.
    *
    * Exactness: Σ n_c² and the space count are integers; each derived
    * metric is ONE double division of exact integers, so the DuckDB
    * replay is bit-identical (no ln — Shannon entropy would not
    * hash-check; Simpson is the collision-probability form of
    * diversity and needs only integer sums).
    *
    * Scale: explode to (doc, char) pairs — bounded by |alphabet| per
    * doc after the first partial agg — then two hash aggregations.
    * No windows, no driver state.
    *
    * Unicode contract (oracle-checked INCLUDING the astral plane):
    * the split pattern `(?s)(?<=.)` cuts after every CODE POINT —
    * Java regex `.` consumes a full surrogate pair — matching DuckDB's
    * `string_split(text, '')` exactly, where the naive `split(text,
    * "")` would cut UTF-16 code units and halve non-BMP characters.
    * A synthetic probe row (doc_id −1, emoji + ASCII mix) rides the
    * corpus through BOTH engines so the code-point agreement is
    * hash-verified every round, not assumed from the ASCII fixture. */
  def qCharDiversity(s: SparkSession, dir: String): DataFrame = {
    val probe = s.range(1).select(lit(-1L).as("doc_id"),
      lit("ab 😀😀🎉 cd").as("text"))
    t(s, dir, "documents")
      .filter(col("doc_id") < 100 && col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .unionByName(probe)
      .select(col("doc_id"),
        explode(split(col("text"), "(?s)(?<=.)")).as("ch"))
      .filter(col("ch") =!= "") // guard the empty-string document
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
      .groupBy("doc_id").agg(
        sum("nc").as("n"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("nc") * col("nc")).as("sq"),
        sum(when(col("ch") === " ", col("nc")).otherwise(0L)).as("n_sp"))
      .select(col("doc_id"), col("n").as("n_chars"),
        col("n_distinct_chars"),
        (lit(1.0) - col("sq").cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("simpson"),
        ((col("n") - col("n_sp")).cast(DoubleType) /
          (col("n_sp") + 1L).cast(DoubleType)).as("mean_word_len"))
      .withColumn("kept",
        col("simpson") >= 0.8 && col("mean_word_len").between(3.0, 10.0))
      .orderBy("doc_id")
  }

  val qCharDiversitySql: String = """
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 100 AND text IS NOT NULL
      UNION ALL SELECT -1 AS doc_id,
        'ab ' || chr(128512) || chr(128512) || chr(127881) || ' cd' AS text),
    ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM docs),
    per AS (SELECT doc_id, ch, COUNT(*) AS nc FROM ch GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, SUM(nc) AS n, COUNT(*) AS n_distinct_chars,
        SUM(nc * nc) AS sq,
        SUM(CASE WHEN ch = ' ' THEN nc ELSE 0 END) AS n_sp
      FROM per GROUP BY doc_id)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
      CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
      1.0 - CAST(sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS simpson,
      CAST(n - n_sp AS DOUBLE) / CAST(n_sp + 1 AS DOUBLE) AS mean_word_len,
      (1.0 - CAST(sq AS DOUBLE) / CAST(n * n AS DOUBLE)) >= 0.8
        AND CAST(n - n_sp AS DOUBLE) / CAST(n_sp + 1 AS DOUBLE)
          BETWEEN 3.0 AND 10.0 AS kept
    FROM agg ORDER BY doc_id
  """.trim

  /** Hashing-trick featurization (Weinberger et al. 2009, "Feature
    * Hashing for Large Scale Multitask Learning"): each token lands
    * in bucket md5(token)·16bits mod 64 with a ±1 sign from the next
    * md5 nibble's parity — the signed sum per (doc, bucket) is an
    * unbiased estimator of the inner product in the original
    * vocabulary space, with NO vocabulary to build, broadcast, or
    * version. This is the featurizer that survives 100 TB: per-row
    * codegen'd hashing (zero vocabulary state, zero extra scan —
    * compare [[qVocabOov]], which must first elect a dictionary), one
    * partial+final aggregation; md5-portable, so the oracle replays
    * every bucket and sign bit-for-bit. */
  def qFeatureHash(s: SparkSession, dir: String): DataFrame = {
    val term = col("term")
    val bucket =
      conv(substring(md5(term), 1, 4), 16, 10).cast(LongType) % 64
    val sgn = when(
      conv(substring(md5(term), 5, 1), 16, 10).cast(LongType) % 2 === 0,
      lit(1L)).otherwise(lit(-1L))
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .select(col("doc_id"), bucket.as("bucket"), sgn.as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("fval"), count(lit(1)).as("n_terms"))
      .orderBy("doc_id", "bucket")
  }

  val qFeatureHashSql: String = {
    def hex(pos: Int, of: String) =
      s"(strpos('0123456789abcdef', substr(md5($of), $pos, 1)) - 1)"
    val b16 = (1 to 4).map(i =>
      s"${hex(i, "term")} * ${math.pow(16, 4 - i).toLong}")
      .mkString("(", " + ", ")")
    s"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id < 100),
    h AS (
      SELECT doc_id, $b16 % 64 AS bucket,
        CASE WHEN ${hex(5, "term")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM tok)
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
      CAST(SUM(sgn) AS BIGINT) AS fval, COUNT(*) AS n_terms
    FROM h GROUP BY 1, 2 ORDER BY 1, 2
    """.trim
  }
}
