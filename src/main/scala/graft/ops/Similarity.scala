package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` fixture (builder brief;
  * SURVEY §7.6 milestone 4): brute-force cosine top-k as the exact
  * baseline, and an IVF (inverted-file) variant as the scale path.
  *
  * Scale posture: the query set is small and broadcast; candidates
  * stream through a codegen'd cosine expression; top-k is two-phase
  * (per-partition top-k pruning, then a final window over <= k·P
  * survivors) so no single reducer ever sees all N scored rows. IVF
  * additionally prunes candidates to the probed coarse cells.
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Hot path: the native codegen'd kernel (float vectors). */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.cosine_sim(a, b)

  /** Per-centroid scores: dot products against UNIT-normalized
    * centroids via the native [[graft.functions.VectorDots]] kernel.
    * cosine(c, e) = dot(c/|c|, e) / |e| and |e| is constant within a
    * row, so argmax-cell and per-query probe ranking are identical to
    * ranking by cosine — without recomputing |e| per centroid or
    * walking the array through interpreted lambdas (the composed
    * zip_with/aggregate form this replaces was ~30 array walks/row).
    * Caveat: for a zero-norm embedding or centroid, cosine is NaN
    * (sorts greatest, deterministically winning array_max) while the
    * dot form yields 0.0 — cell assignment can differ on such rows.
    * Fixture embeddings are non-degenerate, so rankings agree there.
    *
    * The centroid matrix rides a `SparkContext.broadcast` (r7; was a
    * `typedlit` plan literal): plan/task/codegen size is independent
    * of k, so the documented adaptive-cells k = 100,000 ceiling is
    * actually runnable. Same kernel loop → dots stay bit-equal
    * (KernelsSpec pins parity at k = 10,000). */
  private def centroidScores(s: SparkSession, cents: Seq[Seq[Double]],
      vec: Column): Column =
    graft.functions.vector_dots_bcast(
      s.sparkContext.broadcast(cents.map(c => normalize(c).toArray).toArray),
      vec)

  private def normalize(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Two-phase top-k per query: local (qid, partition) window prunes
    * to k rows per partition, then the global per-qid window ranks
    * only k·P survivors — the distributed top-k pattern. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val wLocal = Window.partitionBy(col("qid"), col("part"))
      .orderBy(col("cos_sim").desc, col("cid").asc)
    val wGlobal = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("cid").asc)
    scored
      .withColumn("part", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k)
      .withColumn("rn", row_number().over(wGlobal))
      .filter(col("rn") <= k)
      .select(col("qid"), col("rn"), col("cid"))
      .orderBy("qid", "rn")
  }

  /** Brute-force cosine top-5 for 10 query vectors: the exact
    * baseline. Queries are broadcast (tiny side), candidates stream. */
  def qKnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qe"), col("ce")))
    topK(scored, 5)
  }

  val qKnnBruteSql: String = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
    s AS (SELECT qid, cid,
      list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
      (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
       sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS cos_sim
      FROM q JOIN c ON qid <> cid),
    r AS (SELECT qid, cid,
      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn FROM s)
    SELECT qid, rn, cid FROM r WHERE rn <= 5 ORDER BY qid, rn
  """.trim

  /** Radius (range) search — the vector-search API beside top-k: ALL
    * candidates within cosine >= τ of each query, not a fixed count.
    * Exact form: query set broadcast against the corpus scan, native
    * [[graft.functions.CosineSimilarity]] kernel (bit-parity with the
    * oracle's sequential fold — CosineSpec — which is what makes a
    * τ-threshold membership test hash-comparable at all), threshold as
    * a codegen'd filter. Top-k answers "the best k even if poor";
    * radius answers "everything actually similar" — the dedup/retrieval
    * primitive where match COUNT is the signal. Scale path: the same
    * threshold filter composes over the LSH bucket candidates
    * (`dedup_embed`) or IVF probe candidates (`knn_ivf`) instead of
    * the full cross — this query pins the exact semantics those
    * approximations are graded against. */
  def qKnnRange(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qe"), col("ce")))
      .filter(col("cos_sim") >= 0.35)
      // fixed-point render, NOT round(): Spark rounds the exact decimal
      // expansion HALF_UP while DuckDB's ROUND goes through a float
      // scale-multiply — near a 5e-9 boundary they can disagree. floor
      // of the same double multiply is bit-identical on both engines
      // (the qQuantize convention).
      .select(col("qid"), col("cid"),
        floor(col("cos_sim") * 100000000L).cast("long").as("cos_e8"))
      .orderBy("qid", "cid")
  }

  val qKnnRangeSql: String = """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings),
    s AS (SELECT qid, cid,
      list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
      (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
       sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS cos_sim
      FROM q JOIN c ON qid <> cid)
    SELECT qid, cid,
      CAST(FLOOR(cos_sim * 100000000) AS BIGINT) AS cos_e8
    FROM s WHERE cos_sim >= 0.35 ORDER BY qid, cid
  """.trim

  /** Group mean-pooling of embeddings — the chunk→document (or
    * document→class prototype) pooling step every embedding pipeline
    * runs between encoding and indexing: element-wise mean per
    * `label` group, computed with the engine's exact-decimal Lloyd
    * convention (sum float→DECIMAL(28,12), ONE double division by the
    * count — order-independent at any partition count, where a double
    * sum would drift per reduction order). Output renders through the
    * `embed_project` fixed-point convention so the vector
    * hash-checks. Scale shape: posexplode to (label, pos) then ONE
    * partial+final agg — n·d rows shuffled as (int, int, decimal)
    * triples, never whole vectors; the per-label re-assembly sorts
    * struct(pos, m) so collect_list arrival order cannot matter. */
  def qEmbedPool(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 12))).cast(DoubleType) /
        count(lit(1))).as("m"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vectors"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          pm => floor(pm.getField("m") * lit(10000.0) + lit(0.5))
            .cast(LongType).cast(StringType)), ",").as("pooled"))
      .orderBy("label")
  }

  val qEmbedPoolSql: String = """
    WITH x AS (
      SELECT label, i AS pos, embedding[i]::DOUBLE AS v
      FROM embeddings, unnest(range(1, len(embedding)+1)) t(i)),
    m AS (
      SELECT label, pos,
        CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m,
        COUNT(*) AS n
      FROM x GROUP BY 1, 2)
    SELECT label, MAX(n) AS n_vectors,
      string_agg(CAST(CAST(FLOOR(m * 10000.0 + 0.5) AS BIGINT) AS VARCHAR),
        ',' ORDER BY pos) AS pooled
    FROM m GROUP BY label ORDER BY label
  """.trim

  /** Per-dimension whitening (feature standardization): subtract the
    * corpus mean and divide by the corpus stddev, per coordinate —
    * the preprocessing step between encoding and quantization/ANN
    * that stops high-variance dimensions from dominating L2/cosine.
    * Statistics use the exact-decimal convention (sum float→
    * DECIMAL(28,12), one double division — order-independent at any
    * partition count); variance = E[x²]−E[x]² from the two exact
    * sums, floored at 1e-24 so a degenerate constant dimension
    * whitens to 0 instead of dividing by zero. Scale shape: the
    * stats table is d rows (one per dimension) and rides a broadcast
    * back onto the exploded scan — two passes over the corpus, no
    * driver state, no wide shuffle. */
  def qEmbedWhiten(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}
    val ex = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos"), col("col").cast(DoubleType).as("v"))
    val st = ex.groupBy(col("pos")).agg(
        (sum(col("v").cast(DecimalType(28, 12))).cast(DoubleType) /
          count(lit(1))).as("m"),
        (sum((col("v") * col("v")).cast(DecimalType(28, 12))).cast(DoubleType) /
          count(lit(1))).as("ex2"))
      .withColumn("sd",
        sqrt(greatest(col("ex2") - col("m") * col("m"), lit(1e-24))))
    ex.filter(col("vec_id") < 200)
      .join(broadcast(st), Seq("pos"))
      .withColumn("w", (col("v") - col("m")) / col("sd"))
      .groupBy(col("vec_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        pw => floor(pw.getField("w") * lit(10000.0) + lit(0.5))
          .cast(LongType).cast(StringType)), ",").as("whitened"))
      .orderBy("vec_id")
  }

  val qEmbedWhitenSql: String = """
    WITH x AS (
      SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding)+1)) t(i)),
    st AS (
      SELECT pos,
        CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m,
        CAST(SUM(CAST(v*v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS ex2
      FROM x GROUP BY pos),
    w AS (
      SELECT x.vec_id, x.pos,
        (x.v - st.m) / sqrt(GREATEST(st.ex2 - st.m * st.m, 1e-24)) AS w
      FROM x JOIN st USING (pos) WHERE x.vec_id < 200)
    SELECT vec_id,
      string_agg(CAST(CAST(FLOOR(w * 10000.0 + 0.5) AS BIGINT) AS VARCHAR),
        ',' ORDER BY pos) AS whitened
    FROM w GROUP BY vec_id ORDER BY vec_id
  """.trim

  // ---- MMR diversified retrieval ---------------------------------------

  private val MmrPool = 20
  private val MmrK = 10

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) — the diversification stage between retrieval and
    * consumption: from the top-[[MmrPool]] cosine candidates of the
    * `vec_id = 0` query, greedily select [[MmrK]] maximizing
    * λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) with λ = 0.5 — each pick
    * trades relevance against redundancy with what is already picked,
    * so near-duplicate results can't crowd the answer set.
    *
    * Execution shape — and why a driver loop is CORRECT here: the
    * candidate POOL is O(k) by construction (a rerank stage consumes a
    * retrieval stage's top-k, never the corpus). All O(corpus) work —
    * scoring + two-phase top-pool, then the pool×pool cosine matrix —
    * runs distributed with the native kernel; the greedy then walks
    * pool²=400 driver-local doubles, the same O(k²) driver bound as
    * the k-means seed collects. Greedy selection is inherently
    * sequential (pick i+1 depends on picks 1..i) — spending cluster
    * jobs on 20-row scans would be the anti-pattern.
    *
    * Cross-engine contract: rel and sim come from the bit-parity
    * cosine kernel (CosineSpec), the score is two multiplies and a
    * subtract in fixed order, ties break by cid, and the emitted score
    * is floor-quantized to e12 — the DuckDB oracle replays the greedy
    * EXACTLY via a recursive CTE carrying the selected list. */
  def qSearchMmr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    // materialize the 20-row pool ONCE: the three consumers below
    // (rels collect + both sides of the sims self-join) would each
    // re-run the O(corpus) scoring scan otherwise
    val pool = e.join(broadcast(q), col("vec_id") =!= 0)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        cosine(col("qe"), col("embedding")).as("rel"))
      .orderBy(col("rel").desc, col("cid").asc).limit(MmrPool)
      .localCheckpoint(true)
    val a = pool.select(col("cid").as("d1"), col("ce").as("e1"))
    val b = pool.select(col("cid").as("d2"), col("ce").as("e2"))
    val rels = pool.select(col("cid"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val simM = a.join(b, col("d1") =!= col("d2"))
      .select(col("d1"), col("d2"), cosine(col("e1"), col("e2")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    var selected = Vector.empty[Long]
    var picked = Vector.empty[(Int, Long, Double)]
    var remaining = rels.keySet
    for (step <- 1 to MmrK) {
      val (c, score) = remaining.toSeq.map { c =>
        val pen =
          if (selected.isEmpty) 0.0 else selected.map(x => simM((c, x))).max
        (c, 0.5 * rels(c) - 0.5 * pen)
      }.minBy { case (c, sc) => (-sc, c) }
      selected :+= c
      picked :+= ((step, c, score))
      remaining -= c
    }
    picked
      .map { case (r, c, sc) => (r, c, math.floor(sc * 1e12).toLong) }
      .toDF("rank", "cid", "score_e12")
      .orderBy("rank")
  }

  val qSearchMmrSql: String = s"""
    WITH RECURSIVE
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id AS cid, embedding AS ce,
        list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS rel
      FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
    cand AS (
      SELECT cid, ce, rel FROM scored ORDER BY rel DESC, cid LIMIT $MmrPool),
    sims AS (
      SELECT a.cid AS d1, b.cid AS d2,
        list_sum(list_transform(range(1, len(a.ce)+1), i -> a.ce[i]::DOUBLE * b.ce[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len(a.ce)+1), i -> a.ce[i]::DOUBLE * a.ce[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len(b.ce)+1), i -> b.ce[i]::DOUBLE * b.ce[i]::DOUBLE)))) AS sim
      FROM cand a JOIN cand b ON a.cid <> b.cid),
    sel AS (
      SELECT 1 AS step,
        (SELECT cid FROM cand ORDER BY rel DESC, cid LIMIT 1) AS picked,
        (SELECT 0.5 * rel FROM cand ORDER BY rel DESC, cid LIMIT 1) AS score,
        [(SELECT cid FROM cand ORDER BY rel DESC, cid LIMIT 1)] AS sel_list
      UNION ALL
      SELECT step + 1, nxt.cid, nxt.score, list_append(sel_list, nxt.cid)
      FROM sel, LATERAL (
        SELECT c.cid,
          0.5 * c.rel - 0.5 * (SELECT MAX(s.sim) FROM sims s
            WHERE s.d1 = c.cid AND list_contains(sel.sel_list, s.d2)) AS score
        FROM cand c
        WHERE NOT list_contains(sel.sel_list, c.cid)
        ORDER BY score DESC, c.cid LIMIT 1) nxt
      WHERE step < $MmrK)
    SELECT CAST(step AS INT) AS rank, picked AS cid,
      CAST(FLOOR(score * 1000000000000) AS BIGINT) AS score_e12
    FROM sel ORDER BY rank
  """.trim

  /** One deterministic Lloyd refinement: assign to max-cosine cell,
    * recompute per-cell means through exact decimal sums (the answer
    * is independent of partitioning — double sums would not be), pull
    * back O(k·d) values. Cells that lost all members keep their seed. */
  /** The per-cell decimal-exact Lloyd means as ONE array row per cell
    * — `array_agg(struct(pos, m)) → sort → array` folds the k·d
    * scalar rows into k rows BEFORE they cross to the driver, so at
    * the documented k=1e5 / d=64 cap the collect moves 1e5 Rows, not
    * 6.4M. Exposed for the CosineSpec O(k)-not-O(k·d) assert. */
  private[graft] def lloydMeans(e: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val scores = centroidScores(e.sparkSession, cents, col("embedding"))
    e.withColumn("cell",
        array_position(scores, array_max(scores)).cast("int"))
      .select(col("cell"), posexplode(col("embedding")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 12))).cast(DoubleType) /
        count(lit(1))).as("m"))
      // pos is unique within a cell, so array_sort on struct(pos, m)
      // orders deterministically by pos regardless of collect_list's
      // arrival order
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        pm => pm.getField("m")).as("mv"))
  }

  private def refineCentroids(e: DataFrame,
      cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
    val means = lloydMeans(e, cents).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
    cents.indices.map(i => means.getOrElse(i + 1, cents(i)))
  }

  /** IVF coarse cells: k-means centroids (vec_id 0..9 seeds + one
    * Lloyd pass — deterministic; driver-side state is O(k·d), never
    * O(N)). Every vector is assigned to its max-cosine cell; queries
    * probe the `nprobe` nearest cells and score only those cells'
    * members. nprobe = k (all cells) recovers the brute-force answer
    * exactly (PipelineSpec pins this). */
  /** Shared IVF/k-means build step: deterministic vec_id<10 seeds,
    * one decimal-exact Lloyd refinement, per-row centroid scores —
    * the single source of the seed rule and assignment tie-break that
    * every cell-assignment consumer ([[knnIvf]], [[qKmeansCluster]])
    * must agree on, or their shared DuckDB replay (ivfReplaySql)
    * silently diverges from one of them. */
  private def lloydScores(s: SparkSession, dir: String)
      : (DataFrame, Column) = {
    val e = t(s, dir, "embeddings")
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < 10)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cents = refineCentroids(e, seeds)
    (e, centroidScores(s, cents, col("embedding")))
  }

  def knnIvf(s: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val (e, scores) = lloydScores(s, dir)
    // the assignment (a vector_dots pass over every embedding) feeds
    // BOTH the probe selection and the candidate side — materialize it
    // once instead of recomputing per consumer. This is the standard
    // IVF build step: at scale the (id, cell, embedding) table is the
    // persisted index, not a per-query recomputation.
    val assigned = e
      .withColumn("cell",
        array_position(scores, array_max(scores)).cast("int"))
      .localCheckpoint(true)
    val probes = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        posexplode(scores))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("col").desc, col("pos").asc)))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qe"), (col("pos") + 1).cast("int").as("cell"))
    val scored = assigned
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qe"), col("ce")))
    topK(scored, 5)
  }

  /** Declared IVF query: nprobe=3 of 10 cells — the approximate scale
    * path (cell assignment is engine-local → rows-only driver check;
    * PipelineSpec pins nprobe=all == brute force and recall@5 > 0). */
  def qKnnIvf(s: SparkSession, dir: String): DataFrame = knnIvf(s, dir, 3)

  /** IVF with nprobe = k (all 10 cells probed): the candidate set is
    * every vector, so the answer provably equals the brute-force
    * top-k — which gives the IVF machinery (train, assign, probe,
    * cell-keyed candidate join) a full exact-value oracle instead of
    * the rows-only check the nprobe<k approximation gets. */
  def qKnnIvfExact(s: SparkSession, dir: String): DataFrame =
    knnIvf(s, dir, 10)

  /** K-means clustering as a first-class operator (r12) — the embedding
    * partitioner every corpus-curation recipe leans on (domain
    * discovery, cluster-balanced sampling, SemDeDup's cell stage):
    * deterministic seeds (vec_id < 10), ONE decimal-exact Lloyd
    * refinement ([[lloydMeans]]: per-cell means through DECIMAL(28,12)
    * sums, so the centroids are independent of partitioning), final
    * max-cosine assignment, and a per-cluster profile in EXACT
    * integers (size, id-sum, id-range). Unlike `knn_ivf_exact` —
    * whose oracle proves only the probe-union top-k — this row's
    * oracle replays seed → assign → Lloyd mean → reassign
    * float-op-for-float-op in DuckDB, so the CLUSTERING itself is
    * hash-gated, not just a downstream answer. Scale: assignment is
    * one broadcast-kernel pass (O(k·d) driver state), means are one
    * exploded agg — the same 100 TB posture as the IVF build step. */
  def qKmeansCluster(s: SparkSession, dir: String): DataFrame = {
    val (e, scores) = lloydScores(s, dir)
    e.withColumn("cell", array_position(scores, array_max(scores)))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        sum(col("vec_id")).as("sum_ids"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))
      .orderBy("cell")
  }

  val qKmeansClusterSql: String = (ivfReplaySql("vec_id < 10") + """
    SELECT CAST(a1.cell AS BIGINT) AS cell, COUNT(*) AS n_members,
      CAST(SUM(a1.vec_id) AS BIGINT) AS sum_ids,
      MIN(a1.vec_id) AS min_id, MAX(a1.vec_id) AS max_id
    FROM a1 GROUP BY a1.cell ORDER BY cell
  """).trim

  // ---- persisted IVF index: build once / query many ---------------------

  /** Build the IVF index AS A LAKEHOUSE TABLE — the 100 TB ANN shape:
    * train once, persist, and serve every subsequent query from the
    * stored index instead of re-training per query (what [[knnIvf]]
    * does per call is the right demo shape but the wrong production
    * shape). Two tables under `root`:
    *
    *  - `vectors`: the (vec_id, embedding, cell) assignment,
    *    range-clustered on `cell` and committed to a [[graft.sources.TableLog]]
    *    with per-file `cell` stats — so a probe of a few cells prunes
    *    FILES from the log metadata before parquet even sees a footer,
    *    and the pushed `cell IN (...)` filter prunes row groups within
    *    survivors.
    *  - `centroids`: the k×d coarse matrix (cell, centroid) — O(k·d)
    *    rows, read back at query time, never retrained.
    *
    * Training matches [[knnIvf]] exactly: deterministic min-id seeds +
    * one decimal-exact Lloyd pass, assignment by max dot against
    * unit-normalized centroids (broadcast kernel). */
  def buildIvfIndex(s: SparkSession, dir: String, root: String): Unit = {
    val e = t(s, dir, "embeddings")
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < 10)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cents = refineCentroids(e, seeds)
    val scores = centroidScores(s, cents, col("embedding"))
    val assigned = e
      .withColumn("cell",
        array_position(scores, array_max(scores)).cast("long"))
      .repartitionByRange(8, col("cell"))
    // vectors append and centroid write are independent outputs: the
    // O(k·d) centroid write back-fills the append's tail (§2.6)
    inParallel(
      () => graft.sources.TableLog.append(s, s"$root/vectors", assigned,
        statsCols = Seq("cell")),
      () => {
        val sp = s; import sp.implicits._
        cents.zipWithIndex.map { case (c, i) => ((i + 1).toLong, c) }
          .toDF("cell", "centroid")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
      })
  }

  /** Query a persisted IVF index: load the O(k·d) centroids, rank the
    * `nprobe` best cells per query, and score ONLY the probed cells'
    * members — candidates come off the `vectors` TableLog snapshot
    * filtered to the probed-cell union (log-stats file skip + pushed
    * IN row-group pruning), joined per-query on `cell` against the
    * broadcast probe set. Candidate scoring is exact cosine; only
    * candidate SELECTION is approximate, so nprobe = k provably
    * recovers the brute-force answer — which is what gives the
    * persisted path its EXACT oracle (`knn_ivf_persisted`). */
  def queryIvfIndex(s: SparkSession, root: String, queries: DataFrame,
      nprobe: Int, topk: Int = 5): DataFrame = {
    val centRows = s.read.parquet(s"$root/centroids")
      .orderBy("cell").collect()
    val cents: Seq[Seq[Double]] =
      centRows.map(_.getSeq[Double](1).toSeq).toSeq
    val scores = centroidScores(s, cents, col("qe"))
    val probes = queries
      .select(col("qid"), col("qe"), posexplode(scores))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("col").desc, col("pos").asc)))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qe"), (col("pos") + 1).cast("long").as("cell"))
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq // <= #queries * nprobe, tiny
    val cand = graft.sources.TableLog.snapshot(s, s"$root/vectors")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("cell"))
    val scored = cand.join(broadcast(probes), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qe"), col("ce")))
    topK(scored, topk)
  }

  /** Declared persisted-index query: build the index (train + assign +
    * commit), then answer top-5 for the 10 query vectors with ALL
    * cells probed — the exact-recovery configuration, so the oracle is
    * the same brute-force SQL as `knn_brute`: one row proves the whole
    * persist→load→probe→prune→score path end-to-end. */
  def qKnnIvfPersisted(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/ivf_index"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    buildIvfIndex(s, dir, root)
    val queries = graft.sources.TableLog.snapshot(s, s"$root/vectors")
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    queryIvfIndex(s, root, queries, nprobe = 10)
  }

  /** Random projection (Johnson–Lindenstrauss) of the 64-dim
    * embeddings to 8 dims — the dimensionality-reduction step a
    * vector pipeline runs before LSH bucketing or a cheap pre-filter
    * index. The projection matrix is NOT data-dependent: entry
    * W[r][c] is an integer in [-1000, 1000] derived from
    * md5("w:r:c"), so the matrix is reproducible from the salt alone
    * on any engine (the same md5-portable-weights idiom as
    * `quality_classify`) and the DuckDB oracle replays the projection
    * bit-for-bit. y[r] = Σ_c W[r][c]·x[c] folds left in index order —
    * identical IEEE doubles both engines — rendered through the
    * fixed-point `floor(x·1e4 + 0.5)` convention.
    *
    * Scale posture: per-row codegen'd higher-order fns over a
    * driver-computed 8×64 literal (512 ints — constant, unlike the
    * data-derived k·d centroid matrices that ride broadcasts); zero
    * shuffle at any corpus size. */
  def qEmbedProject(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(r: Int, c: Int): Long = {
      val hex = md.digest(s"w:$r:$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    val mat: Seq[Seq[Long]] =
      (0 until 8).map(r => (0 until 64).map(c => w(r, c)).toSeq)
    val matCol = typedlit(mat)
    val d = col("d")
    val projected = transform(sequence(lit(0), lit(7)), r =>
      aggregate(sequence(lit(0), lit(63)), lit(0.0), (acc, c) =>
        acc + element_at(element_at(matCol, r + 1), c + 1).cast(DoubleType) *
          element_at(d, c + 1)))
    def fx(x: Column): Column =
      floor(x * lit(10000.0) + lit(0.5)).cast(LongType)
    t(s, dir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("d"))
      .select(col("vec_id"),
        array_join(transform(projected, x => fx(x).cast(StringType)), ",")
          .as("projected"),
        fx(aggregate(projected, lit(0.0), (a, y) => a + y * y)).as("sq_norm"))
      .orderBy("vec_id")
  }

  val qEmbedProjectSql: String = """
    WITH a AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
      FROM embeddings WHERE vec_id < 200),
    p AS (
      SELECT vec_id,
        list_transform(range(0, 8), r ->
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(0, 64), c ->
              CAST(CAST('0x' || substr(md5('w:' || r || ':' || c), 1, 3)
                     AS BIGINT) % 2001 - 1000 AS DOUBLE) * d[c+1])),
            (acc, x) -> acc + x)) AS y
      FROM a)
    SELECT vec_id,
      array_to_string(list_transform(y,
        x -> CAST(CAST(floor(x * 10000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',')
        AS projected,
      CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(y, v -> v * v)), (a, b) -> a + b) * 10000.0 + 0.5)
        AS BIGINT) AS sq_norm
    FROM p ORDER BY vec_id
  """.trim

  /** Int8 scalar quantization of embeddings — the compression step of
    * a vector pipeline (4x smaller index, dot products in int8):
    * per-vector scale = max|x| / 127, q_i = floor(x_i/scale + 0.5).
    * Emits a quantization-quality profile per vector: the scale, the
    * quantized extremes, and the total absolute reconstruction error.
    *
    * Determinism across engines: float→double widening and the two
    * divisions are exact IEEE ops; floor(x + 0.5) avoids engine
    * round() mode differences; and the error SUM goes through exact
    * decimals (the dsum convention) rather than float accumulation,
    * so it is order-independent too. Zero-norm vectors are skipped
    * (scale 0 has no quantization). */
  def qQuantize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}
    val e = t(s, dir, "embeddings").filter(col("vec_id") < 100)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("col").cast(DoubleType).as("x"))
    val scaled = e
      .withColumn("mx", max(abs(col("x"))).over(
        Window.partitionBy(col("vec_id"))))
      .filter(col("mx") > 0)
      .withColumn("scale", col("mx") / lit(127.0))
      .withColumn("q",
        floor(col("x") / col("scale") + lit(0.5)).cast(IntegerType))
    scaled
      .withColumn("err", abs(col("x") - col("q") * col("scale")))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        first(col("scale")).as("scale"),
        min(col("q")).as("q_min"),
        max(col("q")).as("q_max"),
        sum(col("err").cast(DecimalType(28, 14))).cast(DoubleType)
          .as("abs_err"))
      .orderBy("vec_id")
  }

  val qQuantizeSql: String = """
    WITH x AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings WHERE vec_id < 100),
    m AS (
      SELECT vec_id, x, MAX(ABS(x)) OVER (PARTITION BY vec_id) AS mx FROM x),
    q AS (
      SELECT vec_id, x, mx / 127.0 AS scale,
        CAST(FLOOR(x / (mx / 127.0) + 0.5) AS INT) AS q
      FROM m WHERE mx > 0)
    SELECT vec_id, COUNT(*) AS n_dims, MIN(scale) AS scale,
      MIN(q) AS q_min, MAX(q) AS q_max,
      CAST(SUM(CAST(ABS(x - q * scale) AS DECIMAL(28,14))) AS DOUBLE) AS abs_err
    FROM q GROUP BY vec_id ORDER BY vec_id
  """.trim

  /** Binary (1-bit) quantization ANN — the memory-floor path past
    * int8 ([[qQuantize]]) and PQ ([[knnPq]]): sign-quantize each
    * 64-dim embedding into two 32-bit words (8 bytes a vector, 32×
    * smaller than float32), rank every candidate per query by HAMMING
    * distance — two XOR + popcount integer ops, no float math at all
    * — keep the top-50, and exact-cosine rerank only those for the
    * final top-5. Sign-bit Hamming approximates angular distance
    * (each bit is a fixed axis-aligned hyperplane test — the
    * degenerate SimHash), so the rerank recovers most of brute-force
    * quality at a candidate-generation cost of 2 popcounts/pair.
    *
    * Scale posture: the quantized index is 8 bytes/vector (a billion
    * vectors fit in 8 GB — broadcastable per executor, or scanned at
    * memory bandwidth), the Hamming top-50 runs the same two-phase
    * per-partition pruning as every top-k here (no single reducer
    * sees N rows), and the float vectors are touched only for the
    * ≤50·Q rerank rows. Everything is integer or
    * IEEE-exactly-reproducible, so DuckDB replays the ENTIRE
    * pipeline — quantization, Hamming ranking, cut, rerank —
    * bit-for-bit: a full exact oracle for an ANN method. */
  def qKnnBinary(s: SparkSession, dir: String): DataFrame = {
    // word(f) = bits f..f+31 as a bigint: bit i set iff embedding
    // dim f+i is strictly positive (0.0 and -0.0 both clear — the
    // only cross-engine-stable convention)
    def word(from: Int): Column = expr(
      s"""aggregate(sequence($from, ${from + 31}), 0L, (acc, i) ->
         |acc + IF(element_at(embedding, i + 1) > 0,
         |shiftleft(1L, i - $from), 0L))""".stripMargin.replace("\n", " "))
    val b = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      word(0).as("lo"), word(32).as("hi"))
    val q = b.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
      col("lo").as("qlo"), col("hi").as("qhi"), col("embedding").as("qe"))
    val c = b.select(col("vec_id").as("cid"),
      col("lo").as("clo"), col("hi").as("chi"), col("embedding").as("ce"))
    val hammed = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("ham",
        expr("bit_count(qlo ^ clo) + bit_count(qhi ^ chi)"))
    // two-phase Hamming top-50 (same shape as topK, ascending)
    val wL = Window.partitionBy(col("qid"), col("part"))
      .orderBy(col("ham").asc, col("cid").asc)
    val wG = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("cid").asc)
    val cand = hammed
      .withColumn("part", spark_partition_id())
      .withColumn("lrn", row_number().over(wL)).filter(col("lrn") <= 50)
      .withColumn("hrn", row_number().over(wG)).filter(col("hrn") <= 50)
    val wR = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("cid").asc)
    cand
      .withColumn("cos_sim", cosine(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(wR)).filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("cid"), col("ham"))
      .orderBy("qid", "rn")
  }

  val qKnnBinarySql: String = """
    WITH b AS (
      SELECT vec_id, embedding,
        CAST(list_sum(list_transform(range(0, 32), i ->
          CASE WHEN embedding[i + 1] > 0
            THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS lo,
        CAST(list_sum(list_transform(range(32, 64), i ->
          CASE WHEN embedding[i + 1] > 0
            THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)) AS BIGINT) AS hi
      FROM embeddings),
    q AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi, embedding AS qe
      FROM b WHERE vec_id < 10),
    c AS (SELECT vec_id AS cid, lo AS clo, hi AS chi, embedding AS ce FROM b),
    h AS (SELECT qid, cid, qe, ce,
        CAST(bit_count(xor(qlo, clo)) + bit_count(xor(qhi, chi)) AS INTEGER) AS ham
      FROM q JOIN c ON qid <> cid),
    cand AS (SELECT qid, cid, qe, ce, ham,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ham ASC, cid ASC) AS hrn
      FROM h),
    rr AS (SELECT qid, cid, ham,
        list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * ce[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len(qe)+1), i -> qe[i]::DOUBLE * qe[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len(ce)+1), i -> ce[i]::DOUBLE * ce[i]::DOUBLE)))) AS cos_sim
      FROM cand WHERE hrn <= 50),
    r AS (SELECT qid, cid, ham,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn
      FROM rr)
    SELECT qid, rn, cid, ham FROM r WHERE rn <= 5 ORDER BY qid, rn
  """.trim

  /** L2 normalization of the embedding column — the mandatory prep
    * step before cosine-as-dot-product ANN. The squared-norm fold is
    * a sequential left fold over the array (`aggregate`), mirrored by
    * DuckDB's `list_reduce`: same operands, same order, each add and
    * the final sqrt IEEE-correctly-rounded → the double is bit-exact
    * across engines (same argument as CosineSpec). Verification
    * re-folds the normalized vector and checks |renorm − 1| < 1e-9.
    * Pure per-row codegen'd expressions: zero shuffle at any scale. */
  def qEmbedNorm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    def sumSq(c: Column): Column = aggregate(c,
      lit(0.0), (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    val withNorm = t(s, dir, "embeddings")
      .withColumn("l2_norm", sqrt(sumSq(col("embedding"))))
      .filter(col("l2_norm") > 0)
    withNorm
      .withColumn("unit", transform(col("embedding"),
        x => x.cast(DoubleType) / col("l2_norm")))
      .select(col("vec_id"), col("l2_norm"),
        (abs(sqrt(sumSq(col("unit"))) - 1.0) < 1e-9).as("is_unit"))
      .orderBy("vec_id")
  }

  // ---- shared PQ machinery ----------------------------------------------
  // ‖c‖²−2c·x per centroid of one codebook, as a kCodes-length array,
  // in ONE keyed-broadcast kernel call: the cost folds into a plain
  // dot product of the augmented plane [-2c…, ‖c‖²] against [x…, 1]
  // (exactly n2 − 2c·x per element), so per-subspace codebooks ride a
  // single broadcast map keyed by subspace index instead of mSub
  // typedlit matrices chained through when()/zip_with — generated
  // code shrinks from O(mSub·kCodes·d) literals to one kernel call,
  // and plan size is codebook-independent (same argument as the
  // centroid broadcast).

  private type PqMats = org.apache.spark.broadcast.Broadcast[
    java.util.HashMap[java.lang.Long, Array[Array[Double]]]]

  private def pqAugMats(cb: Seq[Seq[Seq[Double]]])
      : java.util.HashMap[java.lang.Long, Array[Array[Double]]] = {
    val mats = new java.util.HashMap[java.lang.Long, Array[Array[Double]]]
    cb.indices.foreach { i =>
      mats.put(i.toLong, cb(i).map(c =>
        (c.map(-2.0 * _) :+ c.map(x => x * x).sum).toArray).toArray)
    }
    mats
  }

  /** Augmented input: works for float (raw embedding slices) and
    * double (residual slices) vectors — the kernel accepts both;
    * `floatVec` picks the type of the appended 1 so concat unifies. */
  private def pqCosts(bc: PqMats, key: Column, sv: Column,
      floatVec: Boolean = true): Column = {
    val one: Column = if (floatVec) array(lit(1.0f)) else array(lit(1.0))
    graft.functions.vector_dots_by_key(bc, key, concat(sv, one))
  }

  private def pqArgmin(cost: Column): Column =
    array_position(cost, array_min(cost)).cast("int")

  /** Product quantization (PQ) ANN — the memory-scale path past IVF:
    * each D-dim float vector is encoded as `mSub` one-byte codes (its
    * nearest centroid per subspace), so a 100 TB float corpus becomes
    * a few-hundred-GB code table that fits a fraction of the cluster's
    * RAM; queries score candidates by table lookup (ADC — asymmetric
    * distance computation) without ever touching the original floats.
    *
    * Spark-first shape:
    *  - TRAIN: per-subspace k-means. Seeds = the first `kCodes`
    *    vectors' sub-vectors (deterministic); ONE Lloyd pass runs for
    *    all subspaces in a single distributed job (explode by
    *    subspace index, assign via the codegen'd [[graft.functions.vector_dots]]
    *    kernel, recompute means through exact decimal sums — the same
    *    partition-count-independent convention as IVF). Driver state
    *    is O(mSub·kCodes·d) ≈ 1 k doubles, never O(N).
    *  - ENCODE: pure per-row codegen'd expressions (slice + native
    *    dots + a kCodes-length argmin); zero shuffle. At scale this is
    *    the persisted index build, one map-only pass.
    *  - QUERY: each query precomputes its mSub×kCodes distance TABLE
    *    once (broadcast, tiny); candidate distance = mSub table
    *    lookups — no float math per candidate. Σ_m(‖c‖²−2c·q) omits
    *    the per-query constant Σ_m‖q_m‖², which cannot change any
    *    per-query ranking.
    *
    * argmin uses ‖c‖²−2c·x (monotone in L2 distance); first-minimum
    * tie-break via array_position keeps encoding deterministic.
    * Approximate by design — but fully DETERMINISTIC: seeds are the
    * first-16 rank, the kernel is a sequential fold, `-2c` is an
    * exact power-of-two scaling, Lloyd means are decimal sums, and
    * ADC folds in subspace order — so [[qKnnPqSql]] replays the whole
    * pipeline float-op-for-float-op (r8; the same lift `knn_ivf` and
    * `dedup_semantic` got). PipelineSpec additionally pins recall@10
    * vs the exact L2 answer, code-range sanity, and determinism. */
  def knnPq(s: SparkSession, dir: String, mSub: Int = 8, kCodes: Int = 16,
      topk: Int = 10, lloydPasses: Int = 1): DataFrame = {
    val e = t(s, dir, "embeddings")
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by $mSub subspaces")
    val d = dim / mSub
    val codebooks = pqTrain(s, e, mSub, kCodes, d, lloydPasses)
    val codes = pqEncode(s, e, codebooks, mSub, d)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    pqAdcQuery(s, codes, codebooks, queries, mSub, d, topk)
  }

  /** TRAIN: deterministic seeds + `lloydPasses` decimal-exact Lloyd
    * refinements, each one distributed job over all subspaces.
    * Default 1: the fixture is near-converged after one pass (a
    * second buys +1pt recall@10, 0.34→0.35, for a full extra
    * training job). Raise for real corpora — pass count never
    * touches query cost (encode/ADC are training-independent).
    * Driver state is O(mSub·kCodes·d) ≈ 1k doubles, never O(N). */
  private def pqTrain(s: SparkSession, e: DataFrame, mSub: Int,
      kCodes: Int, d: Int, lloydPasses: Int): Seq[Seq[Seq[Double]]] = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val seedRows: Seq[Seq[Double]] = e.filter(col("vec_id") < kCodes)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val seeds: Seq[Seq[Seq[Double]]] =
      (0 until mSub).map(m => seedRows.map(_.slice(m * d, (m + 1) * d)))

    val sub = e.select(col("embedding"),
        explode(sequence(lit(0), lit(mSub - 1))).as("m"))
      .select(col("m"),
        slice(col("embedding"), col("m") * d + 1, lit(d)).as("sv"))
    def refine(cb: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] = {
      val bc = s.sparkContext.broadcast(pqAugMats(cb))
      val costBySub = pqCosts(bc, col("m").cast("long"), col("sv"))
      val means = sub.withColumn("code", pqArgmin(costBySub))
        .select(col("m"), col("code"), posexplode(col("sv")))
        .groupBy(col("m"), col("code"), col("pos"))
        .agg((sum(col("col").cast(DecimalType(28, 12))).cast(DoubleType) /
          count(lit(1))).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .view.mapValues(rows =>
          rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq).toMap
      (0 until mSub).map(m =>
        (0 until kCodes).map(j => means.getOrElse((m, j + 1), cb(m)(j))))
    }
    (1 to lloydPasses).foldLeft(seeds)((cb, _) => refine(cb))
  }

  /** ENCODE every vector as mSub one-byte codes: pure per-row
    * codegen'd expressions (slice + native dots + a kCodes-length
    * argmin); zero shuffle, map-only — at scale this is the persisted
    * index build pass. */
  private def pqEncode(s: SparkSession, e: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], mSub: Int, d: Int): DataFrame = {
    val cbBc = s.sparkContext.broadcast(pqAugMats(codebooks))
    e.select(col("vec_id").as("cid"),
      array((0 until mSub).map(m =>
        pqArgmin(pqCosts(cbBc, lit(m.toLong),
          slice(col("embedding"), m * d + 1, d)))): _*).as("codes"))
  }

  /** QUERY: each query precomputes its mSub×kCodes distance TABLE
    * once (broadcast, tiny); candidate distance = mSub table lookups
    * over the code column — no float math per candidate. */
  private def pqAdcQuery(s: SparkSession, codes: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], queries: DataFrame,
      mSub: Int, d: Int, topk: Int): DataFrame = {
    val cbBc = s.sparkContext.broadcast(pqAugMats(codebooks))
    val qtab = queries
      .select(col("qid"),
        array((0 until mSub).map(m =>
          pqCosts(cbBc, lit(m.toLong),
            slice(col("qe"), m * d + 1, d))): _*).as("tab"))
    val scored = codes.join(broadcast(qtab), col("qid") =!= col("cid"))
      .withColumn("adist", aggregate(
        zip_with(col("tab"), col("codes"), (tbl, c) => element_at(tbl, c)),
        lit(0.0), (a, x) => a + x))
      // topK ranks cos_sim DESC; negate the (smaller-is-better) ADC
      // distance to reuse the same two-phase operator
      .withColumn("cos_sim", -col("adist"))
    topK(scored, topk)
  }

  def qKnnPq(s: SparkSession, dir: String): DataFrame = knnPq(s, dir)

  /** Build-once PQ index (the production shape `knn_pq`'s per-call
    * retrain is a demo of — same lift [[buildIvfIndex]] gave IVF).
    * Three tables under `root`:
    *
    *  - `codebooks`: the mSub×kCodes×d trained matrix as (m, j, c)
    *    rows — O(1k) doubles, read back at query time, NEVER
    *    retrained.
    *  - `codes`: (cid, codes) — the corpus reduced to mSub small ints
    *    per vector, committed to a [[graft.sources.TableLog]]. This is the table
    *    ADC scans: at 100 TB of floats it is a few hundred GB of
    *    codes, which is the entire point of PQ.
    *  - `vectors`: (vec_id, embedding) range-clustered on `vec_id`
    *    with per-file stats, so fetching the handful of query vectors
    *    file-skips instead of scanning the corpus.
    *
    * Training is [[pqTrain]] verbatim — identical seeds, kernel and
    * decimal means — so the persisted answer EQUALS the per-call
    * [[knnPq]] answer and inherits its exact oracle replay. */
  def buildPqIndex(s: SparkSession, dir: String, root: String,
      mSub: Int = 8, kCodes: Int = 16, lloydPasses: Int = 1): Unit = {
    val e = t(s, dir, "embeddings")
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by $mSub subspaces")
    val d = dim / mSub
    val codebooks = pqTrain(s, e, mSub, kCodes, d, lloydPasses)
    // the three persisted artifacts are fully independent (codebooks
    // parquet, codes log, vectors log — disjoint roots): overlap them
    // so the two appends' sample/write/publish chains and the tiny
    // codebook write share the cluster instead of queueing (§2.6)
    inParallel(
      () => {
        val codes = pqEncode(s, e, codebooks, mSub, d)
          .repartitionByRange(8, col("cid"))
        graft.sources.TableLog.append(s, s"$root/codes", codes,
          statsCols = Seq("cid"))
      },
      () => {
        val vecs = e.select(col("vec_id"), col("embedding"))
          .repartitionByRange(8, col("vec_id"))
        graft.sources.TableLog.append(s, s"$root/vectors", vecs,
          statsCols = Seq("vec_id"))
      },
      () => {
        val sp = s; import sp.implicits._
        codebooks.zipWithIndex.flatMap { case (book, m) =>
          book.zipWithIndex.map { case (c, j) => (m, j, c) } }
          .toDF("m", "j", "c")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/codebooks")
      })
  }

  /** Query a persisted PQ index: load the O(mSub·kCodes·d) codebooks,
    * fetch the query vectors from the stats-clustered `vectors` log
    * (file-skip on vec_id), build per-query ADC tables, and scan ONLY
    * the `codes` table — mSub integer lookups per candidate, the
    * original floats never read. */
  def queryPqIndex(s: SparkSession, root: String, queries: DataFrame,
      topk: Int = 10): DataFrame = {
    val cbRows = s.read.parquet(s"$root/codebooks")
      .orderBy("m", "j").collect()
    val mSub = cbRows.map(_.getInt(0)).max + 1
    val codebooks: Seq[Seq[Seq[Double]]] = cbRows
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq }
    val d = codebooks.head.head.length
    val codes = graft.sources.TableLog.snapshot(s, s"$root/codes")
      .select(col("cid"), col("codes"))
    pqAdcQuery(s, codes, codebooks, queries, mSub, d, topk)
  }

  /** Declared persisted-PQ query: build (train + encode + commit),
    * then answer top-10 for the 10 query vectors from the STORED
    * codebooks and codes. Training/encode/ADC are bit-identical to
    * [[knnPq]] (parquet round-trips floats and doubles exactly), so
    * the oracle is the same full replay SQL — one row proves the
    * persist→load→table-lookup path end-to-end. */
  def qKnnPqPersisted(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/pq_index"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    buildPqIndex(s, dir, root)
    // stats-pruned fetch: the vec_id-clustered vectors log serves the
    // 10 query vectors from ONE file (readRange file-skip), not a
    // corpus scan
    val queries = graft.sources.TableLog
      .readRange(s, s"$root/vectors", "vec_id", 0L, 9L)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    queryPqIndex(s, root, queries)
  }

  /** Full exact replay of [[knnPq]] (mSub=8, kCodes=16, one Lloyd
    * pass, top-10): seeds → kernel-fold costs → first-min assignment
    * → decimal Lloyd means (lost codes keep their seed) → encode →
    * per-query ADC tables → subspace-ordered distance fold → top-10.
    * Every float op mirrors the Spark side exactly: `(-2.0*c[i]) *
    * x[i]` matches the kernel's driver-prescaled plane rows (×2 is
    * exact in IEEE), `list_reduce(list_prepend(0.0, …))` matches its
    * left fold with the appended ‖c‖²·1 term added last, and the ADC
    * fold runs in subspace order via `list(term ORDER BY m)` — SUM()
    * would be order-unspecified and hash-unstable. */
  val qKnnPqSql: String = """
    WITH seeds AS (
      SELECT s.j, mm.m,
        list_transform(range(1, 9), i -> s.embedding[mm.m*8 + i]::DOUBLE) AS c
      FROM (SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS j
            FROM embeddings WHERE vec_id < 16) s
      CROSS JOIN (SELECT unnest(range(0, 8)) AS m) mm),
    sv AS (
      SELECT vec_id, mm.m,
        list_transform(range(1, 9), i -> embedding[mm.m*8 + i]::DOUBLE) AS sv
      FROM embeddings CROSS JOIN (SELECT unnest(range(0, 8)) AS m) mm),
    cost0 AS (
      SELECT v.vec_id, v.m, s.j,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, 9), i -> (-2.0 * s.c[i]) * v.sv[i])),
          (a,b) -> a+b)
        + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(s.c, y -> y*y)), (a,b) -> a+b) AS cost
      FROM sv v JOIN seeds s ON s.m = v.m),
    a0 AS (
      SELECT vec_id, m, j AS code FROM (
        SELECT vec_id, m, j, ROW_NUMBER() OVER
          (PARTITION BY vec_id, m ORDER BY cost ASC, j ASC) AS rn FROM cost0)
      WHERE rn = 1),
    mns AS (
      SELECT a0.m, a0.code, u.pos,
        CAST(SUM(CAST(v.sv[u.pos] AS DECIMAL(28,12))) AS DOUBLE)
          / COUNT(*) AS mean
      FROM sv v JOIN a0 ON a0.vec_id = v.vec_id AND a0.m = v.m,
      LATERAL (SELECT unnest(range(1, 9)) AS pos) u
      GROUP BY 1, 2, 3),
    c1 AS (
      SELECT s.m, s.j,
        list(COALESCE(mns.mean, s.c[p.pos]) ORDER BY p.pos) AS c
      FROM seeds s
      CROSS JOIN (SELECT unnest(range(1, 9)) AS pos) p
      LEFT JOIN mns ON mns.m = s.m AND mns.code = s.j AND mns.pos = p.pos
      GROUP BY s.m, s.j),
    cost1 AS (
      SELECT v.vec_id, v.m, s.j,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, 9), i -> (-2.0 * s.c[i]) * v.sv[i])),
          (a,b) -> a+b)
        + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(s.c, y -> y*y)), (a,b) -> a+b) AS cost
      FROM sv v JOIN c1 s ON s.m = v.m),
    codes AS (
      SELECT vec_id AS cid, m, j AS code FROM (
        SELECT vec_id, m, j, ROW_NUMBER() OVER
          (PARTITION BY vec_id, m ORDER BY cost ASC, j ASC) AS rn FROM cost1)
      WHERE rn = 1),
    qtab AS (
      SELECT vec_id AS qid, m, list(cost ORDER BY j) AS tab
      FROM cost1 WHERE vec_id < 10 GROUP BY 1, 2),
    terms AS (
      SELECT q.qid, c.cid, c.m, q.tab[c.code] AS term
      FROM codes c JOIN qtab q ON q.m = c.m AND q.qid <> c.cid),
    adist AS (
      SELECT qid, cid,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY m)),
          (a,b) -> a+b) AS adist
      FROM terms GROUP BY qid, cid),
    r AS (
      SELECT qid, cid, ROW_NUMBER() OVER
        (PARTITION BY qid ORDER BY adist ASC, cid ASC) AS rn FROM adist)
    SELECT qid, rn, cid FROM r WHERE rn <= 10 ORDER BY qid, rn
  """.trim

  /** IVF-PQ composed index (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search" §IV — the standard FAISS `IVFPQ`
    * shape): coarse IVF cells prune the candidate set, PQ codes over
    * RESIDUALS (x − centroid(cell)) score the survivors by ADC table
    * lookup. This is the composition that actually serves corpus-scale
    * ANN: IVF alone still reads full vectors for candidates; PQ alone
    * scans every code; together the scan is |probed cells| candidates
    * × mSub byte lookups.
    *
    * Spark-first shape, reusing the oracle-checked parts:
    *  - COARSE: identical training/assignment to [[knnIvf]] (min-id
    *    seeds, decimal-exact Lloyd, broadcast-kernel argmax).
    *  - RESIDUALS: one broadcast join against the O(k·d) centroid
    *    frame + a per-row zip_with — map-only.
    *  - PQ TRAIN on residual sub-vectors (seeds = first kCodes
    *    residuals, one batched Lloyd pass via the keyed-broadcast cost
    *    kernel — same partition-count-independent decimal means).
    *  - ENCODE map-only; QUERY builds one (qid, cell) distance table
    *    per PROBED pair — tab_m[j] = ‖r_q,m − c_j‖² (the full squared
    *    distance, so rankings compare across a query's probed cells) —
    *    broadcast, then candidates join on cell and sum mSub lookups.
    *
    * Doubly approximate by design (candidate pruning + lossy codes) →
    * engine API asserted by PipelineSpec (recall vs exact L2,
    * determinism, probe monotonicity) rather than a declared oracle
    * row; every building block it composes is oracle-checked
    * (`knn_ivf_exact`, `knn_ivf_persisted`, `knn_pq` specs). */
  def knnIvfPq(s: SparkSession, dir: String, nprobe: Int = 3,
      mSub: Int = 8, kCodes: Int = 16, topk: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val e = t(s, dir, "embeddings")
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by $mSub subspaces")
    val d = dim / mSub
    val sp = s; import sp.implicits._

    // ---- coarse cells (as knnIvf) + residuals
    val seeds: Seq[Seq[Double]] = e.filter(col("vec_id") < 10)
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cents = refineCentroids(e, seeds)
    val scores = centroidScores(s, cents, col("embedding"))
    val centDf = broadcast(cents.zipWithIndex
      .map { case (c, i) => (i + 1, c) }.toDF("cell", "ctr"))
    val resid = e
      .withColumn("cell",
        array_position(scores, array_max(scores)).cast("int"))
      .join(centDf, Seq("cell"))
      .withColumn("r", zip_with(col("embedding"), col("ctr"),
        (x, c) => x.cast(DoubleType) - c))
      .select(col("vec_id"), col("cell"), col("embedding"), col("r"))
      .localCheckpoint(true)

    // ---- PQ train on residual sub-vectors: first-kCodes seeds + one
    // batched decimal-exact Lloyd pass over all subspaces
    def subvec(v: Column, m: Int): Column = slice(v, m * d + 1, d)
    val seedRows: Seq[Seq[Double]] = resid.filter(col("vec_id") < kCodes)
      .orderBy("vec_id").select(col("r")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val seedCb: Seq[Seq[Seq[Double]]] =
      (0 until mSub).map(m => seedRows.map(_.slice(m * d, (m + 1) * d)))
    val sub = resid.select(col("r"),
        explode(sequence(lit(0), lit(mSub - 1))).as("m"))
      .select(col("m"), slice(col("r"), col("m") * d + 1, lit(d)).as("sv"))
    val seedBc = s.sparkContext.broadcast(pqAugMats(seedCb))
    val means = sub.withColumn("code",
        pqArgmin(pqCosts(seedBc, col("m").cast("long"), col("sv"),
          floatVec = false)))
      .select(col("m"), col("code"), posexplode(col("sv")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(28, 12))).cast(DoubleType) /
        count(lit(1))).as("mean"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .view.mapValues(rows =>
        rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq).toMap
    val codebooks: Seq[Seq[Seq[Double]]] = (0 until mSub).map(m =>
      (0 until kCodes).map(j => means.getOrElse((m, j + 1), seedCb(m)(j))))
    val cbBc = s.sparkContext.broadcast(pqAugMats(codebooks))

    // ---- encode residuals: mSub codes per vector, map-only
    val codes = resid.select(col("vec_id").as("cid"), col("cell"),
      array((0 until mSub).map(m =>
        pqArgmin(pqCosts(cbBc, lit(m.toLong), subvec(col("r"), m),
          floatVec = false))): _*).as("codes"))

    // ---- query: per-(qid, probed cell) residual distance tables.
    // ‖r_q,m − c_j‖² = (‖c_j‖² − 2c_j·r_q,m) + ‖r_q,m‖² — the second
    // term varies per (q, cell, m), so it stays in the table (cross-
    // cell rankings need the full distance, unlike single-codebook PQ)
    def sumSq(c: Column): Column =
      aggregate(c, lit(0.0), (a, x) => a + x * x)
    val probes = resid.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        posexplode(centroidScores(s, cents, col("embedding"))))
      .withColumn("prn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("col").desc, col("pos").asc)))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qe"), (col("pos") + 1).cast("int").as("cell"))
    val qtab = probes.join(centDf, Seq("cell"))
      .withColumn("rq", zip_with(col("qe"), col("ctr"),
        (x, c) => x.cast(DoubleType) - c))
      .select(col("qid"), col("cell"),
        array((0 until mSub).map { m =>
          val sv = subvec(col("rq"), m)
          transform(pqCosts(cbBc, lit(m.toLong), sv, floatVec = false),
            t => t + sumSq(sv))
        }: _*).as("tab"))
    val scored = codes.join(broadcast(qtab), Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("adist", aggregate(
        zip_with(col("tab"), col("codes"), (tbl, c) => element_at(tbl, c)),
        lit(0.0), (a, x) => a + x))
      .withColumn("cos_sim", -col("adist"))
    topK(scored, topk)
  }

  val qEmbedNormSql: String = """
    WITH n AS (
      SELECT vec_id,
        sqrt(list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
          (a, b) -> a + b)) AS l2_norm,
        embedding
      FROM embeddings),
    u AS (
      SELECT vec_id, l2_norm,
        list_transform(embedding, x -> CAST(x AS DOUBLE) / l2_norm) AS unit
      FROM n WHERE l2_norm > 0)
    SELECT vec_id, l2_norm,
      abs(sqrt(list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(unit, x -> x * x)),
        (a, b) -> a + b)) - 1.0) < 1e-9 AS is_unit
    FROM u ORDER BY vec_id
  """.trim

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means the embedding space into cells, then
    * compare pairs only WITHIN a cell and drop every vector that has a
    * cosine-≥-τ neighbor with a smaller id (keep-min — the paper keeps
    * a representative per duplicate group; min-id is the deterministic
    * choice, same convention as the MinHash/exact dedup family).
    *
    * Why this beats the pair-LSH dedup (`dedup_embed`) at corpus
    * scale: LSH targets NEAR-duplicates (τ→1); semantic dedup runs at
    * lower τ where hyperplane-bucket recall collapses, and clustering
    * keeps the candidate set dense-but-local. Cost is the classic
    * SemDeDup Σ|cell|² — bounded by construction: [[adaptiveCells]]
    * derives k from the corpus size (constant target occupancy, so
    * Σ|cell|² stays linear in N) and recursively re-clusters any
    * cell that still exceeds the occupancy cap, so a skewed
    * mega-cell cannot go quadratic (CurationSpec asserts the
    * resulting pair-count bound).
    *
    * Shape at 100 TB: one vector_dots assignment pass (the same
    * persisted (id, cell) index the IVF path builds), one cell-keyed
    * self-join, zero driver state beyond O(k·d) centroids. Cell
    * assignment is engine-local (k-means) → rows-only driver check;
    * the keep/drop invariants are pinned in CurationSpec.
    */
  /** Scale-adaptive cell assignment: k is DERIVED from the corpus
    * size (k = ⌈N / targetOcc⌉, so cells stay ~constant-occupancy as
    * N grows and the SemDeDup Σ|cell|² pair cost stays linear in N),
    * and any cell that still exceeds `capFactor × targetOcc` members
    * (skewed clustering) is re-clustered with its own derived sub-k —
    * the mega-cell quadratic blowup cannot happen by construction.
    *
    * The resplit is BATCHED (r7; the r6 form looped hot cells
    * sequentially on the driver, chaining up to `maxSplits` per-cell
    * count/collect/refine job cascades — the 6.2× dedup_semantic
    * regression): every hot cell of a level is re-clustered together
    * in a CONSTANT number of Spark jobs —
    *  1. one job finds the hot cells and their sizes;
    *  2. one job gathers the sub-k smallest vec_ids of EVERY hot cell
    *     (the same deterministic seed rule the top level uses) via a
    *     per-cell row_number against a broadcast (cell → sub-k) frame;
    *  3. one decimal-exact Lloyd means job across all hot cells at
    *     once, rows assigned by [[graft.functions.vector_dots_by_key]]
    *     — each row scores against its own cell's sub-centroids from
    *     one broadcast map, map-only;
    *  4. one map-only re-assignment against the refined sub-centroids
    *     and a union with the cold cells.
    * Sub-cells are labelled `parent·10⁵ + sub` (collision-free: sub-k
    * is capped below 10⁵). Driver state per level is the O(k·d)
    * centroid pull of [[refineCentroids]] plus the O(Σ sub-k · d)
    * hot-cell seed pull — both bounded by construction. `depth` levels
    * run as a loop (depth 2 = one batched resplit + exit; a still-hot
    * sub-cell would be caught by the next level's recheck). */
  private[graft] def adaptiveCells(e: DataFrame, targetOcc: Int = 50,
      capFactor: Int = 4, depth: Int = 2, maxSplits: Int = 64): DataFrame = {
    val s = e.sparkSession
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val n = e.count()
    val k = math.max(2, math.min(((n + targetOcc - 1) / targetOcc).toInt, 100000))
    // Driver-state bound, stated precisely: every Lloyd pass
    // broadcasts the k×d centroid matrix, so O(k·d) (~50 MB at the
    // k = 1e5 / d = 64 cap) is the FLOOR of this broadcast-kernel
    // design, not a removable collect — a "distributed seed election"
    // would still materialize the same matrix on the driver to build
    // the broadcast. The seed pull below is one transient copy of
    // that same bound (orderBy.limit plans as TakeOrderedAndProject:
    // per-partition heaps of k rows, merged once on the driver — no
    // global sort), GC-dead after refineCentroids returns. Raising k
    // past the cap needs a different ASSIGNMENT design (shuffle-join
    // scoring, O(N·k) work), not a different seeding.
    val seeds: Seq[Seq[Double]] = e.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val cents = refineCentroids(e, seeds)
    val scores = centroidScores(s, cents, col("embedding"))
    var assigned = e
      .withColumn("cell",
        array_position(scores, array_max(scores)).cast("long"))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint(true)
    val cap = capFactor.toLong * targetOcc
    var level = depth
    while (level > 1) {
      level -= 1
      val hot: Array[(Long, Long)] = assigned.groupBy(col("cell")).count()
        .filter(col("count") > cap)
        .orderBy(col("count").desc).limit(maxSplits)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      if (hot.isEmpty) level = 0
      else {
        val hotIds: Seq[Any] = hot.map(_._1).toSeq
        val hotRows = assigned.filter(col("cell").isin(hotIds: _*))
        // sub-k per hot cell, derived on the driver from the counts
        // the hot-cell job already returned (no extra count jobs)
        import s.implicits._
        val kDf = hot.toSeq.map { case (c, cnt) =>
          (c, math.max(2, math.min(((cnt + targetOcc - 1) / targetOcc).toInt, 99999)))
        }.toDF("cell", "sub_k")
        val seedRows = hotRows
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
          .join(broadcast(kDf), Seq("cell"))
          .filter(col("rn") <= col("sub_k"))
          .select(col("cell"), col("rn"), col("embedding"))
          .collect()
        val seedMats =
          new java.util.HashMap[java.lang.Long, Array[Array[Double]]]
        seedRows.groupBy(_.getLong(0)).foreach { case (c, rows) =>
          seedMats.put(c, rows.sortBy(_.getInt(1)).map(r =>
            normalize(r.getSeq[Float](2).map(_.toDouble).toSeq).toArray))
        }
        def assignSub(
            mats: java.util.HashMap[java.lang.Long, Array[Array[Double]]])
            : Column = {
          val sc = graft.functions.vector_dots_by_key(
            s.sparkContext.broadcast(mats), col("cell"), col("embedding"))
          array_position(sc, array_max(sc)).cast("long")
        }
        // one Lloyd pass for ALL hot cells: partition-count-independent
        // decimal means, keyed by (cell, sub-cell)
        // same O(k)-rows driver shape as lloydMeans: fold the d
        // per-position means into one array row per (cell, sub-cell)
        // before the collect
        val means = hotRows.withColumn("sc", assignSub(seedMats))
          .select(col("cell"), col("sc"), posexplode(col("embedding")))
          .groupBy(col("cell"), col("sc"), col("pos"))
          .agg((sum(col("col").cast(DecimalType(28, 12))).cast(DoubleType) /
            count(lit(1))).as("m"))
          .groupBy(col("cell"), col("sc"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            pm => pm.getField("m")).as("mv"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Double](2).toSeq)
          .toMap
        val refMats =
          new java.util.HashMap[java.lang.Long, Array[Array[Double]]]
        seedMats.forEach { (c, sm) =>
          refMats.put(c, Array.tabulate(sm.length)(i =>
            means.get((c.longValue(), (i + 1).toLong)) match {
              case Some(m) => normalize(m).toArray
              case None => sm(i) // lost all members → keep seed
            }))
        }
        val resplit = hotRows.withColumn("sc", assignSub(refMats))
          .select(col("vec_id"), col("embedding"),
            (col("cell") * 100000L + col("sc")).as("cell"))
        assigned = assigned.filter(!col("cell").isin(hotIds: _*))
          .unionAll(resplit)
          .localCheckpoint(true)
      }
    }
    assigned
  }

  def semanticDedup(s: SparkSession, dir: String, tau: Double): DataFrame = {
    val e = t(s, dir, "embeddings")
    val assigned = adaptiveCells(e)
    val dropped = assigned
      .select(col("cell"), col("vec_id").as("i"), col("embedding").as("ei"))
      .join(assigned.select(col("cell"), col("vec_id").as("j"),
        col("embedding").as("ej")), Seq("cell"))
      .where(col("i") < col("j"))
      // the SemDeDup cost driver is Σ|cell|² — observed into
      // BENCH_DETAIL so a clustering regression (mega-cell) is
      // visible as a candidate-count jump, not just a slow query
      .observe("semantic_candidates", count(lit(1)).as("n_cell_pairs"))
      .where(cosine(col("ei"), col("ej")) >= tau)
      .select(col("cell"), col("j")).distinct()
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_docs"))
      .join(dropped.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_dropped")), Seq("cell"), "left")
      .na.fill(0L, Seq("n_dropped"))
      .select(col("cell"), col("n_docs"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_kept"))
      .orderBy(col("cell"))
  }

  /** Declared semantic-dedup query: τ = 0.40 over the size-adaptive
    * k-means of the embeddings fixture (k = ⌈N/50⌉; 10 cells at
    * sf0.01). (A production corpus runs τ ≈ 0.95+;
    * the synthetic embeddings are near-orthogonal — max pairwise
    * cosine ≈ 0.51 — so the discriminative threshold sits at 0.40,
    * where the cell-local tail of the similarity distribution actually
    * separates.) */
  def qDedupSemantic(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, 0.40)

  /** The SemDeDup keep/drop SET at τ=0.40, with a FULL-SEMANTICS
    * oracle: the SQL below reproduces the whole pipeline in DuckDB —
    * seed selection, sequential-fold normalization, the dot-product
    * argmax assignment, the decimal-exact Lloyd refinement, the
    * second assignment, and the within-cell τ filter. Every float op
    * is mirrored in the same evaluation order (`list_reduce` with a
    * prepended 0.0 = the kernels' strict left-to-right folds;
    * DECIMAL(28,12) sums = the partition-independent mean
    * convention), so cell assignment agrees bit-for-bit and the
    * keep/drop set is EXACT — no "cells are engine-local" carve-out.
    * The cell column itself is still omitted from the output only
    * because its 1-based index is an implementation detail, not
    * because it disagrees. The seed count is DERIVED in the SQL the
    * same way [[adaptiveCells]] derives it (k = max(2, min(⌈N/50⌉,
    * 1e5)) smallest vec_ids via ROW_NUMBER — r7; a hardcoded
    * `vec_id < 10` diverged at any N ≠ 500 or with non-contiguous
    * ids). Remaining precondition, stated: no cell exceeds the
    * 4×targetOcc cap at the verified scale, so the engine performs no
    * recursive resplit (true at sf0.01; the resplit path is covered
    * by CurationSpec's pair-bound asserts instead). */
  def qDedupSemanticKeep(s: SparkSession, dir: String): DataFrame =
    semanticDedupDetail(s, dir, 0.40)
      .select(col("vec_id"), col("dropped").as("is_dropped"))
      .orderBy("vec_id")

  /** Shared DuckDB replay of the k-means training both IVF and
    * SemDeDup run on: seed selection (`seedFilter` over a rank/size
    * window — the two pipelines differ ONLY here), sequential-fold
    * normalization, the dot-argmax first assignment (a0), one
    * decimal-exact Lloyd refinement (m → c1, lost cells keep their
    * seed), and the second assignment `a1(vec_id, cell)`, where
    * `cell` is the seed's 1-based rank — exactly Spark's
    * `array_position` index. Query-specific tails are appended by the
    * three oracle vals below, so the float-op-for-float-op replay is
    * written (and maintained) once. */
  private def ivfReplaySql(seedFilter: String): String = s"""
    WITH sel AS (
      SELECT vec_id, embedding,
        ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
        COUNT(*) OVER () AS nn
      FROM embeddings),
    seeds AS (
      SELECT vec_id AS c, ROW_NUMBER() OVER (ORDER BY vec_id) AS sid,
        list_transform(embedding, x -> x::DOUBLE) AS raw,
        list_transform(embedding, x -> x::DOUBLE /
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(embedding, y -> y::DOUBLE * y::DOUBLE)), (a,b) -> a+b))) AS ctr
      FROM sel
      WHERE $seedFilter),
    s0 AS (
      SELECT v.vec_id, s.sid,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, len(v.embedding)+1),
            i -> s.ctr[i] * v.embedding[i]::DOUBLE)), (a,b)->a+b) AS dot
      FROM embeddings v CROSS JOIN seeds s),
    a0 AS (
      SELECT vec_id, sid AS cell0 FROM (
        SELECT vec_id, sid, ROW_NUMBER() OVER
          (PARTITION BY vec_id ORDER BY dot DESC, sid ASC) AS rn FROM s0)
      WHERE rn = 1),
    m AS (
      SELECT a0.cell0 AS sid, u.pos,
        CAST(SUM(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mean
      FROM embeddings v JOIN a0 ON a0.vec_id = v.vec_id,
      LATERAL (SELECT generate_subscripts(v.embedding,1) AS pos,
               unnest(v.embedding)::DOUBLE AS x) u
      GROUP BY 1, 2),
    c1raw AS (
      SELECT s.sid, list(COALESCE(m.mean, s.raw[p.pos]) ORDER BY p.pos) AS rawc
      FROM seeds s
      CROSS JOIN (SELECT unnest(range(1, len(embedding)+1)) AS pos
                  FROM (SELECT embedding FROM embeddings LIMIT 1)) p
      LEFT JOIN m ON m.sid = s.sid AND m.pos = p.pos
      GROUP BY s.sid),
    c1 AS (
      SELECT sid, list_transform(rawc, x -> x /
        sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(rawc, y -> y*y)), (a,b)->a+b))) AS ctr
      FROM c1raw),
    s1 AS (
      SELECT v.vec_id, s.sid,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, len(v.embedding)+1),
            i -> s.ctr[i] * v.embedding[i]::DOUBLE)), (a,b)->a+b) AS dot
      FROM embeddings v CROSS JOIN c1 s),
    a1 AS (
      SELECT vec_id, sid AS cell FROM (
        SELECT vec_id, sid, ROW_NUMBER() OVER
          (PARTITION BY vec_id ORDER BY dot DESC, sid ASC) AS rn FROM s1)
      WHERE rn = 1)"""

  /** The adaptiveCells seed rule: k = max(2, min(ceil(N/50), 1e5))
    * smallest vec_ids. */
  private val semSeedFilter =
    "rn <= GREATEST(2, LEAST(CAST(CEIL(nn / 50.0) AS BIGINT), 100000))"

  /** The list_sum cosine between embeddings a (aliased qid side) and b. */
  private val cosSql = """list_sum(list_transform(range(1, len(a.embedding)+1),
          i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len(a.embedding)+1),
          i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len(b.embedding)+1),
          i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))"""

  val qDedupSemanticKeepSql: String = (ivfReplaySql(semSeedFilter) + s""",
    d AS (
      SELECT DISTINCT y.vec_id AS j
      FROM a1 x JOIN a1 y ON x.cell = y.cell AND x.vec_id < y.vec_id
      JOIN embeddings a ON a.vec_id = x.vec_id
      JOIN embeddings b ON b.vec_id = y.vec_id
      WHERE $cosSql >= 0.40)
    SELECT e.vec_id, (d.j IS NOT NULL) AS is_dropped
    FROM embeddings e LEFT JOIN d ON e.vec_id = d.j
    ORDER BY e.vec_id
  """).trim

  /** The SemDeDup cell summary (cell, n_docs, n_dropped, n_kept) with
    * the SAME full-semantics replay — the cell label IS comparable
    * because a1's `cell` is the seed rank, bit-for-bit the
    * `array_position` index the Spark side emits. Precondition shared
    * with the keep oracle: no cell exceeds the resplit cap at the
    * verified scale (true at sf0.01; the resplit path is covered by
    * CurationSpec). */
  val qDedupSemanticSql: String = (ivfReplaySql(semSeedFilter) + s""",
    d AS (
      SELECT DISTINCT y.cell, y.vec_id AS j
      FROM a1 x JOIN a1 y ON x.cell = y.cell AND x.vec_id < y.vec_id
      JOIN embeddings a ON a.vec_id = x.vec_id
      JOIN embeddings b ON b.vec_id = y.vec_id
      WHERE $cosSql >= 0.40),
    g AS (SELECT cell, COUNT(*) AS n_docs FROM a1 GROUP BY 1),
    dg AS (SELECT cell, COUNT(*) AS n_dropped FROM d GROUP BY 1)
    SELECT CAST(g.cell AS BIGINT) AS cell, g.n_docs,
      CAST(COALESCE(dg.n_dropped, 0) AS BIGINT) AS n_dropped,
      CAST(g.n_docs - COALESCE(dg.n_dropped, 0) AS BIGINT) AS n_kept
    FROM g LEFT JOIN dg ON dg.cell = g.cell
    ORDER BY cell
  """).trim

  /** knn_ivf (nprobe=3) full exact oracle: the same training replay
    * with the IVF seed rule (vec_id < 10), then probe selection =
    * top-3 refined-centroid dots per query (s1 restricted to the
    * query vectors — identical scores to Spark's posexplode over the
    * assignment column), candidates = probed cells' members, exact
    * cosine scoring, top-5. Approximation lives ONLY in candidate
    * selection, and the replay reproduces that selection exactly. */
  val qKnnIvfSql: String = (ivfReplaySql("vec_id < 10") + s""",
    probes AS (
      SELECT vec_id AS qid, sid AS cell FROM (
        SELECT vec_id, sid, ROW_NUMBER() OVER
          (PARTITION BY vec_id ORDER BY dot DESC, sid ASC) AS prn
        FROM s1 WHERE vec_id < 10)
      WHERE prn <= 3),
    cand AS (
      SELECT p.qid, a1.vec_id AS cid
      FROM probes p JOIN a1 ON a1.cell = p.cell
      WHERE a1.vec_id <> p.qid),
    sc AS (
      SELECT cd.qid, cd.cid, $cosSql AS cos_sim
      FROM cand cd JOIN embeddings a ON a.vec_id = cd.qid
      JOIN embeddings b ON b.vec_id = cd.cid),
    r AS (SELECT qid, cid, ROW_NUMBER() OVER
      (PARTITION BY qid ORDER BY cos_sim DESC, cid ASC) AS rn FROM sc)
    SELECT qid, rn, cid FROM r WHERE rn <= 5 ORDER BY qid, rn
  """).trim

  /** Kept-set view for the spec: (cell, vec_id, embedding, kept). */
  private[graft] def semanticDedupDetail(s: SparkSession, dir: String,
      tau: Double): DataFrame = {
    val e = t(s, dir, "embeddings")
    val assigned = adaptiveCells(e)
    val dropped = assigned
      .select(col("cell"), col("vec_id").as("i"), col("embedding").as("ei"))
      .join(assigned.select(col("cell"), col("vec_id").as("j"),
        col("embedding").as("ej")), Seq("cell"))
      .where(col("i") < col("j"))
      .where(cosine(col("ei"), col("ej")) >= tau)
      .select(col("cell"), col("j")).distinct()
    assigned.join(dropped.withColumnRenamed("j", "vec_id")
        .withColumn("is_dropped", lit(true)),
      Seq("cell", "vec_id"), "left")
      .select(col("cell"), col("vec_id"), col("embedding"),
        coalesce(col("is_dropped"), lit(false)).as("dropped"))
  }
}
