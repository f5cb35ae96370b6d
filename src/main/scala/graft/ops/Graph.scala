package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Link-graph analytics over the document corpus (SURVEY §2 extension
  * surface): PageRank as a crawl-quality prior — the classic signal a
  * training-data pipeline attaches to web documents before
  * quality-weighted sampling (`budget_select`, `mix_temperature`).
  *
  * The link graph is derived deterministically from the fixture (3
  * md5-addressed out-links per document; duplicate targets deduped,
  * md5-chosen self-loops KEPT — a node may retain part of its own
  * mass, which both engines model identically) so the graphs are
  * bit-equal; a real deployment feeds an extracted hyperlink edge
  * table into [[pageRank]] unchanged.
  *
  * Arithmetic contract: ranks are scaled integers (1e12 total mass)
  * and every step is integer floor-division on non-negative values —
  * `r DIV deg` contributions, `(85 * sum) DIV 100` damping — so the
  * per-target sums are order-independent and the DuckDB oracle replays
  * all six iterations bit-for-bit (float PageRank would hash-mismatch
  * on reduction order). Truncation dust (< #nodes per iteration) is
  * deliberately NOT redistributed: determinism beats the last 1e-9 of
  * mass.
  *
  * Scale posture: the edge table is built once, deduped, degree-joined
  * and persisted; each iteration is one hash join (ranks onto edge
  * sources) + one partial+final aggregation onto targets — the shuffle
  * volume is O(#edges) per iteration with NO driver collection
  * (the only driver scalar is COUNT(*), needed for the teleport
  * constant). Ranks are `localCheckpoint`ed per iteration so the plan
  * stays one-iteration deep — at 100 iterations lineage would
  * otherwise grow exponentially and re-execute the whole chain on any
  * retry. At 100 TB the graph partitioning is the bucketing story:
  * pre-bucket edges by src and the per-iteration join co-locates.
  */
object Graph {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val Scale = 1000000000000L
  private val Iters = 6

  /** First 16 bits of md5 as a long — the cross-engine-stable address
    * used to derive fixture out-links (same pattern as
    * [[Sampling.hashBucket]]). */
  private def hex4(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("long")

  /** Six scaled-integer PageRank iterations (damping 0.85) over
    * `edges(src, dst)`; every node must have >= 1 out-edge (the
    * fixture derivation guarantees it — dangling-node mass is a
    * one-line extension: fold the dangling sum into the teleport
    * term). Returns (id, pr). */
  def pageRank(nodes: DataFrame, edges: DataFrame, nNodes: Long): DataFrame = {
    val r0 = Scale / nNodes
    val teleport = r0 * 15 / 100
    // hash-partition the edge table by the join key BEFORE caching:
    // every iteration joins on src, so the cached relation's
    // partitioning is reused and only the (far smaller) rank table
    // shuffles per iteration — without this the edge side re-exchanged
    // 6 times (guide §2.4: operations keyed the same way share one
    // exchange).
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .repartition(col("src"))
      .persist()
    withDeg.count() // materialize once; 6 iterations re-read it
    var ranks = nodes.select(col("id"), lit(r0).as("r"))
    for (i <- 1 to Iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      // iterate on the rank table itself — its id set IS the node set
      // (invariant: every node gets a row each iteration), so
      // re-joining the nodes scan added a per-iteration table read
      ranks = ranks.select(col("id"))
        .join(contrib, col("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(teleport) + expr("(85 * coalesce(c, 0L)) DIV 100")).as("r"))
      // truncate lineage every OTHER iteration: per-iteration eager
      // checkpoints serialized 6 store-everything jobs; every-other
      // bounds plan depth at two iterations for half the jobs
      if (i % 2 == 0 || i == Iters) ranks = iterCheckpoint(ranks)
    }
    withDeg.unpersist(blocking = false)
    ranks
  }

  /** PageRank over the derived document link graph: 3 md5-addressed
    * out-links per doc, distinct (src, dst). Output is the full rank
    * table, highest-rank first. */
  def qPageRank(s: SparkSession, dir: String): DataFrame = {
    val nodes = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"))
    val n = nodes.count()
    val targets = (1 to 3).map(k =>
      hex4(concat(col("id").cast("string"), lit(s"#L$k"))) % n)
    val edges = nodes
      .select(col("id").as("src"), explode(array(targets: _*)).as("dst"))
      .distinct()
    pageRank(nodes, edges, n)
      .select(col("id").as("doc_id"), col("r").as("pr"))
      .orderBy(desc("pr"), col("doc_id"))
  }

  /** Triangle census of the (undirected) document link graph —
    * triangle count and global clustering coefficient, the standard
    * structural-quality signals next to [[qPageRank]] (link farms
    * show abnormal closure; organic link neighborhoods sit near the
    * corpus mean).
    *
    * Algorithm: DEGREE-ORDERED ORIENTATION (Chiba–Nishizeki / the
    * MapReduce form of Suri & Vassilvitskii 2011): orient every
    * undirected edge toward the higher (degree, id) rank, enumerate
    * wedges only at each edge pair's LOWEST-rank vertex, and close
    * them against the oriented edge set. Every triangle is counted
    * exactly once, and out-degrees are bounded by O(√m), so the wedge
    * self-join — the step that explodes in a naive formulation (a
    * celebrity node contributes deg² wedges) — stays O(m^1.5) total,
    * the property that makes the plan survive a 100× scale-up.
    *
    * Exactness: counts are integers; the clustering coefficient
    * 3·T / Σ deg·(deg−1)/2 is one double division — bit-equal on the
    * DuckDB replay.
    *
    * Scale posture: two hash joins + one aggregation over edges; the
    * undirected edge set and the oriented edge set are each
    * materialized once (`localCheckpoint`) because both feed two
    * consumers; no driver state beyond the node count. */
  def qTriangleCount(s: SparkSession, dir: String): DataFrame = {
    val nodes = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"))
    val n = nodes.count()
    val targets = (1 to 3).map(k =>
      hex4(concat(col("id").cast("string"), lit(s"#L$k"))) % n)
    val und = nodes
      .select(col("id").as("src"), explode(array(targets: _*)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true) // feeds degrees + orientation
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // rank = struct(deg, id): Spark compares structs lexicographically,
    // so this totally orders by (deg, id) with NO width assumption on
    // either field — ids up to Long.MaxValue and celebrity degrees
    // both compare correctly (a packed deg·2³² + id long would
    // silently collide/overflow past 2³² ids)
    def rank(d: Column, id: Column): Column =
      struct(d.as("d"), id.as("i"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(
        when(rank(col("da"), col("a")) < rank(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"),
            rank(col("db"), col("b")).as("rv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"),
            rank(col("da"), col("a")).as("rv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.rv").as("rv"))
      .localCheckpoint(true) // feeds wedge pairs + the closing probe
    val e1 = oriented.select(col("u"), col("v").as("x"), col("rv").as("rx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("rv").as("ry"))
    val wedges = e1.join(e2, Seq("u")).filter(col("rx") < col("ry"))
    val closing = oriented.select(col("u").as("cu"), col("v").as("cv"))
    val tri = wedges.join(closing,
        wedges("x") === closing("cu") && wedges("y") === closing("cv"))
      .agg(count(lit(1)).as("n_triangles"))
    // merge the four single-row aggregates by union+max (a constant-key
    // join would constant-fold into a nested-loop cross)
    val nl = lit(null).cast("long")
    def row(nn: Column, ne: Column, nw: Column, nt: Column) =
      Seq(nn.as("n_nodes"), ne.as("n_edges"), nw.as("n_wedges"),
        nt.as("n_triangles"))
    val parts = Seq(
      nodes.agg(count(lit(1)).as("c")).select(row(col("c"), nl, nl, nl): _*),
      und.agg(count(lit(1)).as("c")).select(row(nl, col("c"), nl, nl): _*),
      deg.agg(sum(expr("(deg * (deg - 1)) DIV 2")).as("c"))
        .select(row(nl, nl, col("c"), nl): _*),
      tri.select(row(nl, nl, nl, col("n_triangles")): _*))
    parts.reduce(_ unionAll _)
      .agg(max("n_nodes").as("n_nodes"), max("n_edges").as("n_edges"),
        max("n_wedges").as("n_wedges"), max("n_triangles").as("n_triangles"))
      .withColumn("clustering",
        (col("n_triangles") * 3L).cast("double") /
          col("n_wedges").cast("double"))
  }

  val qTriangleCountSql: String = {
    val links = (1 to 3).map { k =>
      s"""SELECT id AS src, ${duckHex4(s"CAST(id AS VARCHAR) || '#L$k'")}
         |  % (SELECT n FROM nn) AS dst FROM nodes""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |dedges AS ($links),
       |und AS (
       |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM dedges WHERE src <> dst),
       |deg AS (SELECT v, COUNT(*) AS deg FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b FROM und)
       |  GROUP BY v),
       |orient AS (
       |  SELECT CASE WHEN da.deg * 4294967296 + a < db.deg * 4294967296 + b
       |              THEN a ELSE b END AS u,
       |         CASE WHEN da.deg * 4294967296 + a < db.deg * 4294967296 + b
       |              THEN b ELSE a END AS v,
       |         CASE WHEN da.deg * 4294967296 + a < db.deg * 4294967296 + b
       |              THEN db.deg * 4294967296 + b
       |              ELSE da.deg * 4294967296 + a END AS rv
       |  FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
       |wedge AS (
       |  SELECT e1.v AS x, e2.v AS y
       |  FROM orient e1 JOIN orient e2 ON e1.u = e2.u AND e1.rv < e2.rv),
       |tri AS (
       |  SELECT COUNT(*) AS n_triangles
       |  FROM wedge w JOIN orient e ON e.u = w.x AND e.v = w.y),
       |wcnt AS (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) AS n_wedges
       |         FROM deg),
       |ecnt AS (SELECT COUNT(*) AS n_edges FROM und)
       |SELECT nn.n AS n_nodes, ecnt.n_edges, wcnt.n_wedges, tri.n_triangles,
       |  CAST(tri.n_triangles * 3 AS DOUBLE) / CAST(wcnt.n_wedges AS DOUBLE)
       |    AS clustering
       |FROM nn, ecnt, wcnt, tri""".stripMargin
  }

  private def duckHex4(x: String): String =
    (1 to 4).map { i =>
      val w = math.pow(16, 4 - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($x), $i, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")

  val qPageRankSql: String = {
    val links = (1 to 3).map { k =>
      s"""SELECT id AS src, ${duckHex4(s"CAST(id AS VARCHAR) || '#L$k'")}
         |  % (SELECT n FROM nn) AS dst FROM nodes""".stripMargin
    }.mkString("\n  UNION ALL ")
    val iters = (1 to Iters).map { i =>
      s"""r$i AS (SELECT nodes.id,
         |  CAST(((1000000000000 // (SELECT n FROM nn)) * 15) // 100
         |   + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS id, CAST(SUM(r.r // d.deg) AS BIGINT) AS c
         |    FROM edges e JOIN degs d ON d.src = e.src
         |    JOIN r${i - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.id = nodes.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |edges AS (SELECT DISTINCT src, dst FROM (
       |  $links)),
       |degs AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT id, (1000000000000 // (SELECT n FROM nn)) AS r
       |       FROM nodes),
       |$iters
       |SELECT id AS doc_id, r AS pr FROM r$Iters ORDER BY pr DESC, doc_id
       |""".stripMargin
  }

  // ---- label-propagation communities -----------------------------------

  private val LpaIters = 4

  /** Label-propagation community detection (Raghavan 2007) over the
    * undirected document link graph — the third structural signal
    * beside [[qPageRank]] (importance) and [[qTriangleCount]]
    * (closure): link-farm rings and template families collapse into
    * single communities a curation pass can cap or down-weight.
    *
    * This is the DETERMINISTIC synchronous variant: every node starts
    * as its own label; each iteration every node adopts the most
    * frequent label among its neighbors, ties broken by SMALLEST
    * label, [[LpaIters]] fixed iterations (classic async LPA visits
    * nodes in random order — useless under a cross-engine hash gate).
    * Isolated nodes keep their own label via the left-join coalesce.
    *
    * Scale shape: per iteration ONE hash join (neighbor labels onto
    * the adjacency list) + a two-level partial+final aggregation
    * ((node, label) counts, then the per-node argmax as max over
    * (count, −label) structs — no window, no sort); labels are
    * localCheckpoint'ed per iteration exactly like [[pageRank]]'s
    * ranks, so lineage stays one-iteration deep. Shuffle volume is
    * O(#edges) per iteration, driver state zero. */
  def qCommunityLpa(s: SparkSession, dir: String): DataFrame = {
    val nodes = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"))
    val n = nodes.count()
    val targets = (1 to 3).map(k =>
      hex4(concat(col("id").cast("string"), lit(s"#L$k"))) % n)
    val und = nodes
      .select(col("id").as("src"), explode(array(targets: _*)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    // checkpointed PRE-PARTITIONED on the per-iteration join key: the
    // LogicalRDD keeps the hash(nb) layout, so each iteration's join
    // reuses it and only the (node-sized) label table shuffles — the
    // adjacency side (2x edges, the big side) re-exchanged every
    // iteration before (guide §2.4, same fix as pageRank's edge cache)
    val adj = und.select(col("a").as("id"), col("b").as("nb"))
      .unionAll(und.select(col("b").as("id"), col("a").as("nb")))
      .repartition(col("nb"))
      .localCheckpoint(true) // reused every iteration
    var labels = nodes.select(col("id"), col("id").as("lbl"))
    for (i <- 1 to LpaIters) {
      val mode = adj
        .join(labels.select(col("id").as("nb"), col("lbl")), "nb")
        .groupBy("id", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("id")
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("mlbl"))
      labels = labels.join(mode, Seq("id"), "left")
        .select(col("id"), coalesce(col("mlbl"), col("lbl")).as("lbl"))
      // lineage truncation every other iteration — a per-iteration
      // eager checkpoint serialized one store-everything job per round
      if (i % 2 == 0 || i == LpaIters) labels = iterCheckpoint(labels)
    }
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("csize"))
    labels.join(sizes, "lbl")
      .select(col("id").as("doc_id"), col("lbl").as("community"),
        col("csize"))
      .orderBy("doc_id")
  }

  val qCommunityLpaSql: String = {
    val links = (1 to 3).map { k =>
      s"""SELECT id AS src, ${duckHex4(s"CAST(id AS VARCHAR) || '#L$k'")}
         |  % (SELECT n FROM nn) AS dst FROM nodes""".stripMargin
    }.mkString("\n  UNION ALL ")
    val iters = (1 to LpaIters).map { i =>
      s"""l$i AS (
         |  SELECT p.id, COALESCE(m.mlbl, p.lbl) AS lbl
         |  FROM l${i - 1} p LEFT JOIN (
         |    SELECT id, lbl AS mlbl FROM (
         |      SELECT a.id, l.lbl, COUNT(*) AS c,
         |        ROW_NUMBER() OVER (PARTITION BY a.id
         |          ORDER BY COUNT(*) DESC, l.lbl) AS rn
         |      FROM adj a JOIN l${i - 1} l ON l.id = a.nb
         |      GROUP BY a.id, l.lbl)
         |    WHERE rn = 1) m ON m.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |  FROM ($links) WHERE src <> dst),
       |adj AS (SELECT a AS id, b AS nb FROM und
       |        UNION ALL SELECT b, a FROM und),
       |l0 AS (SELECT id, id AS lbl FROM nodes),
       |$iters,
       |sizes AS (SELECT lbl, COUNT(*) AS csize FROM l$LpaIters GROUP BY lbl)
       |SELECT l.id AS doc_id, l.lbl AS community, s.csize
       |FROM l$LpaIters l JOIN sizes s ON s.lbl = l.lbl
       |ORDER BY doc_id
       |""".stripMargin
  }

  private val BfsDepth = 6

  /** Single-source BFS shortest hop counts over the directed document
    * link graph — the graph primitive beside [[qPageRank]] (crawl
    * distance from a trusted seed is a classic quality prior, and the
    * frontier loop is the Pregel iteration shape every other
    * message-passing algorithm reuses).
    *
    * Spark-first iterative frontier expansion: level h's frontier =
    * (frontier-at-h−1 ⋈ edges).dst minus everything already visited
    * (left_anti) — one hash join + one anti join per level, shuffle
    * O(#edges touched), NO driver state beyond the loop counter.
    * Each level is `localCheckpoint`ed so the plan stays one-level
    * deep (the same lineage-capping discipline as [[pageRank]] —
    * without it level h replans h joins deep and a retry re-executes
    * the whole cascade). Exactly-once level assignment is structural:
    * a node enters `visited` at the FIRST level that reaches it, so
    * hops = the true BFS distance; integer hops → bit-stable oracle.
    *
    * The oracle replays reachability in DuckDB as a depth-bounded
    * recursive CTE + MIN(hops) — semantically min-hop distance, the
    * definition BFS computes level-at-a-time. */
  def qGraphBfs(s: SparkSession, dir: String): DataFrame = {
    val sp = s; import sp.implicits._
    val nodes = t(s, dir, "documents")
      .select(col("doc_id").cast("long").as("id"))
    val n = nodes.count()
    val targets = (1 to 3).map(k =>
      hex4(concat(col("id").cast("string"), lit(s"#L$k"))) % n)
    val edges = nodes
      .select(col("id").as("src"), explode(array(targets: _*)).as("dst"))
      .distinct()
      // pre-partitioned on the per-level join key so every frontier
      // expansion reuses the layout (only the frontier shuffles)
      .repartition(col("src"))
      .localCheckpoint(true) // reused every level: scan once, not 6×
    var frontier = Seq((0L, 0)).toDF("id", "hops")
    var visited = frontier
    for (h <- 1 to BfsDepth) {
      frontier = frontier
        .join(edges, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .withColumn("hops", lit(h))
      frontier = iterCheckpoint(frontier)
      visited = iterCheckpoint(visited.unionByName(frontier))
    }
    visited.orderBy("id")
  }

  val qGraphBfsSql: String = {
    val links = (1 to 3).map { k =>
      s"""SELECT id AS src, ${duckHex4(s"CAST(id AS VARCHAR) || '#L$k'")}
         |  % (SELECT n FROM nn) AS dst FROM nodes""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE
       |nodes AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |nn AS (SELECT COUNT(*) AS n FROM nodes),
       |edges AS (SELECT DISTINCT src, dst FROM (
       |  $links)),
       |walk(id, hops) AS (
       |  SELECT CAST(0 AS BIGINT), 0
       |  UNION
       |  SELECT e.dst, w.hops + 1 FROM walk w JOIN edges e ON e.src = w.id
       |  WHERE w.hops < $BfsDepth)
       |SELECT id, CAST(MIN(hops) AS INT) AS hops FROM walk
       |GROUP BY id ORDER BY id
       |""".stripMargin
  }
}
