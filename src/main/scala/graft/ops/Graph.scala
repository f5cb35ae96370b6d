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
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist()
    withDeg.count() // materialize once; 6 iterations re-read it
    var ranks = nodes.select(col("id"), lit(r0).as("r"))
    for (_ <- 1 to Iters) {
      val contrib = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      ranks = nodes
        .join(contrib, nodes("id") === contrib("dst"), "left")
        .select(nodes("id"),
          (lit(teleport) + expr("(85 * coalesce(c, 0L)) DIV 100")).as("r"))
        .localCheckpoint(true)
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
}
