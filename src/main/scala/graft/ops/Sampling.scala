package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Deterministic dataset splitting for training-data pipelines
  * (builder brief: the operations a large-scale pipeline needs).
  *
  * The split is a pure function of the stable document key — bucket =
  * two md5 hex nibbles of `doc_id` mod 100-ish — NOT `df.sample()`:
  * a random sample's membership depends on partitioning and seed
  * plumbing, while a key-hash split is reproducible across engines,
  * runs, repartitions, and incremental re-ingests (a re-processed doc
  * always lands in the same split — the property leakage audits rely
  * on). The hex-nibble arithmetic is chosen to be expressible
  * identically in Spark and the DuckDB oracle (no engine-specific
  * hash function on either side).
  *
  * Scale shape: one scan, per-row codegen'd expressions, one
  * partial+final agg — no shuffle besides the 3-group agg.
  */
object Sampling {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private val HexDigits = "0123456789abcdef"

  /** 0-15 value of the i-th (1-based) hex digit of `h`. */
  private def nibble(h: Column, i: Int): Column =
    call_function("instr", lit(HexDigits), substring(h, i, 1)) - 1

  /** Deterministic 0-255 hash bucket of a key column (two leading md5
    * nibbles), and the 80/10/10 split label derived from it. */
  private[graft] def splitLabel(key: Column): Column = {
    val h = md5(key.cast(StringType))
    val bucket = (nibble(h, 1) * 16 + nibble(h, 2)) % 10
    when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
  }

  /** Declared query: split profile — how many docs and chars landed in
    * each of train/val/test. The oracle recomputes the identical md5
    * assignment, so the hash check proves split membership matches
    * doc-for-doc, not just in aggregate. */
  def qDataSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("split", splitLabel(col("doc_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy("split")

  val qDataSplitSql: String = """
    WITH b AS (
      SELECT doc_id, n_chars,
        (((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 10) AS bucket
      FROM documents),
    s AS (
      SELECT doc_id, n_chars,
        CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
             ELSE 'test' END AS split
      FROM b)
    SELECT split, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM s GROUP BY split ORDER BY split
  """.trim

  /** Tokens per packed training sequence (fixture-sized; a real run
    * would use the model's context length). */
  private val SeqBudget = 256

  /** Sequence packing — the assembly step that turns a cleaned corpus
    * into fixed-token-budget training sequences: documents are laid
    * out on a per-language concat stream in stable doc_id order, and
    * each doc joins the sequence its starting token offset falls in
    * (concat-then-chunk packing; a doc may straddle its sequence's end
    * — the tail spills into the next chunk, standard for pretraining).
    *
    * Scale shape: the running offset is a window cumsum PARTITIONED BY
    * lang — never a global single-partition sort. One shuffle for the
    * window, one partial+final agg on (lang, seq_id). With one giant
    * partition key you'd switch to the two-phase form (per-partition
    * sums, broadcast prefix offsets) — same algebra, still no global
    * sort. */
  def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tok")) / lit(SeqBudget)))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "seq_id")
  }

  val qSeqPackSql: String = s"""
    WITH d AS (
      SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
    c AS (
      SELECT lang, doc_id, n_tok,
        SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS cum
      FROM d),
    a AS (
      SELECT lang, doc_id, n_tok,
        CAST(FLOOR((cum - n_tok) / $SeqBudget) AS BIGINT) AS seq_id
      FROM c)
    SELECT lang, seq_id, COUNT(*) AS n_docs,
      CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
      MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM a GROUP BY lang, seq_id ORDER BY lang, seq_id
  """.trim

  /** Per-stratum keep rate, per mille: open orders downsampled hard
    * (they dominate the table), finished kept at 25%, the rare
    * pending stratum kept whole — the class-rebalancing move every
    * training-mix builder makes. */
  private val strataPerMille = Seq("O" -> 100, "F" -> 250, "P" -> 1000)

  /** Stratified sampling with a deterministic key-hash gate instead of
    * `df.stat.sampleBy`: membership is `(key * 48271) mod 1000 <
    * rate(stratum)` (48271 = the Lehmer/Park–Miller multiplier), so
    * the sample is reproducible across engines, runs, and
    * repartitions, and a re-ingested row never flips membership.
    * `sampleBy`'s Bernoulli draw can't promise any of that.
    *
    * Scale shape: the gate is one codegen'd row predicate — the
    * sample itself needs NO shuffle; only this summary's few-group
    * agg does. The multiplier spreads adjacent keys ~uniformly over
    * the mille range, so per-stratum realized rates concentrate
    * tightly around the target (asserted in SamplingSpec). */
  def qStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = strataPerMille.foldLeft(lit(0)) { case (acc, (k, r)) =>
      when(col("o_orderstatus") === k, r).otherwise(acc)
    }
    val kept = pmod(col("o_orderkey") * 48271L, lit(1000L)) < rate
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        min(when(kept, col("o_orderkey"))).as("first_kept"),
        max(when(kept, col("o_orderkey"))).as("last_kept"))
      .orderBy("o_orderstatus")
  }

  val qStratifiedSampleSql: String = """
    WITH k AS (
      SELECT o_orderstatus, o_orderkey,
        ((o_orderkey * 48271) % 1000) <
          CASE o_orderstatus WHEN 'O' THEN 100 WHEN 'F' THEN 250
            WHEN 'P' THEN 1000 ELSE 0 END AS kept
      FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n_total,
      CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      MIN(CASE WHEN kept THEN o_orderkey END) AS first_kept,
      MAX(CASE WHEN kept THEN o_orderkey END) AS last_kept
    FROM k GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim
}
