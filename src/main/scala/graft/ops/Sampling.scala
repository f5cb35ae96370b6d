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
}
