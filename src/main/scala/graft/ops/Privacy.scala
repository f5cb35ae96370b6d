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

  /** Redact digit runs from the display name (the fixture's only
    * PII-shaped content), attach the stable pseudonym, and coarsen
    * the account balance to a 1000-unit bucket (k-anonymity-style
    * generalization of a quasi-identifier). */
  def qPiiRedact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("redacted_name"),
        substring(sha2(col("c_name"), 256), 1, 16).as("pseudonym"),
        (floor(col("c_acctbal") / 1000) * 1000).cast(LongType).as("acctbal_bucket"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  val qPiiRedactSql: String = """
    SELECT c_custkey,
      regexp_replace(c_name, '[0-9]', 'X', 'g') AS redacted_name,
      substr(sha256(c_name), 1, 16) AS pseudonym,
      CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_bucket,
      c_mktsegment
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
  """.trim
}
