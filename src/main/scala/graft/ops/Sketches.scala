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

  val qHeavyHittersSql: String = """
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM w)
    SELECT word, COUNT(*) AS n, (SELECT n_total FROM tot) AS n_total
    FROM w GROUP BY word
    HAVING COUNT(*) >= CEIL(0.01 * (SELECT n_total FROM tot))
    ORDER BY n DESC, word
  """.trim
}
