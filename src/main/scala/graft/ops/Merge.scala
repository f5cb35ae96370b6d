package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** CDC apply / upsert — the MERGE INTO pattern expressed as a join
  * (OSS Spark has no ACID merge without a table format; the JOIN
  * rewrite below is the canonical shape and what a format's merge
  * compiles to anyway): target LEFT-OUTER-joins the update set on the
  * key, matched rows take the update's values, unmatched keep their
  * own, and not-matched-by-target updates append as inserts.
  *
  * Scale posture: the naive rewrite is a FULL OUTER join on the key —
  * but Spark cannot build a broadcast hash join for full outer, so a
  * small change set would still shuffle the whole fact table. Instead
  * the merge splits into (a) target LEFT OUTER broadcast-join changes
  * (matched rows take update values, unmatched keep their own — zero
  * fact shuffle) and (b) inserts = changes ANTI already-present keys,
  * where "already-present" is computed by a key-column-only broadcast
  * SEMI scan of the target (bounded by |changes|, so the anti join
  * broadcasts too). Net: two column-pruned fact scans, no fact
  * shuffle — strictly cheaper than shuffling 100 TB on the key. All
  * money arithmetic is exact decimal, so the result is
  * partitioning-independent.
  */
object Merge {

  /** Deterministic change set derived from the target itself: every
    * 97th order gets a status flip + a fixed 10.00 price adjustment
    * (updates; decimal ADDITION — exact, no rounding boundary, where
    * a percentage bump would hit engine rounding-mode differences at
    * the half-cent), plus five brand-new orders beyond the current
    * max key (inserts). */
  private def changeSet(orders: DataFrame): DataFrame = {
    val maxKey = orders.agg(max(col("o_orderkey"))).head.getLong(0)
    val updates = orders
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("u_key"),
        lit("U").as("u_status"),
        (col("o_totalprice").cast(DecimalType(18, 2)) +
          lit(BigDecimal("10.00")).cast(DecimalType(4, 2)))
          .cast(DecimalType(18, 2)).as("u_price"))
    val inserts = orders.sparkSession.range(1, 6)
      .select((col("id") + maxKey).as("u_key"),
        lit("N").as("u_status"),
        lit(BigDecimal("1000.00")).cast(DecimalType(18, 2)).as("u_price"))
    updates.unionByName(inserts)
  }

  /** Declared query: apply the change set to `orders`, then profile
    * the merged table per status — proves matched rows updated,
    * unmatched untouched, and inserts appended, via the oracle's
    * independent reconstruction. */
  def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val changes = changeSet(orders)
    // matched + unmatched target rows, single fact scan, no shuffle
    val upserted = orders
      .join(broadcast(changes), col("o_orderkey") === col("u_key"), "left_outer")
      .select(
        col("o_orderkey").as("key"),
        coalesce(col("u_status"), col("o_orderstatus")).as("status"),
        coalesce(col("u_price"),
          col("o_totalprice").cast(DecimalType(18, 2))).as("price"))
    // change keys already present in the target: key-column-only scan,
    // result bounded by |changes| so it broadcasts into the anti join
    val present = orders.select(col("o_orderkey").as("u_key"))
      .join(broadcast(changes.select(col("u_key"))), Seq("u_key"), "left_semi")
    val inserts = changes
      .join(broadcast(present), Seq("u_key"), "left_anti")
      .select(col("u_key").as("key"), col("u_status").as("status"),
        col("u_price").as("price"))
    val merged = upserted.unionByName(inserts)
    merged.groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast(DecimalType(32, 2)).cast(DoubleType)
          .as("total_price"),
        max(col("key")).as("max_key"))
      .orderBy("status")
  }

  val qMergeUpsertSql: String = """
    WITH mx AS (SELECT MAX(o_orderkey) AS maxk FROM orders),
    changes AS (
      SELECT o_orderkey AS u_key, 'U' AS u_status,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) + CAST(10.00 AS DECIMAL(4,2)) AS DECIMAL(18,2)) AS u_price
      FROM orders WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT maxk + g.i, 'N', CAST(1000.00 AS DECIMAL(18,2))
      FROM mx, (SELECT unnest(range(1, 6)) AS i) g),
    merged AS (
      SELECT COALESCE(o.o_orderkey, c.u_key) AS key,
        COALESCE(c.u_status, o.o_orderstatus) AS status,
        COALESCE(c.u_price, CAST(o.o_totalprice AS DECIMAL(18,2))) AS price
      FROM orders o FULL OUTER JOIN changes c ON o.o_orderkey = c.u_key)
    SELECT status, COUNT(*) AS n,
      CAST(CAST(SUM(price) AS DECIMAL(32,2)) AS DOUBLE) AS total_price,
      MAX(key) AS max_key
    FROM merged GROUP BY status ORDER BY status
  """.trim

  // ---- incremental materialized-view maintenance -----------------------

  /** Incremental aggregate refresh — the standard "don't rescan the
    * lake" pattern for a 100 TB rollup: the view's aggregate STATE
    * (count / decimal sum / min / max per group — all mergeable
    * monoids under insert-only deltas) is persisted once over the
    * base data, and a refresh reads ONLY the new delta rows plus that
    * O(#groups) state, merging partials with a full-outer join. Here
    * base = orders before 1999, delta = the rest; the persisted state
    * lives in the pid-scoped egress scratch like the other sink
    * queries. The refresh never touches a base ROW — at scale the
    * refresh cost is O(delta + groups), not O(lake).
    *
    * The oracle recomputes the view from ALL rows, so the hash check
    * proves the merge algebra is exact: decimal sums are associative,
    * count adds, min/max take least/greatest (Spark's least/greatest
    * skip nulls, which handles groups present on only one side). */
  def qMvRefresh(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val cutoff = lit("1999-01-01").cast(TimestampType)
    def partial(df: DataFrame) = df
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sum_dec"),
        min(col("o_orderdate")).as("min_d"),
        max(col("o_orderdate")).as("max_d"))
    val stateDir = Egress.outRoot(dir) + "/mv_state"
    partial(orders.filter(col("o_orderdate") < cutoff))
      .write.mode("overwrite").parquet(stateDir)
    val base = s.read.parquet(stateDir)
      .select(col("o_orderpriority"), col("n").as("b_n"),
        col("sum_dec").as("b_sum"), col("min_d").as("b_min"),
        col("max_d").as("b_max"))
    val delta = partial(orders.filter(col("o_orderdate") >= cutoff))
      .select(col("o_orderpriority"), col("n").as("d_n"),
        col("sum_dec").as("d_sum"), col("min_d").as("d_min"),
        col("max_d").as("d_max"))
    base.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("b_sum"), lit(BigDecimal(0)).cast(DecimalType(28, 2))) +
          coalesce(col("d_sum"), lit(BigDecimal(0)).cast(DecimalType(28, 2))))
          .cast(DoubleType).as("sum_price"),
        least(col("b_min"), col("d_min")).as("min_date"),
        greatest(col("b_max"), col("d_max")).as("max_date"))
      .orderBy("o_orderpriority")
  }

  val qMvRefreshSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim
}
