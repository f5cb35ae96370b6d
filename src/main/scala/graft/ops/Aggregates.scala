package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Extended aggregation surface (SURVEY §2.4 "free wins" — absent in
  * the reference, declared Spark-native): statistical aggregates,
  * exact and approximate percentiles, distinct aggregation, grouping
  * sets / cube / rollup, and ordered collection aggregates.
  *
  * Scale notes: all of these run as partial+final hash aggregation
  * (map-side combine) in Spark; approx_count_distinct (HLL) and
  * approx percentile (KLL-ish sketch) are the 100 TB path where exact
  * distinct/percentile would shuffle the full column.
  */
object Aggregates {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Statistical aggregates per group: stddev/variance (sample +
    * population), correlation, covariance — rounded to 6dp for
    * cross-engine float stability. */
  def qStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(stddev_pop(col("l_discount")), 6).as("sdp_disc"),
        round(var_pop(col("l_discount")), 6).as("varp_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        // covariance magnitude ~1e5: parallel-merge fp drift exceeds
        // 1e-6, so round coarser than the normalized stats
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("cov_qp"))
      .orderBy(col("l_returnflag"))

  val qStatsSql: String = """
    SELECT l_returnflag,
      ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
      ROUND(VAR_SAMP(l_quantity), 6) AS var_qty,
      ROUND(STDDEV_POP(l_discount), 6) AS sdp_disc,
      ROUND(VAR_POP(l_discount), 6) AS varp_disc,
      ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
      ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_qp
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """.trim

  /** Exact percentiles (median + p90, interpolated). At 100 TB the
    * approx sketch below replaces this. */
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(median(col("o_totalprice")), 6).as("med_price"),
        round(percentile(col("o_totalprice"), lit(0.9)), 6).as("p90_price"),
        round(percentile(col("o_totalprice"), lit(0.1)), 6).as("p10_price"))
      .orderBy(col("o_orderpriority"))

  val qPercentileSql: String = """
    SELECT o_orderpriority,
      ROUND(MEDIAN(o_totalprice), 6) AS med_price,
      ROUND(QUANTILE_CONT(o_totalprice, 0.9), 6) AS p90_price,
      ROUND(QUANTILE_CONT(o_totalprice, 0.1), 6) AS p10_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** DISTINCT aggregation (absent in reference — declared native). */
  def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_supps"),
        round(sum_distinct(col("l_quantity")), 6).as("sumd_qty"))
      .orderBy(col("l_returnflag"))

  val qDistinctAggSql: String = """
    SELECT l_returnflag,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supps,
      ROUND(SUM(DISTINCT l_quantity), 6) AS sumd_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """.trim

  /** ROLLUP: priority × status hierarchy with subtotals + grand total.
    * grouping() distinguishes the subtotal rows. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).as("is_subtotal"))
      .orderBy(col("o_orderpriority").asc_nulls_last,
        col("o_orderstatus").asc_nulls_last)

  val qRollupSql: String = s"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      ${dsumSql("o_totalprice")} AS total,
      CAST(GROUPING(o_orderstatus) AS INTEGER) AS is_subtotal
    FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST
  """.trim

  /** CUBE over two dimensions of events. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .cube(col("event_type"), date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_v"))
      .orderBy(col("event_type").asc_nulls_last, col("wk").asc_nulls_last)

  val qCubeSql: String = """
    SELECT event_type, DATE_TRUNC('week', ts) AS wk, COUNT(*) AS n,
      ROUND(SUM(value), 4) AS sum_v
    FROM events GROUP BY CUBE(event_type, DATE_TRUNC('week', ts))
    ORDER BY event_type ASC NULLS LAST, wk ASC NULLS LAST
  """.trim

  /** GROUPING SETS via the SQL surface (DataFrame API has no direct
    * grouping-sets builder; this is the idiomatic Spark route). */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(s"""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      ORDER BY o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST
    """)
  }

  val qGroupingSetsSql: String = """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    ORDER BY o_orderpriority ASC NULLS LAST, o_orderstatus ASC NULLS LAST
  """.trim

  /** Ordered collection aggregates, canonicalized to a joined string so
    * the hash compare is array-order-independent. */
  def qCollect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  val qCollectSql: String = """
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
      COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
  """.trim

  /** Pivot (long → wide; Spark-native extension): order counts by
    * priority × status. Pivot values are pinned explicitly — at 100 TB
    * you never let pivot() run its implicit distinct-collect pass. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderpriority"))

  val qPivotSql: String = """
    SELECT o_orderpriority,
      COUNT(*) FILTER (o_orderstatus = 'F') AS F,
      COUNT(*) FILTER (o_orderstatus = 'O') AS O,
      COUNT(*) FILTER (o_orderstatus = 'P') AS P
    FROM orders GROUP BY 1 ORDER BY o_orderpriority
  """.trim

  /** Unpivot/melt — the reshape dual of pivot (Spark 4 `Dataset
    * .unpivot`, Arrow-land's wide→long): measure columns become
    * (measure, value) rows. Pure per-row expansion (Catalyst Expand),
    * no shuffle until the final ORDER BY. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        col("o_custkey").cast("double").as("o_custkey"),
        col("o_totalprice"))
      .unpivot(Array(col("o_orderkey")),
        Array(col("o_custkey"), col("o_totalprice")), "measure", "value")
      .orderBy("o_orderkey", "measure")

  val qUnpivotSql: String = """
    SELECT o_orderkey, 'o_custkey' AS measure, CAST(o_custkey AS DOUBLE) AS value
    FROM orders WHERE o_orderkey < 100
    UNION ALL
    SELECT o_orderkey, 'o_totalprice', o_totalprice
    FROM orders WHERE o_orderkey < 100
    ORDER BY o_orderkey, measure
  """.trim

  /** Approximate distinct (HLL) — the 100 TB path for cardinality.
    * Sketch ESTIMATES are engine-specific, so the query emits the
    * exact distincts plus within-bound flags: |approx − exact| ≤
    * 0.15·exact, i.e. 3σ of the default rsd = 0.05 — and the oracle
    * states the flags as `true` (the same bounded-oracle pattern as
    * `hll_sketch`). The estimate is deterministic for a given input,
    * so this is a stable hash check, not a flaky statistical one;
    * AggregatesSpec additionally pins a tighter 5% bound at rsd 0.02.
    * The exact recount here is the verification harness — production
    * keeps only the approx aggregation. */
  /** Two DISTINCT columns under one GROUP BY would plan through
    * Expand ×3 (every input row triplicated, then hash-aggregated into
    * a |flag|×(|partkey|+|orderkey|) -entry map — the expanded partial
    * aggregate was this query's entire cost). Splitting per distinct
    * column plans each side as the Expand-free single-distinct form
    * (partial agg keyed (flag, key) — a 3× smaller hash map fed 3×
    * fewer rows), the two independent subtrees' stages schedule
    * concurrently, and the 3-row join back is a broadcast. Same exact
    * counts, same flags, same order — only the plan shape changed. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val parts = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("parts_exact"),
        approx_count_distinct(col("l_partkey")).as("ap"))
    val orders = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orders_exact"),
        approx_count_distinct(col("l_orderkey")).as("ao"))
    parts.join(orders, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("parts_exact"), col("orders_exact"),
        (abs(col("ap") - col("parts_exact")) <=
          col("parts_exact").cast("double") * 0.15).as("parts_ok"),
        (abs(col("ao") - col("orders_exact")) <=
          col("orders_exact").cast("double") * 0.15).as("orders_ok"))
      .orderBy(col("l_returnflag"))
  }

  val qApproxDistinctSql: String = """
    SELECT l_returnflag,
      COUNT(DISTINCT l_partkey) AS parts_exact,
      COUNT(DISTINCT l_orderkey) AS orders_exact,
      true AS parts_ok, true AS orders_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """.trim

  /** MERGEABLE HLL sketches (Apache DataSketches `hll_sketch_agg` /
    * `hll_union_agg`) — what `approx_count_distinct` cannot do: the
    * sketch itself is a first-class value, so per-partition /
    * per-source / per-day sketches can be PERSISTED and UNIONED later
    * without touching raw data again. At 100 TB this is the
    * cardinality architecture: daily partial sketches, any rollup =
    * sketch union, never a rescan. The '__all__' row is exactly that
    * rollup — built from the per-source sketches, NOT from the table.
    * Sketch bytes are engine-specific, so the query emits exact
    * distincts plus a within-5%-of-exact flag the oracle states as
    * `true` (the exact-global recount here is the verification
    * harness, not the production path). */
  def qHllSketch(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val perSource = d.groupBy(col("source"))
      .agg(hll_sketch_agg(col("doc_id")).as("sk"),
        countDistinct(col("doc_id")).as("n_exact"))
    val bySource = perSource.select(col("source"), col("n_exact"),
      (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
        col("n_exact").cast("double") * 0.05).as("est_ok"))
    // doc_id is the table's key: per-source distinct sets are disjoint,
    // so the global exact is the SUM of per-source exacts — and the
    // oracle recomputes global COUNT(DISTINCT) from the raw table, so
    // a violated assumption would hash-mismatch, not silently pass
    val globalRow = perSource
      .agg(hll_union_agg(col("sk")).as("sk"), sum(col("n_exact")).as("n_exact"))
      .select(lit("__all__").as("source"), col("n_exact"),
        (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
          col("n_exact").cast("double") * 0.05).as("est_ok"))
    bySource.unionByName(globalRow).orderBy("source")
  }

  val qHllSketchSql: String = """
    SELECT source, COUNT(DISTINCT doc_id) AS n_exact, true AS est_ok
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__all__' AS source, COUNT(DISTINCT doc_id) AS n_exact, true AS est_ok
    FROM documents
    ORDER BY source
  """.trim

  /** Approximate percentiles (Greenwald–Khanna sketch,
    * `percentile_approx` accuracy 10000 → rank error ≤ N/10000) — the
    * 100 TB path where the exact interpolated percentile would shuffle
    * the full column per group. Sketch outputs are engine-specific, so
    * the query emits the exact median plus within-bracket flags — the
    * approx value must land inside the exact value bracket at q ± 0.03
    * (the bound AggregatesSpec has pinned since r3; GK returns a real
    * column element, so the interpolated ±3pt bracket is the value
    * form of its rank guarantee with wide margin) — and the oracle
    * states the flags as `true`. Deterministic, so a stable hash
    * check. */
  def qApproxQuantile(s: SparkSession, dir: String): DataFrame = {
    val tp = col("o_totalprice")
    // ARRAY-form percentile aggregates: the scalar form built one
    // full-values buffer (and one sort) PER quantile — five exact
    // buffers plus two GK sketches per group. One exact buffer serving
    // all five quantiles + one sketch serving both approx ranks is the
    // same math on the same buffer (Percentile evaluates each fraction
    // against one sorted run; Median IS Percentile(0.5)), so every
    // output value is bit-identical.
    val ex = percentile(tp,
      array(lit(0.47), lit(0.53), lit(0.87), lit(0.93), lit(0.5)))
    val ap = percentile_approx(tp, array(lit(0.5), lit(0.9)), lit(10000))
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(ap.as("ap"), ex.as("ex"))
      .select(col("o_orderpriority"),
        round(element_at(col("ex"), 5), 6).as("med_exact"),
        (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
          element_at(col("ap"), 1) <= element_at(col("ex"), 2))
          .as("median_ok"),
        (element_at(col("ap"), 2) >= element_at(col("ex"), 3) &&
          element_at(col("ap"), 2) <= element_at(col("ex"), 4))
          .as("p90_ok"))
      .orderBy(col("o_orderpriority"))
  }

  val qApproxQuantileSql: String = """
    SELECT o_orderpriority,
      ROUND(MEDIAN(o_totalprice), 6) AS med_exact,
      true AS median_ok, true AS p90_ok
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Argmin/argmax aggregates: per event type, the user behind the
    * first and last event. Ordering column event_id is unique, so the
    * arg is tie-free and cross-engine deterministic. */
  def qMinbyMaxby(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        min_by(col("user_id"), col("event_id")).as("first_user"),
        max_by(col("user_id"), col("event_id")).as("last_user"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .orderBy(col("event_type"))

  val qMinbyMaxbySql: String = """
    SELECT event_type,
      MIN_BY(user_id, event_id) AS first_user,
      MAX_BY(user_id, event_id) AS last_user,
      MIN(event_id) AS first_event, MAX(event_id) AS last_event
    FROM events GROUP BY event_type ORDER BY event_type
  """.trim

  /** Boolean and bitwise aggregates per nation over customer:
    * bool_and/bool_or short-circuit in the partial phase; bit ops are
    * associative+commutative so partial+final merge is exact. */
  def qBoolBitAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        bool_and(col("c_acctbal") > 0).as("all_positive"),
        bool_or(col("c_acctbal") > 9000).as("any_rich"),
        bit_and(col("c_custkey")).as("key_and"),
        bit_or(col("c_custkey")).as("key_or"),
        bit_xor(col("c_custkey")).as("key_xor"))
      .orderBy(col("c_nationkey"))

  val qBoolBitAggSql: String = """
    SELECT c_nationkey,
      BOOL_AND(c_acctbal > 0) AS all_positive,
      BOOL_OR(c_acctbal > 9000) AS any_rich,
      BIT_AND(c_custkey) AS key_and,
      BIT_OR(c_custkey) AS key_or,
      BIT_XOR(c_custkey) AS key_xor
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
  """.trim

  /** grouping()/grouping_id over CUBE: the metadata columns that let
    * a consumer tell a real NULL group key from a rolled-up subtotal
    * row — without them, CUBE output is ambiguous. Spark's
    * grouping_id bit order (first group col = MSB) matches the
    * g1*2+g2 reconstruction the oracle uses. */
  def qGroupingId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping(col("o_orderpriority")).as("g1"),
        grouping(col("o_orderstatus")).as("g2"),
        grouping_id().as("gid"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  val qGroupingIdSql: String = """
    SELECT o_orderpriority, o_orderstatus,
      CAST(GROUPING(o_orderpriority) AS TINYINT) AS g1,
      CAST(GROUPING(o_orderstatus) AS TINYINT) AS g2,
      CAST(GROUPING(o_orderpriority)*2 + GROUPING(o_orderstatus) AS BIGINT) AS gid,
      COUNT(*) AS n
    FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
  """.trim

  /** Higher-moment aggregates: Spark's skewness/kurtosis are the
    * POPULATION moments (m₃/m₂^1.5, m₄/m₂²−3); DuckDB's skewness is
    * sample-corrected and its kurtosis sample-excess, so the oracle
    * undoes the correction (·(n−2)/√(n(n−1))) and uses kurtosis_pop —
    * a worked example of the §1.2 rule that aggregate DEFINITIONS,
    * not just values, must be mapped across engines. Rounded 5 dp
    * (the skewness magnitudes here are ~1e-2 with ~1e-9 merge drift;
    * count_if rides along exact). */
  def qAggStats2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(skewness(col("l_quantity")), 5).as("skew_qty"),
        round(kurtosis(col("l_quantity")), 5).as("kurt_qty"),
        count_if(col("l_quantity") > 25).as("n_bulk"))
      .orderBy(col("l_returnflag"))

  val qAggStats2Sql: String = """
    SELECT l_returnflag,
      ROUND(skewness(l_quantity) * (COUNT(*) - 2)
        / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 5) AS skew_qty,
      ROUND(kurtosis_pop(l_quantity), 5) AS kurt_qty,
      CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """.trim

  /** Linear-regression aggregates (regr_slope/intercept/r2/count):
    * single-pass moment accumulation, partial+final merged — rounded
    * like qStats because cross-partition moment merges drift in the
    * last float bits (intercept magnitude ~2.5e5 → 2 dp). */
  def qRegrAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(regr_slope(col("o_totalprice"), col("o_custkey")), 6).as("slope"),
        round(regr_intercept(col("o_totalprice"), col("o_custkey")), 2).as("icept"),
        round(regr_r2(col("o_totalprice"), col("o_custkey")), 6).as("r2"),
        regr_count(col("o_totalprice"), col("o_custkey")).as("n"))
      .orderBy(col("o_orderpriority"))

  val qRegrAggSql: String = """
    SELECT o_orderpriority,
      ROUND(regr_slope(o_totalprice, o_custkey), 6) AS slope,
      ROUND(regr_intercept(o_totalprice, o_custkey), 2) AS icept,
      ROUND(regr_r2(o_totalprice, o_custkey), 6) AS r2,
      CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Ordered string aggregation per region: deterministic via
    * sort_array before the join — the Spark shape (collect_list →
    * sort_array → concat_ws) makes the order explicit instead of
    * relying on an ORDER BY inside the aggregate. */
  def qStringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  val qStringAggSql: String = """
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
      COUNT(*) AS n
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
  """.trim

  /** NATIVE ordered string aggregation — `listagg(x, sep) WITHIN
    * GROUP (ORDER BY ...)` (SQL:2016, Spark 4) — vs `string_agg`'s
    * manual collect_list→sort_array→concat_ws composition: the agg
    * itself owns the ordering contract, so there is no window where
    * an unordered intermediate could leak. Suppliers per nation
    * ordered DESC to exercise a non-default direction. */
  def qListagg(s: SparkSession, dir: String): DataFrame = {
    val sess = graft.Session(s)
    sess.registerTable("supplier", graft.sources.Tables(s, dir, "supplier"))
    sess.sql("""
      SELECT s_nationkey,
        listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name DESC) AS names,
        COUNT(*) AS n
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")
  }

  val qListaggSql: String = """
    SELECT s_nationkey,
      STRING_AGG(s_name, '|' ORDER BY s_name DESC) AS names,
      COUNT(*) AS n
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
  """.trim
}
