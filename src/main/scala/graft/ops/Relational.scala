package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Relational operator queries covering SURVEY.md §2.2 (projection/
  * filter), §2.4 (aggregation), §2.6 (sort/limit/top-k) and the §2.10
  * query surface, expressed Spark-first: declarative DataFrame plans so
  * Catalyst does pushdown, pruning, partial aggregation and codegen.
  *
  * Every query carries a deterministic total ORDER BY so the driver's
  * hash compare is row-order-stable, and all double aggregates use the
  * exact-decimal helpers in `graft.ops` (see package.scala).
  */
object Relational {

  private def li(s: SparkSession, dir: String) = Tables(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables(s, dir, "orders")

  /** Flagship: TPC-H Q1 shape — scan→filter→prune→partial/final agg→
    * sort. Exercises every plan node the reference grammar can express
    * (DataFusion §2.10: single-table SELECT/WHERE/GROUP BY/ORDER BY).
    * Reference analogue: `rust/datafusion/src/sql/planner.rs:52-214`,
    * two-phase agg `execution/context.rs:272-310`. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    // fan-out AFTER the filter (pushdown stays on the scan): the
    // decimal aggregate is the CPU and a one-row-group file pins it to
    // one task; the guard makes this an identity at production scale,
    // and decimal sums are order-independent so the fan-out cannot
    // move a digit
    graft.ops.fanOutSmall(li(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(9, 4))))
          .cast(DoubleType).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """.trim

  /** Global (no GROUP BY) aggregation: min/max/sum/avg/count — the full
    * DataFusion aggregate surface (`expressions.rs:79-849`) plus
    * count(distinct) as declared Spark-native extension. */
  def qAggGlobal(s: SparkSession, dir: String): DataFrame =
    li(s, dir).agg(
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      dsum(col("l_extendedprice")).as("sum_price"),
      davg(col("l_extendedprice")).as("avg_price"),
      count(col("l_extendedprice")).as("cnt"),
      countDistinct(col("l_orderkey")).as("cnt_orders"))

  val qAggGlobalSql: String = """
    SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      COUNT(l_extendedprice) AS cnt,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS cnt_orders
    FROM lineitem
  """.trim

  /** Projection + filter with the full §2.8 binary-operator surface:
    * comparisons, AND/OR/NOT, arithmetic + - * / %. Per-row double
    * arithmetic is IEEE-deterministic, no aggregation involved. */
  def qFilterProj(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .filter(
        (col("l_quantity") > 30.0 && col("l_discount") <= 0.05) ||
        (!(col("l_returnflag") === "N") && col("l_tax") >= 0.07))
      .filter(col("l_linenumber") =!= 7)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"),
        (col("l_extendedprice") + col("l_tax")).as("plus_tax"),
        (col("l_extendedprice") - col("l_discount")).as("minus_disc"),
        (col("l_orderkey") % 7).as("mod7"),
        (col("l_quantity") / 2.0).as("half_qty"))
      // (l_orderkey,l_linenumber) is NOT unique in the fixture — order
      // by every output column so ties are bit-identical rows and the
      // result is totally deterministic across engines.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"),
        col("plus_tax"), col("minus_disc"), col("half_qty"))

  val qFilterProjSql: String = """
    SELECT l_orderkey, l_linenumber,
      l_extendedprice * (1.0 - l_discount) AS net_price,
      l_extendedprice + l_tax AS plus_tax,
      l_extendedprice - l_discount AS minus_disc,
      l_orderkey % 7 AS mod7,
      l_quantity / 2.0 AS half_qty
    FROM lineitem
    WHERE ((l_quantity > 30.0 AND l_discount <= 0.05)
           OR (NOT (l_returnflag = 'N') AND l_tax >= 0.07))
      AND l_linenumber <> 7
    ORDER BY l_orderkey, l_linenumber, net_price, plus_tax, minus_disc, half_qty
  """.trim

  /** IsIn semi-join filtering — the reference's join ceiling
    * (CK isin.h:45, SURVEY §2.3). */
  def qIsin(s: SparkSession, dir: String): DataFrame =
    ord(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))

  val qIsinSql: String = s"""
    SELECT o_orderstatus, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
  """.trim

  /** LIKE / NOT LIKE (Gandiva gdv_fn_like_utf8_utf8,
    * `function_registry_string.cc`). */
  def qLike(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .filter(col("p_type").like("%ECO%") &&
        !col("p_name").like("small%"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  val qLikeSql: String = """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE '%ECO%' AND p_name NOT LIKE 'small%'
    ORDER BY p_partkey
  """.trim

  /** CAST surface (§2.8; CK cast.cc 1,353 LoC). Unsafe-cast semantics:
    * double→int truncates toward zero in Spark non-ANSI, mirrored in
    * the oracle as CAST(TRUNC(x)). */
  def qCast(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        col("l_linenumber").cast(LongType).as("ln_long"),
        col("l_linenumber").cast(DoubleType).as("ln_dbl"),
        col("l_orderkey").cast(StringType).as("ok_str"),
        col("l_extendedprice").cast(DecimalType(18, 2)).cast(StringType)
          .as("price_str"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        col("l_returnflag").cast(StringType).as("rf"))
      .filter(col("l_orderkey") % 100 === 0)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_str"),
        col("qty_int"), col("ship_date"), col("rf"))

  val qCastSql: String = """
    SELECT l_orderkey, l_linenumber,
      CAST(TRUNC(l_quantity) AS INTEGER) AS qty_int,
      CAST(l_linenumber AS BIGINT) AS ln_long,
      CAST(l_linenumber AS DOUBLE) AS ln_dbl,
      CAST(l_orderkey AS VARCHAR) AS ok_str,
      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
      CAST(l_shipdate AS DATE) AS ship_date,
      CAST(l_returnflag AS VARCHAR) AS rf
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber, price_str, qty_int, ship_date, rf
  """.trim

  /** Multi-key sort + limit = top-k (§2.6). The reference's physical
    * sort is unimplemented (context.rs:356) and its Limit is unordered;
    * Spark's SortExec(range partitioned)+limit is the native analogue.
    * Unique tiebreak keys make the top-k deterministic. */
  def qTopK(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_quantity").asc)
      .limit(100)

  val qTopKSql: String = """
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
    LIMIT 100
  """.trim

  /** Grouped top-k through the engine's custom whole-operator
    * extension (`plans/TopKPerGroup`: LogicalPlan + SparkStrategy +
    * two-phase bounded-heap SparkPlan — no per-group sort, only
    * k·groups·partitions rows cross the shuffle). The (price desc,
    * orderkey asc) order is total, so output is deterministic. */
  def qTopKGroup(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup(
      ord(s, dir).select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      groupCols = Seq("o_orderstatus"),
      orderCols = Seq("o_totalprice" -> false, "o_orderkey" -> true),
      k = 5)
      .orderBy(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey"))

  val qTopKGroupSql: String = """
    WITH r AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM r WHERE rn <= 5
    ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
  """.trim

  /** Plain LIMIT (reference LimitExec `limit.rs:33-160`) made
    * deterministic by sorting on the primary key first. */
  def qLimit(s: SparkSession, dir: String): DataFrame =
    ord(s, dir).orderBy(col("o_orderkey")).limit(25)

  val qLimitSql: String =
    "SELECT * FROM orders ORDER BY o_orderkey LIMIT 25"

  /** LIMIT with OFFSET (pagination surface; the reference's LimitExec
    * has no offset — Spark-native extension). */
  def qLimitOffset(s: SparkSession, dir: String): DataFrame =
    ord(s, dir).orderBy(col("o_orderkey")).offset(10).limit(5)

  val qLimitOffsetSql: String =
    "SELECT * FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 10"

  /** Unique / distinct values (CK hash.h:47 Unique kernel). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    li(s, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qDistinctSql: String = """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem ORDER BY l_returnflag, l_linestatus
  """.trim

  /** Take — positional gather, the public form (reference:
    * cpp/src/arrow/compute/kernels/take.cc — output[i] =
    * input[indices[i]], index order preserved, repeats allowed). Spark
    * has no row POSITION, so the operator defines one: the two-phase
    * global id assignment from [[Sampling.globalIds]] (range-partition
    * sort + zipWithIndex — no single-reducer window) over a declared
    * total order, then a broadcast hash join of the tiny (ord, pos)
    * index list gathers the rows; `ord` carries the index-list order
    * to the output exactly as the kernel contract requires.
    *
    * Scale shape: the corpus side never sorts globally and never
    * moves — only id assignment shuffles; the index list is the
    * broadcast side. A billion-row gather list would instead shuffle
    * both sides on pos — same join, swapped build side. */
  private val TakeIndices: Seq[(Int, Long)] =
    Seq(0 -> 41L, 1 -> 7L, 2 -> 7L, 3 -> 0L, 4 -> 499L, 5 -> 123L,
      6 -> 250L, 7 -> 42L)

  /** The general operator: gather `indices` (index-list order, repeats
    * allowed) from `df` positioned by a total order over `orderCols`.
    *
    * Bounds contract (TakeOptions analogue, take_test.cc): with
    * `boundscheck = true` (the default, matching the reference) any
    * index outside [0, rowCount) raises IndexOutOfBoundsException
    * eagerly — the kernel surfaces caller bugs as errors, never as
    * silently absent rows. `boundscheck = false` is the unchecked
    * fast path; out-of-range positions simply match nothing. The
    * validation count is one metadata-cheap job on the input, driver
    * state O(1). */
  def takeGather(s: SparkSession, df: DataFrame, orderCols: Seq[String],
      indices: Seq[(Int, Long)], boundscheck: Boolean = true): DataFrame = {
    import s.implicits._
    if (boundscheck) {
      indices.find(_._2 < 0).foreach { case (o, p) =>
        throw new IndexOutOfBoundsException(
          s"Take index $p (ord $o) is negative") }
      val n = df.count()
      indices.find(_._2 >= n).foreach { case (o, p) =>
        throw new IndexOutOfBoundsException(
          s"Take index $p (ord $o) out of bounds [0, $n)") }
    }
    val ids = Sampling.globalIds(s, df, orderCols, "pos")
    val index = indices.toDF("ord", "take_pos")
    ids.join(broadcast(index), col("pos") === col("take_pos"))
      .drop("take_pos")
      .orderBy(col("ord"))
  }

  def qTakeGather(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    takeGather(s, docs, Seq("doc_id"), TakeIndices)
      .select(col("ord"), col("pos"), col("doc_id"), col("source"))
  }

  val qTakeGatherSql: String = """
    WITH ids AS (
      SELECT doc_id, source,
        row_number() OVER (ORDER BY doc_id) - 1 AS pos FROM documents),
    idx(ord, take_pos) AS (VALUES (0, 41), (1, 7), (2, 7), (3, 0),
      (4, 499), (5, 123), (6, 250), (7, 42))
    SELECT ord, pos, doc_id, source FROM idx JOIN ids ON pos = take_pos
    ORDER BY ord
  """.trim

  /** ValueCounts (CK hash.h:69 → {values,counts}); JS countBy. */
  def qValueCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  val qValueCountsSql: String = """
    SELECT event_type, COUNT(*) AS cnt FROM events
    GROUP BY event_type ORDER BY event_type
  """.trim

  /** MIN/MAX pair per group (CK minmax.h returns both at once). */
  def qMinMaxGroup(s: SparkSession, dir: String): DataFrame =
    ord(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        min(col("o_totalprice")).as("min_total"),
        max(col("o_totalprice")).as("max_total"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  val qMinMaxGroupSql: String = """
    SELECT o_orderpriority,
      min(o_totalprice) AS min_total, max(o_totalprice) AS max_total,
      min(o_orderdate) AS first_date, max(o_orderdate) AS last_date,
      COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim
}
