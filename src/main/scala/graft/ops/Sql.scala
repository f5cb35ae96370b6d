package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Session

/** The SQL entry point (SURVEY §2.10.1): the same queries the driver
  * oracle runs in DuckDB, executed by Spark SQL through graft.Session.
  * One SQL string serves both engines — the strongest possible parity
  * statement for the reference's `ExecutionContext.sql` surface.
  */
object Sql {

  /** Dialect-portable SQL (runs verbatim on Spark AND DuckDB). */
  val flagshipSql: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """.trim

  val joinSql: String = """
    SELECT n_name, COUNT(*) AS n_cust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
  """.trim

  val subquerySql: String = """
    SELECT o_orderpriority, COUNT(*) AS n_big
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
  """.trim

  val caseWhenSql: String = """
    SELECT
      CASE WHEN l_quantity < 10 THEN 'low'
           WHEN l_quantity < 35 THEN 'mid'
           ELSE 'high' END AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
  """.trim

  /** Register only the tables the query touches — registering all ten
    * fixtures reads parquet footers of tables the query never scans
    * (a measurable per-query cost; at 100 TB an unacceptable one). */
  private def run(s: SparkSession, dir: String, sql: String,
      tables: String*): DataFrame = {
    val sess = Session(s)
    tables.foreach(n => sess.registerTable(n, graft.sources.Tables(s, dir, n)))
    sess.sql(sql)
  }

  def qSqlFlagship(s: SparkSession, dir: String): DataFrame =
    run(s, dir, flagshipSql, "lineitem")
  def qSqlJoin(s: SparkSession, dir: String): DataFrame =
    run(s, dir, joinSql, "customer", "nation")
  def qSqlSubquery(s: SparkSession, dir: String): DataFrame =
    run(s, dir, subquerySql, "orders")
  def qSqlCaseWhen(s: SparkSession, dir: String): DataFrame =
    run(s, dir, caseWhenSql, "lineitem")

  /** Correlated EXISTS / NOT EXISTS — Catalyst rewrites these to
    * left-semi and left-anti hash joins (RewritePredicateSubquery),
    * so at scale they cost one shuffle each, never a per-row probe.
    * Same SQL text runs on both engines. */
  val existsSql: String = """
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
  """.trim

  def qSqlExists(s: SparkSession, dir: String): DataFrame =
    run(s, dir, existsSql, "customer", "orders")

  /** Correlated LATERAL derived table — top-2 nations per region
    * computed inside the lateral subquery (the SQL form of a grouped
    * top-k; Catalyst decorrelates it to a join + partitioned
    * window, so it scales like `topk_group`, not like a per-row
    * re-execution). Identical SQL text runs on DuckDB. */
  val lateralSql: String = """
    SELECT r_name, t.n_name, t.n_nationkey
    FROM region, LATERAL (
      SELECT n_name, n_nationkey FROM nation
      WHERE n_regionkey = r_regionkey
      ORDER BY n_name LIMIT 2) t
    ORDER BY r_name, t.n_name
  """.trim

  def qSqlLateral(s: SparkSession, dir: String): DataFrame =
    run(s, dir, lateralSql, "region", "nation")

  /** SQL pipe syntax (`|>`) — the linear FROM-first query form
    * (GoogleSQL pipe-operator lineage, native in Spark 4). Each pipe
    * stage is sugar over the same Catalyst operators as the classic
    * form, so the optimized plan — pushed filters, partial aggregates
    * — is identical; the oracle runs the classic rendition and must
    * match bit-for-bit. Column order differs between the two forms
    * (AGGREGATE emits group keys after aggregates' position), but the
    * driver compares by sorted column NAME, which both sides share. */
  val pipeSql: String = """
    FROM lineitem
    |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
    |> AGGREGATE COUNT(*) AS n,
         CAST(SUM(CAST(disc_price AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       GROUP BY l_returnflag, l_linestatus
    |> WHERE n > 100
    |> ORDER BY l_returnflag, l_linestatus
  """.trim

  def qSqlPipe(s: SparkSession, dir: String): DataFrame =
    run(s, dir, pipeSql, "lineitem")

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`) — an 84-step month
    * calendar generated by the recursion, LEFT-joined to orders so
    * pre-1995 months surface as zero rows (the date-dimension build
    * every warehouse needs). The recursive anchor/step run on the
    * driver-side loop Catalyst unrolls (UnionLoop); the join+agg stay
    * fully distributed. Integer month index → make_date keeps the
    * arithmetic bit-exact cross-engine ((mi - mi%12)/12 is an exact
    * double on both). Identical SQL text runs on DuckDB. */
  val recursiveSql: String = """
    WITH RECURSIVE cal(mi) AS (
      SELECT 0 UNION ALL SELECT mi + 1 FROM cal WHERE mi < 83),
    m AS (SELECT make_date(1992 + CAST((mi - mi % 12) / 12 AS INT),
                           1 + mi % 12, 1) AS month_start FROM cal)
    SELECT month_start, COUNT(o_orderkey) AS n_orders,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_price
    FROM m LEFT JOIN orders
      ON CAST(date_trunc('month', o_orderdate) AS DATE) = month_start
    GROUP BY month_start ORDER BY month_start
  """.trim

  def qSqlRecursive(s: SparkSession, dir: String): DataFrame =
    run(s, dir, recursiveSql, "orders")

  /** SQL scalar UDFs (`CREATE TEMPORARY FUNCTION ... RETURN expr`,
    * Spark 4) — the declarative UDF surface: the body is a SQL
    * expression Catalyst INLINES into the calling plan, so unlike the
    * JVM closure UDFs (§2.9 `udf_scalar`) these stay inside
    * whole-stage codegen with zero serialization boundary — the form
    * to prefer at 100 TB whenever the logic is expressible. The
    * oracle runs the same query with both bodies inlined by hand. */
  def qSqlUdf(s: SparkSession, dir: String): DataFrame = {
    val sess = Session(s)
    sess.registerTable("orders", graft.sources.Tables(s, dir, "orders"))
    sess.sql("""CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
      RETURNS STRING
      RETURN CASE WHEN p < 100000 THEN 'small'
                  WHEN p < 250000 THEN 'mid' ELSE 'big' END""")
    sess.sql("""CREATE OR REPLACE TEMPORARY FUNCTION after_discount(p DOUBLE)
      RETURNS DOUBLE RETURN p * 0.9""")
    sess.sql("""
      SELECT price_band(o_totalprice) AS band, COUNT(*) AS n,
        CAST(SUM(CAST(after_discount(o_totalprice) AS DECIMAL(18,4))) AS DOUBLE) AS discounted
      FROM orders GROUP BY 1 ORDER BY band""")
  }

  val udfSql: String = """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'mid' ELSE 'big' END AS band,
      COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice * 0.9 AS DECIMAL(18,4))) AS DOUBLE) AS discounted
    FROM orders GROUP BY 1 ORDER BY band
  """.trim

  /** Correlated SCALAR subqueries — one per select-item, including
    * the COUNT form (the classic "COUNT bug": a customer with no
    * qualifying orders must read 0, not NULL — Catalyst's
    * decorrelation inserts the null-to-zero projection when it
    * rewrites each subquery to an aggregate + left outer join, so at
    * scale this costs two shuffled joins, never a per-row probe).
    * Identical SQL text runs on DuckDB. */
  val scalarCorrSql: String = """
    SELECT c_custkey,
      (SELECT MAX(o_orderdate) FROM orders o
       WHERE o.o_custkey = c.c_custkey) AS last_order,
      (SELECT COUNT(*) FROM orders o
       WHERE o.o_custkey = c.c_custkey
         AND o.o_totalprice > 200000) AS n_big
    FROM customer c
    WHERE c_custkey % 100 = 0
    ORDER BY c_custkey
  """.trim

  def qSqlScalarCorr(s: SparkSession, dir: String): DataFrame =
    run(s, dir, scalarCorrSql, "customer", "orders")

  /** GROUP BY ALL — infer the grouping keys from the non-aggregate
    * select items (DuckDB-pioneered, SQL-standard-track, native in
    * Spark 4); one text, both engines. */
  val groupByAllSql: String = """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders GROUP BY ALL
    ORDER BY o_orderpriority, o_orderstatus
  """.trim

  def qSqlGroupByAll(s: SparkSession, dir: String): DataFrame =
    run(s, dir, groupByAllSql, "orders")

  /** QUALIFY — the window-filter clause (Snowflake/BigQuery/DuckDB;
    * rewritten by [[SqlSyntax.rewriteQualify]] since Spark's parser
    * lacks it). The rank cutoff with the rank DROPPED from the output
    * is the grouped-top-k idiom, so after the rewrite Catalyst plans
    * the same bounded per-partition work as `topk_group`. One SQL
    * text: DuckDB executes the QUALIFY form natively. */
  val qualifySql: String = """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey % 25 = 3
    QUALIFY row_number() OVER (PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey) <= 2
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
  """.trim

  def qSqlQualify(s: SparkSession, dir: String): DataFrame =
    run(s, dir, qualifySql, "orders")

  /** DISTINCT ON — first row per key in ORDER BY order (Postgres/
    * DuckDB; rewritten by [[SqlSyntax.rewriteDistinctOn]] to the
    * row_number()=1 idiom, which the WindowTopKRewrite rule plans as
    * the k=1 bounded-heap TopKPerGroup operator). The ORDER BY ends
    * with the unique c_custkey so the per-nation winner is fully
    * determined. One SQL text: DuckDB executes DISTINCT ON natively. */
  val distinctOnSql: String = """
    SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
    FROM customer
    ORDER BY c_nationkey, c_acctbal DESC, c_custkey
  """.trim

  def qSqlDistinctOn(s: SparkSession, dir: String): DataFrame =
    run(s, dir, distinctOnSql, "customer")

  /** ORDER BY ALL — order by every select item left-to-right (DuckDB
    * lineage, the ordering twin of GROUP BY ALL; rewritten by
    * [[SqlSyntax.rewriteOrderByAll]] to pinned-null-order ordinals
    * since Spark's parser lacks it). One SQL text: DuckDB executes
    * ORDER BY ALL natively, and GROUP BY ALL is native in BOTH. */
  val orderByAllSql: String = """
    SELECT l_returnflag, l_linestatus, l_linenumber, COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY ALL ORDER BY ALL
  """.trim

  def qSqlOrderByAll(s: SparkSession, dir: String): DataFrame =
    run(s, dir, orderByAllSql, "lineitem")

  /** SELECT * EXCLUDE — the DuckDB star modifier ("all columns except
    * these", rewritten by [[SqlSyntax.rewriteExclude]]); Catalyst
    * prunes the excluded column out of the scan (the documents `text`
    * payload is never read here — plan-asserted in SqlSyntaxSpec),
    * which is the whole point of the clause at 100 TB. */
  val selectExcludeSql: String = """
    SELECT * EXCLUDE (text) FROM documents
    WHERE n_chars >= 200
    ORDER BY doc_id LIMIT 25
  """.trim

  def qSqlSelectExclude(s: SparkSession, dir: String): DataFrame =
    run(s, dir, selectExcludeSql, "documents")

  /** SELECT * REPLACE — the in-place star rewrite (DuckDB sibling of
    * EXCLUDE; [[SqlSyntax.rewriteReplace]] expands the star against
    * the analysis-only source schema). The ORDER BY references the
    * REPLACED n_chars — both engines must sort on the swapped value,
    * which pins the in-place semantics, not just the projection. */
  val selectReplaceSql: String = """
    SELECT * REPLACE (n_chars / 100 AS n_chars, upper(lang) AS lang)
    FROM documents
    WHERE doc_id % 40 = 7
    ORDER BY n_chars, doc_id LIMIT 30
  """.trim

  def qSqlSelectReplace(s: SparkSession, dir: String): DataFrame =
    run(s, dir, selectReplaceSql, "documents")

  /** The SQL PIVOT clause (Spark 4 native; the SQL surface of the
    * DataFrame `pivot` the `pivot` row covers): two aggregates × three
    * pinned pivot values. The decimal sums ride an explicit outer
    * CAST-to-double projection (pivot agg expressions must be bare
    * aggregate calls). DuckDB's PIVOT grammar differs, so the oracle
    * replays the classic filtered-aggregate form. */
  val pivotClauseSql: String = """
    SELECT o_orderpriority,
      f_n, CAST(f_total AS DOUBLE) AS f_total,
      o_n, CAST(o_total AS DOUBLE) AS o_total,
      p_n, CAST(p_total AS DOUBLE) AS p_total
    FROM (
      SELECT * FROM (
        SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders)
      PIVOT (
        COUNT(*) AS n,
        SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p)))
    ORDER BY o_orderpriority
  """.trim

  def qSqlPivot(s: SparkSession, dir: String): DataFrame =
    run(s, dir, pivotClauseSql, "orders")

  /** The SQL ASOF JOIN clause (DuckDB/Snowflake lineage; rewritten by
    * [[SqlSyntax.rewriteAsofJoin]] into the engine's one-shuffle
    * union+window as-of idiom — Spark's parser lacks the clause and
    * its LATERAL rendition plans a nested-loop join). DuckDB executes
    * ASOF LEFT JOIN natively, so ONE text drives both engines. Each
    * order matches the same customer's most recent STRICTLY-earlier
    * order day (`>` = strict-backward); a customer's first order day
    * has no match and survives via LEFT with null prev columns. The
    * right side dedupes to one row per (customer, day) upfront — the
    * uniqueness contract ASOF shares with [[Temporal.asofJoin]]. */
  val asofJoinClauseSql: String = """
    WITH prev AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS prev_key
      FROM orders GROUP BY 1, 2)
    SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
      p.prev_key, p.o_orderdate AS prev_date
    FROM orders a ASOF LEFT JOIN prev p
      ON a.o_custkey = p.o_custkey AND a.o_orderdate > p.o_orderdate
    WHERE a.o_custkey % 20 = 7
    ORDER BY a.o_orderkey
  """.trim

  def qSqlAsofJoin(s: SparkSession, dir: String): DataFrame =
    run(s, dir, asofJoinClauseSql, "orders")

  val qSqlPivotOracleSql: String = """
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_n,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_total,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** The SQL UNPIVOT clause (Spark 4 native; SQL twin of the API
    * `unpivot` row): wide metrics → (metric, val) pairs. DuckDB's
    * UNPIVOT grammar differs, so the oracle replays the stacked
    * UNION ALL form. */
  val unpivotClauseSql: String = """
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, c_acctbal, CAST(c_nationkey AS DOUBLE) AS c_nat
      FROM customer WHERE c_custkey % 100 = 1)
    UNPIVOT (val FOR metric IN (c_acctbal, c_nat))
    ORDER BY c_custkey, metric
  """.trim

  def qSqlUnpivot(s: SparkSession, dir: String): DataFrame =
    run(s, dir, unpivotClauseSql, "customer")

  val qSqlUnpivotOracleSql: String = """
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS val
      FROM customer WHERE c_custkey % 100 = 1
      UNION ALL
      SELECT c_custkey, 'c_nat', CAST(c_nationkey AS DOUBLE)
      FROM customer WHERE c_custkey % 100 = 1)
    ORDER BY c_custkey, metric
  """.trim

  /** LIMIT … WITH TIES (ANSI FETCH FIRST semantics, rewritten by
    * [[SqlSyntax.rewriteLimitTies]] to the rank()-cutoff idiom): every
    * row tying with the 100th quantity survives. The select list is
    * ONLY the sort key, so tied rows are identical and the result is a
    * well-defined multiset — the honest shape for a ties query (any
    * wider row set would be nondeterministic within a tie group by
    * definition). Oracle replays the rank form. */
  val limitTiesSql: String = """
    SELECT CAST(l_quantity AS INT) AS qty FROM lineitem
    ORDER BY qty LIMIT 100 WITH TIES
  """.trim

  def qSqlLimitTies(s: SparkSession, dir: String): DataFrame =
    run(s, dir, limitTiesSql, "lineitem")

  val qSqlLimitTiesOracleSql: String = """
    WITH r AS (
      SELECT CAST(l_quantity AS INT) AS qty,
        RANK() OVER (ORDER BY CAST(l_quantity AS INT)) AS rk
      FROM lineitem)
    SELECT qty FROM r WHERE rk <= 100 ORDER BY qty
  """.trim

  /** Named WINDOW clause (SQL:2003; native in Spark AND DuckDB — one
    * text): two window functions share one `WINDOW w AS (…)` spec, so
    * the definition is written once and the plan builds ONE Window
    * operator for both (a repeated inline OVER would too, but only
    * after dedup — the clause states the sharing). The running-sum
    * frame is deterministic: o_orderkey is unique, so RANGE CURRENT
    * ROW has no peers. */
  val namedWindowSql: String = """
    SELECT o_custkey, o_orderkey,
      row_number() OVER w AS rn,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total
    FROM orders
    WHERE o_custkey % 100 = 11
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
  """.trim

  def qSqlNamedWindow(s: SparkSession, dir: String): DataFrame =
    run(s, dir, namedWindowSql, "orders")

  /** VALUES inline-table constructor joined against a fixture (native
    * in both engines — one text): the literal dimension table pattern
    * (code→label maps, test harness seeds) without a registered view. */
  val valuesSql: String = """
    SELECT t.region_code, t.label, COUNT(c.c_custkey) AS n
    FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS t(region_code, label)
    LEFT JOIN customer c ON c.c_nationkey % 3 = t.region_code
    GROUP BY t.region_code, t.label
    ORDER BY t.region_code
  """.trim

  def qSqlValues(s: SparkSession, dir: String): DataFrame =
    run(s, dir, valuesSql, "customer")

  val pipeOracleSql: String = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag, l_linestatus HAVING COUNT(*) > 100
    ORDER BY l_returnflag, l_linestatus
  """.trim

  /** The lakehouse tier driven ENTIRELY from SQL text ([[graft.ops.LogSql]]
    * dispatch in `Session.sql`): CREATE TABLE ... AS populates the
    * log, a full three-clause MERGE INTO (conditional update +
    * insert * + NOT MATCHED BY SOURCE delete — the same semantics
    * `log_merge3` pins through the programmatic API) mutates it in
    * one atomic commit, and a SELECT over the graft_log reference
    * reads the post-merge snapshot. Same scenario as `log_merge3`,
    * so the same replay oracle. */
  def qSqlMergeLog(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/tlog_sql_merge"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    val sess = Session(s)
    sess.registerTable("orders", graft.sources.Tables(s, dir, "orders"))
    sess.sql(s"""
      CREATE TABLE graft_log('$root') STATS (o_orderkey) AS
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """.trim)
    sess.sql(s"""
      MERGE INTO graft_log('$root') AS t
      USING (
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderkey < 500 THEN o_totalprice + 500
               ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey < 600
        UNION ALL
        SELECT o_orderkey + 2000000 AS o_orderkey, 'I' AS o_orderstatus,
          o_totalprice
        FROM orders WHERE o_orderkey % 97 = 0
      ) AS s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.o_totalprice > t.o_totalprice
        THEN UPDATE SET o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 10 = 7 THEN DELETE
      STATS (o_orderkey)
    """.trim)
    sess.sql(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
        ${dsumSql("o_totalprice")} AS total_price
      FROM graft_log('$root')
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """.trim)
  }

  /** UPDATE + DELETE statement forms on the lakehouse, SQL text only:
    * UPDATE routes to TableLog.update (touched-files-only rewrite),
    * DELETE to TableLog.deleteVector (no data file rewritten — the
    * read applies the vector), and the SELECT proves both mutations
    * landed. +100 (not a multiply) keeps every price exactly
    * representable, so the decimal-sum oracle is bit-stable. */
  def qSqlUpdateLog(s: SparkSession, dir: String): DataFrame = {
    val root = Egress.outRoot(dir) + "/tlog_sql_update"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    val sess = Session(s)
    sess.registerTable("orders", graft.sources.Tables(s, dir, "orders"))
    sess.sql(s"""
      CREATE TABLE graft_log('$root') STATS (o_orderkey) AS
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """.trim)
    sess.sql(s"""
      UPDATE graft_log('$root')
      SET o_totalprice = o_totalprice + 100
      WHERE o_orderstatus = 'F' AND o_orderkey % 4 = 1
      STATS (o_orderkey)
    """.trim)
    sess.sql(s"DELETE FROM graft_log('$root') WHERE o_orderkey % 10 = 3")
    sess.sql(s"""
      SELECT o_orderstatus, COUNT(*) AS n,
        ${dsumSql("o_totalprice")} AS total_price
      FROM graft_log('$root')
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """.trim)
  }

  val qSqlUpdateLogSql: String = s"""
    WITH res AS (
      SELECT o_orderstatus,
        CASE WHEN o_orderstatus = 'F' AND o_orderkey % 4 = 1
             THEN o_totalprice + 100 ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 10 <> 3)
    SELECT o_orderstatus, COUNT(*) AS n, ${dsumSql("p")} AS total_price
    FROM res GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** SQL-driven TYPE WIDENING on the lakehouse table (Delta 3.x
    * parity, `ALTER TABLE … ALTER COLUMN … TYPE`): create with an INT
    * metric, widen to BIGINT without rewriting a file, then append
    * values only a BIGINT can hold. The final read spans both
    * physical generations — narrow old files widened at scan time
    * (readUnion's explicit-schema read), wide new files native — and
    * the oracle recomputes the same answer from the base table. */
  def qSqlWidenLog(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = Egress.outRoot(dir) + "/tlog_sql_widen"
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(root), true)
    val sess = Session(s)
    sess.registerTable("nation", graft.sources.Tables(s, dir, "nation"))
    sess.sql(s"""
      CREATE TABLE graft_log('$root') AS
      SELECT CAST(n_nationkey AS INT) AS key, n_name,
        CAST(n_nationkey * 1000 AS INT) AS pop
      FROM nation WHERE n_nationkey < 13
    """.trim)
    sess.sql(s"ALTER TABLE graft_log('$root') ALTER COLUMN pop TYPE BIGINT")
    graft.sources.TableLog.append(s, root,
      graft.sources.Tables(s, dir, "nation")
        .filter(col("n_nationkey") >= 13)
        .select(col("n_nationkey").cast(IntegerType).as("key"),
          col("n_name"),
          (col("n_nationkey").cast(LongType) * 1000000000L).as("pop")))
    sess.sql(s"SELECT key, n_name, pop FROM graft_log('$root') ORDER BY key")
  }

  val qSqlWidenLogSql: String = """
    SELECT CAST(n_nationkey AS INT) AS key, n_name,
      CAST(CASE WHEN n_nationkey < 13 THEN CAST(n_nationkey AS BIGINT) * 1000
                ELSE CAST(n_nationkey AS BIGINT) * 1000000000 END AS BIGINT) AS pop
    FROM nation ORDER BY key
  """.trim
}
