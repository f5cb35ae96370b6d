package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Ingest surface (SURVEY §2.1): CSV with declared schema, CSV with
  * inference, CREATE EXTERNAL TABLE DDL, JSON file reader, and JSON
  * string extraction — the reference's primary source formats
  * (`rust/datafusion/src/datasource/csv.rs`, `sql/parser.rs:49-68`
  * CREATE EXTERNAL TABLE, `cpp/src/arrow/csv/`, `cpp/src/arrow/json/
  * reader.h:45`).
  *
  * The CSV fixture is the aggregate_test_100 shape every DataFusion
  * end-to-end test runs over (`rust/datafusion/src/test/mod.rs:88-104`),
  * with unsigned columns widened per SURVEY §1.2 (UInt8→Short,
  * UInt16→Int, UInt32→Long, UInt64→Decimal(20,0)).
  *
  * Scale posture: both readers are Spark's splittable distributed
  * scans — a directory of thousands of CSV/JSON files parallelizes by
  * file split exactly like parquet, and the declared-schema path never
  * pays an inference pass.
  */
object Ingest {

  val CsvPath = "/root/repo/data/aggregate_test_100.csv"
  val JsonPath = "/root/repo/data/events_sample.jsonl"

  /** aggregate_test_100 schema (FIXTURES.md §1), unsigned widened. */
  val csvSchema: StructType = StructType(Seq(
    StructField("c1", StringType), StructField("c2", LongType),
    StructField("c3", ByteType), StructField("c4", ShortType),
    StructField("c5", IntegerType), StructField("c6", LongType),
    StructField("c7", ShortType), StructField("c8", IntegerType),
    StructField("c9", LongType), StructField("c10", DecimalType(20, 0)),
    StructField("c11", FloatType), StructField("c12", DoubleType),
    StructField("c13", StringType)))

  /** events_sample.jsonl schema — nested struct + array. */
  val jsonSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("type", StringType),
    StructField("score", DoubleType),
    StructField("tags", ArrayType(StringType)),
    StructField("meta", StructType(Seq(StructField("k", LongType))))))

  private val csvColsSql =
    """columns={'c1':'VARCHAR','c2':'BIGINT','c3':'TINYINT','c4':'SMALLINT',
      |'c5':'INTEGER','c6':'BIGINT','c7':'SMALLINT','c8':'INTEGER','c9':'BIGINT',
      |'c10':'DECIMAL(20,0)','c11':'FLOAT','c12':'DOUBLE','c13':'VARCHAR'},
      |header=true""".stripMargin.replace("\n", " ")

  /** Declared-schema CSV scan (register_csv with schema,
    * `execution/context.rs:177`) + grouped agg over every widened type. */
  def qCsvScan(s: SparkSession, dir: String): DataFrame =
    s.read.schema(csvSchema).option("header", "true").csv(CsvPath)
      .groupBy(col("c1"))
      .agg(count(lit(1)).as("n"), sum(col("c6")).as("sum_c6"),
        min(col("c3")).as("min_c3"), max(col("c4")).as("max_c4"),
        sum(col("c12").cast(DecimalType(18, 12))).cast(DoubleType).as("sum_c12"),
        max(col("c10")).cast(DoubleType).as("max_c10"))
      .orderBy("c1")

  val qCsvScanSql: String = s"""
    SELECT c1, COUNT(*) AS n, CAST(SUM(c6) AS BIGINT) AS sum_c6,
      MIN(c3) AS min_c3, MAX(c4) AS max_c4,
      CAST(SUM(CAST(c12 AS DECIMAL(18,12))) AS DOUBLE) AS sum_c12,
      CAST(MAX(c10) AS DOUBLE) AS max_c10
    FROM read_csv('$CsvPath', $csvColsSql)
    GROUP BY c1 ORDER BY c1
  """.trim

  /** Schema-inference CSV scan (register_csv with schema=None — the
    * reference's Null→Integer→…→Text inference chain,
    * `cpp/src/arrow/csv/column_builder.cc:265-305`). Projected columns
    * are cast explicitly so both engines' inferred physical types meet
    * on one declared output schema. */
  def qCsvInfer(s: SparkSession, dir: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(CsvPath)
      .filter(col("c3") > 64)
      .select(col("c6").cast(LongType).as("c6"), col("c1"),
        col("c2").cast(LongType).as("c2"), col("c5").cast(IntegerType).as("c5"),
        col("c12").cast(DoubleType).as("c12"), col("c13"))
      .orderBy("c6")

  val qCsvInferSql: String = s"""
    SELECT c6, c1, CAST(c2 AS BIGINT) AS c2, CAST(c5 AS INT) AS c5,
      CAST(c12 AS DOUBLE) AS c12, c13
    FROM read_csv('$CsvPath', $csvColsSql)
    WHERE c3 > 64 ORDER BY c6
  """.trim

  /** CREATE EXTERNAL TABLE DDL (`sql/parser.rs:49-68`, executed at
    * `execution/context.rs:74-90`) — Spark's CREATE TEMPORARY VIEW
    * ... USING csv is the exact analogue: named table over an
    * external file with declared schema, dropped with the session. */
  def qDdlExternalTable(s: SparkSession, dir: String): DataFrame = {
    s.sql(s"""CREATE OR REPLACE TEMPORARY VIEW ext_aggregate_test (
      c1 STRING, c2 BIGINT, c3 TINYINT, c4 SMALLINT, c5 INT, c6 BIGINT,
      c7 SMALLINT, c8 INT, c9 BIGINT, c10 DECIMAL(20,0), c11 FLOAT,
      c12 DOUBLE, c13 STRING)
      USING csv OPTIONS (path '$CsvPath', header 'true')""")
    s.sql("""SELECT c1, COUNT(*) AS n, SUM(c7) AS sum_c7
      FROM ext_aggregate_test GROUP BY c1 ORDER BY c1""")
  }

  val qDdlExternalTableSql: String = s"""
    SELECT c1, COUNT(*) AS n, CAST(SUM(c7) AS BIGINT) AS sum_c7
    FROM read_csv('$CsvPath', $csvColsSql)
    GROUP BY c1 ORDER BY c1
  """.trim

  /** JSON file reader (`cpp/src/arrow/json/reader.h:45` analogue):
    * newline-delimited records with a nested struct and an array,
    * declared schema (no inference pass). `sum_k2` round-trips the
    * nested struct through to_json → get_json_object (the JSONPath
    * surface; moved here from qJsonExtract — 26-row fixture, so the
    * extra parse is free) and must equal `sum_k`. */
  def qJsonScan(s: SparkSession, dir: String): DataFrame =
    s.read.schema(jsonSchema).json(JsonPath)
      .groupBy(col("type"))
      .agg(count(lit(1)).as("n"),
        sum(col("score").cast(DecimalType(18, 4))).cast(DoubleType).as("total_score"),
        sum(col("meta.k")).as("sum_k"),
        sum(get_json_object(to_json(col("meta")), "$.k").cast(LongType)).as("sum_k2"),
        sum(size(col("tags"))).as("n_tags"))
      .orderBy("type")

  val qJsonScanSql: String = s"""
    SELECT type, COUNT(*) AS n,
      CAST(SUM(CAST(score AS DECIMAL(18,4))) AS DOUBLE) AS total_score,
      CAST(SUM(meta.k) AS BIGINT) AS sum_k,
      CAST(SUM(meta.k) AS BIGINT) AS sum_k2,
      CAST(SUM(len(tags)) AS BIGINT) AS n_tags
    FROM read_json('$JsonPath',
      columns={'id':'BIGINT','type':'VARCHAR','score':'DOUBLE',
               'tags':'VARCHAR[]','meta':'STRUCT(k BIGINT)'})
    GROUP BY type ORDER BY type
  """.trim

  /** JSON string extraction over the events fixture's `props` column —
    * three in-row JSON surfaces: json_tuple (generator), from_json
    * (string → typed struct), get_json_object (JSONPath), cross-checked
    * against each other in the same row before aggregating.
    *
    * Parse-count note (r4 bench regression 0.96→1.94 s): referencing a
    * `withColumn` from_json alias twice lets CollapseProject inline the
    * parse into each reference — 2× from_json + 1× get_json_object = 3
    * parses/row. json_tuple is a Generate node, a collapse barrier, so
    * `k_str` is parsed once and reused by reference; from_json appears
    * exactly once in paths_agree → 2 parses/row total (get_json_object
    * coverage lives in qJsonScan where the fixture is 26 rows). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("value"), col("props"), json_tuple(col("props"), "k").as("k_str"))
      .select((col("k_str").cast(IntegerType) % 10).as("k_mod"), col("value"),
        (from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k") ===
          col("k_str").cast(IntegerType)).as("paths_agree"))
      .groupBy(col("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"),
        min(col("paths_agree")).as("paths_agree"))
      .orderBy("k_mod")

  val qJsonExtractSql: String = """
    SELECT CAST(CAST(props->>'k' AS INT) % 10 AS INT) AS k_mod, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
      true AS paths_agree
    FROM events GROUP BY 1 ORDER BY k_mod
  """.trim

  /** VARIANT — the open semi-structured type (Spark 4): JSON parses
    * once into a binary-encoded tree, then any number of typed path
    * extractions read that encoding directly, with no re-parse and no
    * up-front schema. At 100 TB this replaces per-query
    * get_json_object string re-parsing (the column shreds to parquet
    * as binary, extractions push into the scan) — the modern answer
    * to the reference's JSON ingestion surface
    * (`cpp/src/arrow/json/reader.h:45`) when the shape is not
    * declared.
    *
    * The document is built in-row from orders columns (nested object
    * + typed leaves), so the DuckDB oracle computes the same answer
    * from the base columns. Extraction surface exercised: nested-path
    * `variant_get` (string/double/date targets), `try_variant_get`
    * with an impossible target (string prio → int must yield NULL,
    * not error), and `schema_of_variant` on a sub-path (asserted
    * STRING for every row; the full-document schema varies per row in
    * its decimal widths, so the stable sub-path is the cross-engine-
    * checkable part). Aggregation then runs over the EXTRACTED typed
    * columns — decimal-exact sums, engine-portable. */
  def qVariantJson(s: SparkSession, dir: String): DataFrame = {
    // document text via codegen'd concat, NOT to_json: StructsToJson
    // is a CodegenFallback expression — it would run interpreted AND
    // sever the whole-stage-codegen span around it. The fields are
    // fixture-controlled (no quotes/escapes in priority strings;
    // cast(double→string) is the same shortest round-trip repr
    // to_json prints), so assembling the JSON by concat keeps the
    // construction in codegen and leaves parse_json the only
    // per-row JSON work — which is the realistic shape anyway: a raw
    // corpus arrives as JSON TEXT, parses once, then every
    // extraction reads the binary encoding.
    val doc = concat(
      lit("{\"k\": "), col("o_orderkey").cast(StringType),
      lit(", \"prio\": \""), col("o_orderpriority"),
      lit("\", \"pay\": {\"amt\": "), col("o_totalprice").cast(StringType),
      lit(", \"d\": \""), col("o_orderdate").cast(DateType).cast(StringType),
      lit("\"}}"))
    // fan-out before the parse: parse_json is the per-row CPU and the
    // one-row-group scan pins it to a single task (identity at scale;
    // every aggregate below is order-independent)
    graft.ops.fanOutSmall(Tables(s, dir, "orders"))
      // explode(array(..)) is a Generate node — a CollapseProject
      // barrier, so the document parses ONCE per row instead of once
      // per variant_get reference (the same 5×-parse trap json_extract
      // hit in r4)
      .select(col("o_orderkey"), explode(array(parse_json(doc))).as("v"))
      // one whole-document struct cast = ONE tree walk for the three
      // typed fields (vs three root-down variant_get walks — measured
      // ~35% of the query); the single-path surfaces (variant_get,
      // try_variant_get, schema_of_variant) stay exercised alongside.
      // try_variant_get's NULL-on-mismatch runs on ONE row (key 0),
      // not all: a failed variant cast is a caught per-row exception
      // (~7 µs each — measured ~1 s of this query at sf0.1 when every
      // row throws), and a real corpus fails on rare rows, not all of
      // them. Every other row is NULL by the when(); bool_and(isNull)
      // below is TRUE either way, so the oracle row is unchanged.
      .select(
        variant_get(col("v"), "$",
          "struct<k:bigint,prio:string,pay:struct<amt:double,d:date>>").as("t"),
        when(col("o_orderkey") === 0,
          try_variant_get(col("v"), "$.prio", "int")).as("prio_as_int"),
        schema_of_variant(expr("variant_get(v, '$.prio')")).as("prio_sch"))
      .select(
        col("t.prio").as("prio"), col("t.pay.amt").as("amt"),
        col("t.pay.d").as("d"), col("prio_as_int"), col("prio_sch"))
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        sum(col("amt").cast(DecimalType(18, 2))).cast(DoubleType).as("total_amt"),
        min(col("d")).as("first_d"),
        bool_and(col("prio_as_int").isNull).as("prio_not_int"),
        bool_and(col("prio_sch") === "STRING").as("schema_ok"))
      .orderBy("prio")
  }

  val qVariantJsonSql: String = """
    SELECT o_orderpriority AS prio, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amt,
      MIN(CAST(o_orderdate AS DATE)) AS first_d,
      true AS prio_not_int, true AS schema_ok
    FROM orders GROUP BY o_orderpriority ORDER BY prio
  """.trim

  /** In-memory table (`datasource/memory.rs` MemTable analogue):
    * materialized rows registered as a table and used as a join
    * dimension. A literal tier-lookup DataFrame is registered through
    * the same temp-view surface as file tables, then drives a
    * broadcast join into orders — Catalyst sees exact (tiny) row
    * statistics for the in-memory side, so it auto-broadcasts. */
  def qMemTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = Seq(
      ("1-URGENT", "high"), ("2-HIGH", "high"), ("3-MEDIUM", "mid"),
      ("4-NOT SPECIFIED", "low"), ("5-LOW", "low"))
      .toDF("prio", "tier")
    tiers.createOrReplaceTempView("prio_tiers")
    Tables(s, dir, "orders")
      .join(s.table("prio_tiers"), col("o_orderpriority") === col("prio"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy("tier")
  }

  val qMemTableSql: String = s"""
    SELECT tier, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total_price
    FROM orders
    JOIN (VALUES ('1-URGENT','high'), ('2-HIGH','high'), ('3-MEDIUM','mid'),
                 ('4-NOT SPECIFIED','low'), ('5-LOW','low')) AS t(prio, tier)
      ON o_orderpriority = prio
    GROUP BY tier ORDER BY tier
  """.trim

  /** Malformed-row CSV ingest (the reference CSV reader's
    * invalid-row handling, `cpp/src/arrow/csv/parser.h:62`
    * ParseOptions::ignore_empty_lines + reader error modes; Spark
    * surface: PERMISSIVE / DROPMALFORMED / FAILFAST). A 100 TB crawl
    * ingest ALWAYS contains broken lines, and one of them must never
    * kill a stage — but silently dropping them is just as wrong, so
    * the PERMISSIVE contract is: every input line lands EXACTLY once,
    * either parsed or quarantined in the corrupt-record column.
    *
    * The query plants corruption deterministically (every 37th event
    * id emits a truncated non-numeric line), writes the mix as a
    * distributed text dataset, re-reads it with a declared schema +
    * `columnNameOfCorruptRecord`, and profiles both classes. Corrupt
    * rows' ids are recovered from the QUARANTINED raw string (not the
    * parser's partial output, which is engine-defined); the oracle
    * replays the classification relationally, so the hash proves
    * exactly the planted lines — no more, no fewer — were quarantined
    * and every healthy line parsed losslessly (doubles round-trip via
    * shortest-representation formatting). DROPMALFORMED (= the
    * healthy class) and FAILFAST (throws on first bad line) are
    * IngestSpec-asserted. */
  def qCsvMalformed(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/events_malformed_csv"
    val ev = Tables(s, dir, "events").select(col("event_id"),
      unix_micros(col("ts")).as("t_us"), col("value"))
    val line = when(col("event_id") % 37 === 0,
        concat(col("event_id").cast(StringType), lit(",oops")))
      .otherwise(concat_ws(",", col("event_id").cast(StringType),
        col("t_us").cast(StringType), col("value").cast(StringType)))
    ev.select(line.as("value")).write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("t_us", LongType),
      StructField("value", DoubleType), StructField("_corrupt", StringType)))
    // from_csv over the text scan rather than DataFrameReader.csv:
    // identical univocity PERMISSIVE semantics, but plans that prune
    // down to the corrupt column alone stay legal (the raw CSV reader
    // refuses corrupt-only projections — QUERY_ONLY_CORRUPT_RECORD_
    // COLUMN; the reader path itself is IngestSpec-asserted)
    s.read.text(out)
      .select(from_csv(col("value"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("r"))
      .select(col("r.*"))
      .groupBy(col("_corrupt").isNotNull.as("is_corrupt"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("event_id"),
          split(col("_corrupt"), ",").getItem(0).cast(LongType))).as("sum_id"),
        dsum(when(col("_corrupt").isNull, col("value"))).as("sum_value"),
        max(when(col("_corrupt").isNull, col("t_us"))).as("max_t"))
      .orderBy("is_corrupt")
  }

  val qCsvMalformedSql: String = s"""
    WITH cls AS (
      SELECT event_id, epoch_us(ts) AS t_us, value,
        event_id % 37 = 0 AS is_corrupt
      FROM events)
    SELECT is_corrupt, COUNT(*) AS n,
      CAST(SUM(event_id) AS BIGINT) AS sum_id,
      ${dsumSql("CASE WHEN is_corrupt THEN NULL ELSE value END")} AS sum_value,
      CAST(MAX(CASE WHEN is_corrupt THEN NULL ELSE t_us END) AS BIGINT) AS max_t
    FROM cls GROUP BY is_corrupt ORDER BY is_corrupt
  """.trim
}
