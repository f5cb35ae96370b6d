package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Ingest

/** Ingest/egress surface: sink round-trips (CSV, ORC), Hive-partitioned
  * datasets with partition pruning, multi-file discovery with schema
  * merge — the §2.1 behaviors the reference implements in
  * `cpp/src/arrow/dataset/` and `rust/datafusion/src/datasource/`.
  */
class IngestSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv: declared-schema scan lands on the widened SURVEY §1.2 types") {
    val df = spark.read.schema(Ingest.csvSchema)
      .option("header", "true").csv(Ingest.CsvPath)
    assert(df.schema("c10").dataType.typeName == "decimal(20,0)")
    assert(df.count() == 100)
    // c10 values above Long.MaxValue survive exactly (the UInt64 case)
    val big = df.agg(max(col("c10"))).collect()(0).getDecimal(0)
    assert(big.compareTo(new java.math.BigDecimal(Long.MaxValue)) > 0)
  }

  test("csv sink round-trip (write_csv analogue) preserves data") {
    val out = tmp("graft_csv_sink")
    val sess = Session(spark)
    val src = spark.read.schema(Ingest.csvSchema)
      .option("header", "true").csv(Ingest.CsvPath)
    sess.writeCsv(src.select(col("c1"), col("c6"), col("c12")), out)
    val back = spark.read
      .schema("c1 STRING, c6 BIGINT, c12 DOUBLE")
      .option("header", "true").csv(out)
    assert(back.count() == 100)
    val a = src.select(col("c1"), col("c6"), col("c12")).orderBy("c6").collect()
    val b = back.orderBy("c6").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("orc round-trip preserves schema and data") {
    val out = tmp("graft_orc")
    val sess = Session(spark)
    val src = graft.sources.Tables(spark, sfDir, "orders")
    sess.writeOrc(src, out)
    val back = spark.read.orc(out)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).collect()(0).get(0) ==
      src.agg(sum(col("o_totalprice").cast("decimal(18,2)"))).collect()(0).get(0))
  }

  test("hive-partitioned write + partition pruning in the scan plan") {
    val out = tmp("graft_part")
    val sess = Session(spark)
    sess.writeParquet(graft.sources.Tables(spark, sfDir, "orders"),
      out, partitionBy = Seq("o_orderstatus"))
    val scanned = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = scanned.queryExecution.executedPlan.toString
    // pruning proof: partition filters present, and only one of the three
    // status directories is read
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition filter in:\n$plan")
    val statuses = scanned.select("o_orderstatus").distinct().collect().map(_.getString(0))
    assert(statuses.toSeq == Seq("F"))
    val full = spark.read.parquet(out)
    assert(full.count() > scanned.count())
  }

  test("parquet codec selection round-trips (zstd + uncompressed)") {
    val sess = Session(spark)
    val src = graft.sources.Tables(spark, sfDir, "nation")
    for (codec <- Seq("zstd", "none")) {
      val out = tmp(s"graft_codec_$codec")
      sess.writeParquet(src, out, compression = codec)
      val files = new java.io.File(out).listFiles().map(_.getName)
        .filter(_.endsWith(".parquet"))
      if (codec == "zstd") assert(files.exists(_.contains(".zstd.")))
      assert(spark.read.parquet(out).orderBy("n_nationkey").collect().toSeq ==
        src.orderBy("n_nationkey").collect().toSeq)
    }
  }

  test("multi-file dataset discovery + unionByName-style schema merge") {
    val out = tmp("graft_multi")
    val o = graft.sources.Tables(spark, sfDir, "orders")
    o.filter(col("o_orderkey") % 2 === 0).write.parquet(s"$out/part1")
    o.filter(col("o_orderkey") % 2 === 1)
      .withColumn("extra", lit(1)) // schema evolution in later files
      .write.parquet(s"$out/part2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/part1", s"$out/part2")
    assert(merged.count() == o.count())
    assert(merged.schema.fieldNames.contains("extra"))
    // rows from the pre-evolution files surface null for the new column
    assert(merged.filter(col("extra").isNull).count() ==
      o.filter(col("o_orderkey") % 2 === 0).count())
  }

  test("json parse modes map the reference's UnexpectedFieldBehavior") {
    // cpp/src/arrow/json/options.h:41-59 — Ignore/Error/InferType →
    // Spark PERMISSIVE (null + _corrupt_record) / FAILFAST / inference
    val out = tmp("graft_json_modes")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/bad.jsonl"),
      """{"id": 1, "v": 10}
        |not json at all
        |{"id": 2, "v": 20}
        |""".stripMargin)
    val schema = "id BIGINT, v BIGINT, _corrupt_record STRING"
    // corrupt-record queries require materialized parse results
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(s"$out/bad.jsonl")
      .collect()
    assert(permissive.length == 3)
    assert(permissive.count(r => !r.isNullAt(2)) == 1)
    val failfast = spark.read.schema("id BIGINT, v BIGINT")
      .option("mode", "FAILFAST").json(s"$out/bad.jsonl")
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("corrupt-record accounting: CSV DROPMALFORMED/PERMISSIVE, and the " +
      "bad-row count rides the ingest action as an observed metric") {
    val out = tmp("graft_csv_corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/bad.csv"),
      """id,v
        |1,10
        |2,not_a_number
        |3,30
        |""".stripMargin)
    val schema = "id BIGINT, v BIGINT, _corrupt_record STRING"
    // DROPMALFORMED: pipeline keeps only parseable rows
    val dropped = spark.read.schema("id BIGINT, v BIGINT")
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(s"$out/bad.csv").collect()
    assert(dropped.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // PERMISSIVE + observe: quarantine-and-count without a second scan —
    // the at-scale shape for ingest quality dashboards
    val obs = org.apache.spark.sql.Observation("ingest_quality")
    val parsed = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$out/bad.csv")
      .observe(obs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"),
        org.apache.spark.sql.functions.count(
          col("_corrupt_record")).as("bad_rows"))
    val good = parsed.filter(col("_corrupt_record").isNull).collect()
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val m = obs.get
    assert(m("rows") == 3L && m("bad_rows") == 1L,
      s"expected 3 rows / 1 bad, got $m")
  }

  test("csv parse options: delimiter, null token, quotes") {
    // cpp/src/arrow/csv/options.h:38-116 — delimiter/null_values/quoting
    val out = tmp("graft_csv_opts")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/opt.csv"),
      "a|b|c\n1|NULLTOK|\"x|y\"\n2|hello|plain\n")
    val df = spark.read
      .option("header", "true").option("delimiter", "|")
      .option("nullValue", "NULLTOK").option("quote", "\"")
      .schema("a INT, b STRING, c STRING")
      .csv(s"$out/opt.csv")
      .orderBy("a")
    val rows = df.collect()
    assert(rows(0).isNullAt(1))          // null token honored
    assert(rows(0).getString(2) == "x|y") // quoted delimiter preserved
    assert(rows(1).getString(1) == "hello")
  }

  test("ddl external table registers and re-registers idempotently") {
    val r1 = Ingest.qDdlExternalTable(spark, sfDir).collect()
    val r2 = Ingest.qDdlExternalTable(spark, sfDir).collect()
    assert(r1.toSeq == r2.toSeq && r1.nonEmpty)
  }

  test("csv scan pushes filters and prunes columns at the source") {
    val df = spark.read.schema(Ingest.csvSchema)
      .option("header", "true").csv(Ingest.CsvPath)
      .filter(col("c3") > 64).select(col("c1"), col("c6"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(c3), GreaterThan(c3,64)]"),
      s"filters not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<c1:string,c3:tinyint,c6:bigint>"),
      s"columns not pruned:\n$scan")
  }

  test("malformed CSV: PERMISSIVE quarantines every planted line, " +
      "DROPMALFORMED keeps exactly the healthy class, FAILFAST throws") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft_badcsv").toString
    val sp = spark; import sp.implicits._
    // 20 healthy lines + 3 planted corruptions (bad long, bad double,
    // truncated line)
    val good = (0 until 20).map(i => s"$i,${i * 100L},${i / 2.0}")
    val bad = Seq("bad,1,2.0", "21,2100,notadouble", "22,oops")
    (good ++ bad).toDF("value").coalesce(1)
      .write.mode("overwrite").text(out)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType)))
    // cache first: Spark refuses corrupt-column-only projections over
    // the raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt").csv(out).cache()
    try {
      assert(permissive.count() == 23, "PERMISSIVE must keep every line")
      val quarantined = permissive.filter(col("_corrupt").isNotNull)
        .select("_corrupt").as[String].collect().sorted.toSeq
      assert(quarantined == bad.sorted,
        s"quarantine must hold exactly the planted lines, got $quarantined")
    } finally permissive.unpersist()
    val dropped = spark.read
      .schema(org.apache.spark.sql.types.StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").csv(out)
    // project EVERY column: CSV column pruning means a bare count()
    // parses no fields, detects no malformation, and drops nothing —
    // the malformed-row contract is per-parsed-column
    assert(dropped.select("id", "t", "v").collect().length == 20,
      "DROPMALFORMED must keep exactly the healthy class")
    intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(org.apache.spark.sql.types.StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST").csv(out)
        .select("id", "t", "v").collect() // same pruning caveat as above
    }
  }
}
