package graft

import org.apache.spark.sql.functions._

import graft.ops.Egress

/** Write surface: sink round-trips preserve values, and the
  * hive-partitioned layout actually prunes at plan time — the property
  * the 100 TB posture rests on.
  */
class EgressSpec extends SparkSpec {

  test("csv sink round-trip preserves every row bit-for-bit") {
    // aggregate-free comparison: read-back rows == source rows
    Egress.qCsvSink(spark, sfDir).collect() // performs the write
    val src = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("d"))
    val back = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(Egress.outRoot(sfDir) + "/orders_csv")
      .select(col("o_orderkey").cast("long"),
        col("o_totalprice").cast("double"), col("o_orderdate").cast("date"))
    assert(back.count() == src.count())
    assert(back.exceptAll(src).count() == 0)
  }

  test("partitioned write produces hive key=value directories") {
    Egress.qPartitionedScan(spark, sfDir).collect() // performs the write
    val dirs = new java.io.File(Egress.outRoot(sfDir) + "/orders_part")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("o_orderstatus=")), s"dirs: $dirs")
  }

  test("variant column round-trips through parquet (shredded binary, typed extraction after read-back)") {
    val out = Egress.outRoot(sfDir) + "/variant_pq"
    val src = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("p"),
        parse_json(to_json(struct(col("o_orderkey").as("id"),
          col("o_orderpriority").as("prio")))).as("v"))
    src.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // the column survives AS a variant, not as a string
    assert(back.schema("v").dataType.typeName.toLowerCase.contains("variant"),
      s"expected VariantType, got ${back.schema("v").dataType}")
    // every row's binary encoding still answers typed path extraction
    val mismatches = back.filter(
      expr("variant_get(v, '$.id', 'long')") =!= col("k") ||
      expr("variant_get(v, '$.prio', 'string')") =!= col("p")).count()
    assert(mismatches == 0, s"$mismatches rows lost variant fidelity")
    assert(back.count() == src.count())
  }

  test("dynamic partition overwrite replaces only the written partition") {
    val out = Egress.outRoot(sfDir) + "/orders_dynpart"
    val src = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    Egress.overwritePartitionsDynamic(src, out, "o_orderstatus")
    def files(status: String): Map[String, Long] = {
      val d = new java.io.File(s"$out/o_orderstatus=$status")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val oBefore = files("O")
    val fCountBefore = spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F").count()
    // incremental reload of JUST partition F, halved by a filter so
    // replacement (not append) is observable
    val reload = src.filter(col("o_orderstatus") === "F")
      .filter(col("o_orderkey") % 2 === 0)
    Egress.overwritePartitionsDynamic(reload, out, "o_orderstatus")
    // sibling partition physically untouched (same files, same mtimes)
    assert(files("O") == oBefore,
      "dynamic overwrite must not rewrite partitions absent from the batch")
    val after = spark.read.parquet(out)
    val fCountAfter = after.filter(col("o_orderstatus") === "F").count()
    assert(fCountAfter < fCountBefore && fCountAfter > 0,
      s"partition F must be REPLACED: $fCountBefore -> $fCountAfter")
    // and replaced content is exactly the reload batch
    assert(fCountAfter == reload.count())
  }

  test("partition-key filter prunes to one partition at plan time") {
    Egress.qPartitionedScan(spark, sfDir).collect() // ensure written
    val read = Egress.partitionedRead(
      spark, Egress.outRoot(sfDir) + "/orders_part")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"no partition filter in plan:\n$plan")
    // the scan must touch only the o_orderstatus=F directory
    val scans = read.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.nonEmpty)
    // partition count pruned to 1 of 3 statuses
    val pruned = plan.linesIterator
      .find(_.contains("FileScan")).getOrElse("")
    assert(!pruned.contains("o_orderstatus=O") &&
      !pruned.contains("o_orderstatus=P"), pruned)
  }

  test("ipc write emits one file per partition; nulls round-trip") {
    val sp = spark; import sp.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, null, null), (null, "c", -0.0), (4L, "", 9.99))
      .toDF("k", "s", "v").repartition(3)
    val out = "/tmp/graft_egress/ipc_nulls"
    graft.ops.Ipc.writeIpc(df, out)
    val files = new java.io.File(out).listFiles((_, n) => n.endsWith(".arrow"))
    assert(files.length == 3)
    val back = graft.ops.Ipc.readIpc(spark, out)
    assert(back.schema.map(_.dataType.typeName) == Seq("long", "string", "double"))
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(norm(back) == norm(df))
  }

  test("ipc stream format round-trips rows and schema in memory") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", DoubleType)))
    val rows = Seq(Row(1L, "α", 2.5), Row(null, "b", null), Row(3L, null, -1.0))
    val bytes = graft.ops.Ipc.writeIpcStream(rows, schema)
    val (back, backSchema) = graft.ops.Ipc.readIpcStream(bytes)
    assert(backSchema.map(_.dataType) == schema.map(_.dataType))
    assert(back == rows)
  }

  test("ipc dsv2: write commits atomically, read round-trips, scan prunes columns") {
    val sp = spark; import sp.implicits._
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.5), (2L, null, null), (null, "c", -0.0), (4L, "", 9.99))
      .toDF("k", "s", "v").repartition(3)
    val out = "/tmp/graft_egress/ipc_dsv2_spec"
    df.write.format("graft-ipc").mode("overwrite").save(out)
    val files = new java.io.File(out).listFiles((_, n) => n.endsWith(".arrow"))
    assert(files.length == 3, "one committed file per partition")
    assert(new java.io.File(out).listFiles((_, n) => n.endsWith(".tmp")).isEmpty,
      "no uncommitted temps after a successful write")
    // full round-trip, nulls included
    val back = spark.read.format("graft-ipc").load(out)
    assert(back.schema.map(_.dataType.typeName) == Seq("long", "string", "double"))
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(norm(back) == norm(df))
    // overwrite with FEWER partitions must not leave stale part files
    df.limit(2).repartition(1).write.format("graft-ipc").mode("overwrite").save(out)
    assert(spark.read.format("graft-ipc").load(out).count() == 2)
    // column pruning reaches the scan (ScannerBuilder::Project analogue):
    // a single-column projection plans a BatchScan whose ReadSchema has
    // exactly that column
    val pruned = spark.read.format("graft-ipc").load(out).select("s")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("BatchScan")).getOrElse("")
    assert(scan.contains(", columns s") && !scan.contains("columns k"),
      s"scan not pruned to s:\n$scan")
    // and the scan is COLUMNAR: batches flow as ColumnarBatch with a
    // codegen'd ColumnarToRow above (vectorized-parquet mechanism)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("ColumnarToRow"), s"scan not columnar:\n$planStr")
  }

  test("ipc full type subset round-trips through both the imperative and dsv2 paths") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 2, 1.5f, 2.5, "α", true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-06-01"), ts),
      Row(null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    def check(back: org.apache.spark.sql.DataFrame): Unit = {
      assert(back.schema.map(_.dataType) == schema.map(_.dataType))
      val got = back.orderBy(col("l").asc_nulls_last).collect()
      assert(got.length == 2)
      val r = got(0)
      assert(r.getLong(0) == 1L && r.getInt(1) == 2 && r.getFloat(2) == 1.5f)
      assert(r.getDouble(3) == 2.5 && r.getString(4) == "α" && r.getBoolean(5))
      assert(r.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
      assert(r.getDate(7) == java.sql.Date.valueOf("2024-06-01"))
      assert(r.getTimestamp(8) == ts, s"got ${r.getTimestamp(8)}")
      assert((0 until 9).forall(got(1).isNullAt), "null row survives")
    }
    val out1 = "/tmp/graft_egress/ipc_types_imperative"
    graft.ops.Ipc.writeIpc(df, out1)
    check(graft.ops.Ipc.readIpc(spark, out1))
    val out2 = "/tmp/graft_egress/ipc_types_dsv2"
    df.write.format("graft-ipc").mode("overwrite").save(out2)
    check(spark.read.format("graft-ipc").load(out2))
  }

  test("avro full type subset round-trips; one container file per partition") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 2, 1.5f, 2.5, "α", true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-06-01"), ts),
      Row(null, null, null, null, null, null, null, null, null),
      Row(7L, 8, -0.5f, 9.5, "z", false, Array[Byte](),
        java.sql.Date.valueOf("1999-12-31"), ts))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 2), schema)
    val out = "/tmp/graft_egress/avro_types"
    graft.ops.Avro.writeAvro(df, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 2, "one avro container per partition")
    val back = graft.ops.Avro.readAvro(spark, out)
    assert(back.schema.map(_.dataType) == schema.map(_.dataType))
    val got = back.orderBy(col("l").asc_nulls_last).collect()
    assert(got.length == 3)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 2 && r.getFloat(2) == 1.5f)
    assert(r.getDouble(3) == 2.5 && r.getString(4) == "α" && r.getBoolean(5))
    assert(r.getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
    assert(r.getDate(7) == java.sql.Date.valueOf("2024-06-01"))
    assert(r.getTimestamp(8) == ts, s"got ${r.getTimestamp(8)}")
    assert(got(1).getLong(0) == 7L && got(1).getAs[Array[Byte]](6).isEmpty)
    assert((0 until 9).forall(got(2).isNullAt), "null row survives")
    // a second write to the same dir replaces the files (overwrite
    // semantics incl. stale-part cleanup)
    graft.ops.Avro.writeAvro(df.limit(1).repartition(1), out)
    assert(graft.ops.Avro.readAvro(spark, out).count() == 1)
  }

  test("ipc dsv2 reports size stats: small ipc side broadcasts in a join") {
    val sp = spark; import sp.implicits._
    val out = "/tmp/graft_egress/ipc_dsv2_stats"
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "s").repartition(1)
      .write.format("graft-ipc").mode("overwrite").save(out)
    val dim = spark.read.format("graft-ipc").load(out)
    val fact = graft.sources.Tables(spark, sfDir, "orders")
    val joined = fact.join(dim, fact("o_orderkey") === dim("k"))
    val plan = joined.queryExecution.executedPlan.toString
    // without SupportsReportStatistics the DSv2 side sizes at
    // defaultSizeInBytes and this would be a sort-merge join
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast:\n$plan")
  }

  test("ipc dsv2 COUNT(*) pushdown answers from batch metadata and matches the real count") {
    val out = Egress.outRoot(sfDir) + "/ipc_countpd"
    val src = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    src.repartition(3).write.format("graft-ipc").mode("overwrite").save(out)
    val ipc = spark.read.format("graft-ipc").load(out)
    val counted = ipc.groupBy().count()
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"),
      s"count(*) not pushed into the ipc scan:\n$plan")
    assert(counted.collect()(0).getLong(0) == src.count(), "pushed count wrong")
    // a grouped aggregate must DECLINE pushdown and still be correct
    val grouped = ipc.groupBy(col("o_orderkey") % 2).count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "grouped aggregate must not claim pushdown")
    assert(grouped.collect().map(_.getLong(1)).sum == src.count())
  }

  test("ipc dsv2 LIMIT pushdown: readers stop after n rows, plan carries the pushed limit") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_limit"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // one file, many record batches (BatchRows is 4096 in graft.ops.Ipc;
    // 20k rows => 5+ batches), so an unlimited scan loads several
    // batches while LIMIT 3 must load exactly one
    sp.range(0, 20000).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("s"))
      .repartition(1)
      .write.format("graft-ipc").mode("overwrite").save(dir)
    val limited = spark.read.format("graft-ipc").load(dir).limit(3)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"),
      s"scan description must carry the pushed limit:\n$plan")
    assert(limited.count() == 3)
    // values come from the file's first batch (k is 0..19999 in order)
    val ks = limited.as[(Long, String)].collect().map(_._1).toSet
    assert(ks.forall(_ < 4096), s"limit must be served from the first batch: $ks")
    // and an unlimited read still sees everything
    assert(spark.read.format("graft-ipc").load(dir).count() == 20000)
  }

  test("ipc dsv2 stats sidecars: planning skips files whose min/max refute the filter") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_stats"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // 4 files with disjoint k ranges (range repartition) + sidecars
    sp.range(0, 40000)
      .select(col("id").as("k"), concat(lit("u"), col("id")).as("s"))
      .repartitionByRange(4, col("k"))
      .write.format("graft-ipc").mode("overwrite").save(dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.count(_.endsWith(".arrow")) == 4 &&
      names.count(_.endsWith(".arrow.stats")) == 4, names.mkString(","))
    def scan = spark.read.format("graft-ipc").load(dir)
    // point lookup: stats confine it to ONE file
    val hit = scan.filter(col("k") === 12345L)
    assert(hit.queryExecution.executedPlan.toString.contains("filters="),
      "plan must show the pushed filters")
    assert(hit.rdd.getNumPartitions == 1,
      s"expected 1 surviving file, got ${hit.rdd.getNumPartitions}")
    assert(hit.as[(Long, String)].collect().toSeq == Seq((12345L, "u12345")))
    // impossible predicate: zero files opened, empty result
    val none = scan.filter(col("k") > 999999L)
    assert(none.rdd.getNumPartitions == 0)
    assert(none.count() == 0)
    // range predicate: only the tail files survive
    val hi = scan.filter(col("k") >= 30000L)
    assert(hi.rdd.getNumPartitions <= 2, s"${hi.rdd.getNumPartitions}")
    assert(hi.count() == 10000)
    // stats are ADVISORY: with sidecars gone, nothing prunes but every
    // answer is identical
    for (f <- new java.io.File(dir).listFiles() if f.getName.endsWith(".stats"))
      f.delete()
    val noStats = scan.filter(col("k") === 12345L)
    assert(noStats.rdd.getNumPartitions == 4)
    assert(noStats.as[(Long, String)].collect().toSeq == Seq((12345L, "u12345")))
  }

  test("ipc dsv2 stats skipping >64 files: the distributed pruning path keeps one file") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_stats_many"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    sp.range(0, 100000).select(col("id").as("k"))
      .repartitionByRange(80, col("k"))
      .write.format("graft-ipc").mode("overwrite").save(dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".arrow")) == 80)
    val hit = spark.read.format("graft-ipc").load(dir)
      .filter(col("k") === 54321L)
    assert(hit.rdd.getNumPartitions == 1,
      s"expected 1 surviving file, got ${hit.rdd.getNumPartitions}")
    assert(hit.as[Long].collect().toSeq == Seq(54321L))
  }

  test("ipc dsv2 MIN/MAX pushdown: answered from sidecars, declines without full coverage") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_minmax"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    sp.range(0, 40000).select(col("id").as("k"), (col("id") % 2 === 0).as("b"),
        concat(lit("v"), lpad(col("id").cast("string"), 5, "0")).as("s"))
      .repartitionByRange(4, col("k"))
      .write.format("graft-ipc").mode("overwrite").save(dir)
    def scan = spark.read.format("graft-ipc").load(dir)
    val agg = scan.agg(min("k"), max("k"), count(lit(1)), max("b"),
      min("s"), max("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("sidecar-metadata-only"),
      s"expected the sidecar aggregate scan:\n$plan")
    assert(agg.collect().toSeq.map(_.toSeq) ==
      Seq(Seq(0L, 39999L, 40000L, true, "v00000", "v39999")))
    // string RANGE filters prune files (UTF8-byte-order sidecar
    // bounds): the k-range-clustered files carry aligned s ranges
    val srange = scan.filter(col("s") >= "v30000")
    assert(srange.rdd.getNumPartitions < 4,
      "string range filter pruned nothing")
    assert(srange.count() == 10000)
    // doubles decline (NaN corner): same answer via the normal scan
    val dagg = scan.select(col("k"), (col("k") * 0.5).as("d"))
      .agg(min("d"), max("d"))
    assert(dagg.collect().toSeq.map(_.toSeq) == Seq(Seq(0.0, 19999.5)))
    // LEGACY sidecar (no format-version marker): its string bounds
    // were computed under UTF-16 order, so string MIN/MAX must
    // decline to the scan path — a null partial from the demoted
    // column would silently answer NULL. Numeric bounds order
    // identically in both generations and keep pushing.
    val legacy = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".stats")).head
    val body = new String(
      java.nio.file.Files.readAllBytes(legacy.toPath), "UTF-8")
    java.nio.file.Files.write(legacy.toPath,
      body.replaceFirst("\"v\":\\d+,", "").getBytes("UTF-8"))
    // the direct rewrite invalidates LocalFileSystem's checksum shadow
    new java.io.File(legacy.getParent, s".${legacy.getName}.crc").delete()
    val saggL = scan.agg(min("s"), max("s"))
    assert(!saggL.queryExecution.executedPlan.toString
      .contains("sidecar-metadata-only"),
      "string MIN/MAX must decline on a legacy (marker-less) sidecar")
    assert(saggL.collect().toSeq.map(_.toSeq) ==
      Seq(Seq("v00000", "v39999")), "declined path answered wrong")
    val kaggL = scan.agg(min("k"), max("k"))
    assert(kaggL.queryExecution.executedPlan.toString
      .contains("sidecar-metadata-only"),
      "numeric MIN/MAX still pushes on legacy sidecars")
    assert(kaggL.collect().toSeq.map(_.toSeq) == Seq(Seq(0L, 39999L)))
    // remove one sidecar: pushdown declines wholesale, answers unchanged
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".stats"))
      .take(1).foreach(_.delete())
    val agg2 = scan.agg(min("k"), max("k"))
    val plan2 = agg2.queryExecution.executedPlan.toString
    assert(!plan2.contains("sidecar-metadata-only"),
      s"must decline with a missing sidecar:\n$plan2")
    assert(agg2.collect().toSeq.map(_.toSeq) == Seq(Seq(0L, 39999L)))
  }

  test("parquet codec matrix: zstd/snappy/none round-trip losslessly, compression earns its bytes") {
    def dirSize(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val src = graft.sources.Tables(spark, sfDir, "lineitem")
    val base = Egress.outRoot(sfDir) + "/codec_"
    val sizes = Seq("none", "snappy", "zstd").map { codec =>
      val out = base + codec
      src.write.mode("overwrite").option("compression", codec).parquet(out)
      val back = spark.read.parquet(out)
      assert(back.count() == src.count(), s"$codec lost rows")
      // full-fidelity check on an exact aggregate, not just counts
      val s0 = src.agg(sum(col("l_orderkey")), sum(col("l_linenumber"))).collect()(0)
      val s1 = back.agg(sum(col("l_orderkey")), sum(col("l_linenumber"))).collect()(0)
      assert(s0 == s1, s"$codec changed values")
      codec -> dirSize(out)
    }.toMap
    assert(sizes("zstd") < sizes("none") && sizes("snappy") < sizes("none"),
      s"compression did not shrink the data: $sizes")
  }

  test("compaction rewrites a fragmented dataset into evenly-sized files") {
    val frag = Egress.outRoot(sfDir) + "/orders_frag"
    val compacted = Egress.outRoot(sfDir) + "/orders_compacted"
    val src = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    src.repartition(32).write.mode("overwrite").parquet(frag)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles((_, n) => n.endsWith(".parquet"))
    assert(parquetFiles(frag).length == 32, "fragmented input")
    val total = parquetFiles(frag).map(_.length).sum
    val n = Egress.compactParquet(spark, frag, compacted, targetBytes = total / 4)
    assert(parquetFiles(compacted).length == n && n <= 6,
      s"expected ~4-5 compacted files, got $n")
    // lossless: same rows after the rewrite
    assert(spark.read.parquet(compacted).count() == src.count())
    assert(spark.read.parquet(compacted).exceptAll(src).isEmpty)
  }

  test("ipc sink rejects out-of-subset types with a clear error") {
    val sp = spark; import sp.implicits._
    // decimal/list/struct/map joined the wire subset in round 9 and
    // the byte/short/time/interval ladder in round 11 — VARIANT
    // remains outside it (no Arrow wire mapping)
    val bad = graft.sources.Tables(spark, sfDir, "orders")
      .select(expr("parse_json('1')").as("k"))
    val e = intercept[Exception] {
      bad.write.format("graft-ipc").mode("overwrite")
        .save("/tmp/graft_egress/ipc_badtype")
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("IPC sink supports"))),
      s"unclear error: $e")
  }

  test("orc round-trip preserves types") {
    Egress.qOrcRoundtrip(spark, sfDir).collect() // performs the write
    val back = spark.read.orc(Egress.outRoot(sfDir) + "/orders_orc")
    val st = back.schema
    assert(st("o_orderkey").dataType.typeName == "long")
    assert(st("o_totalprice").dataType.typeName == "double")
    assert(st("o_orderdate").dataType.typeName == "date")
    assert(back.count() ==
      graft.sources.Tables(spark, sfDir, "orders").count())
  }
}
