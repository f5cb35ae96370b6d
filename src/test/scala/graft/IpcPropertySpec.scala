package graft

import org.apache.spark.sql.types._

import graft.ops.Ipc

/** Randomized round-trip property over the graft-ipc STREAM codec —
  * the analogue of the reference's IPC fuzz targets (`cpp/ci` fuzzing,
  * SURVEY §5): seeded random schemas over all nine wire types ×
  * random nullability × random values including the adversarial edge
  * set, every trial asserting write→read bit-fidelity. Seeded, so a
  * failure reproduces; no Spark jobs — this exercises the codec
  * itself. Generator shared with AvroPropertySpec ([[RoundTripGen]]).
  */
class IpcPropertySpec extends SparkSpec with RoundTripGen {

  protected val rnd = new scala.util.Random(20260812L)

  // the IPC codec carries the full ladder (tinyint/smallint, NTZ
  // timestamp, TIME, both ANSI intervals) on top of the nine shared
  // wire types — fuzz over all of them
  override protected def wireTypes: Seq[DataType] =
    super.wireTypes ++ extendedWireTypes

  test("stream codec round-trips 60 random schemas bit-exactly (incl. zero rows, multi-batch)") {
    for (trial <- 0 until 60) {
      val schema = randSchema(6)
      // bias row counts to the interesting spots: 0, 1, batch edge ±1, multi-batch
      val nRows = rnd.nextInt(5) match {
        case 0 => 0
        case 1 => 1
        case 2 => Ipc.BatchRows - 1 + rnd.nextInt(3)
        case 3 => Ipc.BatchRows + 1 + rnd.nextInt(100)
        case _ => rnd.nextInt(200)
      }
      val rows = randRows(schema, nRows)
      // a third of trials ride a compressed stream: random data is
      // mostly incompressible, so this also fuzzes the
      // compression-didn't-help raw-fallback path of the codec
      // envelope (NO_COMPRESSION_LENGTH marker), per buffer
      val codec = Seq("none", "zstd", "lz4")(trial % 3)
      val bos = new java.io.ByteArrayOutputStream()
      Ipc.writeIpcStreamTo(rows.iterator, schema, bos, codec)
      val (back, backSchema) = Ipc.readIpcStream(bos.toByteArray)
      assertSameRows(trial, schema, rows, back, backSchema)
    }
  }

  test("DSv2 write→read round-trips 10 random EXTENDED-ladder schemas — " +
      "the connector writer cannot silently narrow a type the codec " +
      "carries (TIME, NTZ, both ANSI intervals, tinyint/smallint)") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("graft_ipc_dsv2_fuzz")
    for (trial <- 0 until 10) {
      // every trial carries ≥2 extended leaves plus random base picks
      val types = rnd.shuffle(extendedWireTypes).take(2) ++
        Seq.fill(2)(wireTypes(rnd.nextInt(wireTypes.length)))
      val schema = StructType(
        StructField("rid", LongType, nullable = false) +:
          types.zipWithIndex.map { case (t, i) =>
            StructField(s"c$i", t, nullable = true) })
      val n = rnd.nextInt(3) match {
        case 0 => 1
        case 1 => Ipc.BatchRows + 1 + rnd.nextInt(50) // multi-batch file
        case _ => 2 + rnd.nextInt(200)
      }
      val rows = (0 until n).map { r =>
        org.apache.spark.sql.Row.fromSeq(r.toLong +: types.map(t =>
          if (rnd.nextInt(5) == 0) null else randValue(t)))
      }
      val path = base.resolve(s"t$trial").toString
      import scala.jdk.CollectionConverters._
      sp.createDataFrame(rows.asJava, schema)
        .write.format("graft-ipc").mode("overwrite")
        .option("compression", Seq("none", "zstd", "lz4")(trial % 3))
        .save(path)
      val back = sp.read.format("graft-ipc").load(path)
      // rid pins row identity across the one-partition-per-file scan
      val got = back.collect().sortBy(_.getLong(0)).toSeq
      assertSameRows(trial, schema, rows, got, back.schema)
    }
  }

  // ---- delta dictionaries (reference format/Message.fbs isDelta) ----------

  private def pythonWithPyarrow: Option[String] =
    Seq("python3", "python").find { py =>
      try {
        val p = new ProcessBuilder(py, "-c", "import pyarrow.parquet")
          .redirectErrorStream(true).start()
        p.waitFor() == 0
      } catch { case _: Throwable => false }
    }

  test("pyarrow-written DELTA dictionary batches decode on the stream " +
      "and file read paths (5 seeded fuzz rounds; skips without pyarrow)") {
    val py = pythonWithPyarrow.getOrElse(
      cancel("no python3 with pyarrow on this machine"))
    for (seed <- 1 to 5) {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_delta_dict_$seed").toString
      val proc = new ProcessBuilder(py, "tools/make_delta_dict.py",
        seed.toString, out)
        .directory(new java.io.File(sys.props("user.dir")))
        .redirectErrorStream(true).start()
      val log = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor() == 0, s"fixture generation failed:\n$log")
      // the stream must really carry deltas (first dict + >=1 delta)
      val nDict = "DICT_MESSAGES=(\\d+)".r.findFirstMatchIn(log)
        .get.group(1).toInt
      assert(nDict >= 2, s"seed $seed emitted no delta batches:\n$log")
      val expected = spark.read.parquet(s"$out/expected.parquet")
        .collect().map(r => (r.getLong(1), Option(r.getString(0))))
        .sortBy(_._1).toSeq
      // stream path: the reader must APPEND each isDelta batch to its
      // id's dictionary — early batches index the prefix, later ones
      // the extended dictionary
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$out/delta.arrows"))
      val (sRows, sSchema) = Ipc.readIpcStream(bytes)
      assert(sSchema.fields.map(_.dataType).toSeq ==
        Seq(StringType, LongType))
      val sGot = sRows.map(r => (r.getLong(1), Option(r.getString(0))))
        .sortBy(_._1).toSeq
      assert(sGot == expected, s"seed $seed stream mismatch")
      // file path (footer dictionary blocks, same append semantics)
      val fGot = Ipc.readIpc(spark, s"$out/fdir")
        .collect().map(r => (r.getLong(1), Option(r.getString(0))))
        .sortBy(_._1).toSeq
      assert(fGot == expected, s"seed $seed file mismatch")
      // DSv2 path (r14): the connector decodes the same pyarrow-written
      // delta-dictionary file — int32 categorical indices resolve to
      // utf8 through the delta-grown dictionary on BOTH its readers
      val dGot = spark.read.format("graft-ipc").load(s"$out/fdir")
        .collect().map(r => (r.getLong(1), Option(r.getString(0))))
        .sortBy(_._1).toSeq
      assert(dGot == expected, s"seed $seed DSv2 mismatch")
    }
  }

  /** Walk an Arrow FILE's encapsulated messages between the leading
    * magic and the footer: the isDelta flag of each DictionaryBatch in
    * stream order, plus whether any RecordBatch was seen. */
  private def walkDictMessages(bytes: Array[Byte]): (Seq[Boolean], Boolean) = {
    var pos = 8 // "ARROW1\0\0"
    val dicts = Seq.newBuilder[Boolean]
    var sawBatch = false
    def intBE(p: Int) = ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
      ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      if (intBE(pos) != -1) { done = true } // footer region reached
      else {
        val metaLen = Integer.reverseBytes(intBE(pos + 4))
        if (metaLen == 0) { done = true }
        else {
          val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(
            java.nio.ByteBuffer.wrap(bytes, pos + 8, metaLen).slice())
          if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.DictionaryBatch) {
            val db = msg.header(new org.apache.arrow.flatbuf.DictionaryBatch())
              .asInstanceOf[org.apache.arrow.flatbuf.DictionaryBatch]
            dicts += db.isDelta
          }
          if (msg.headerType() == org.apache.arrow.flatbuf.MessageHeader.RecordBatch)
            sawBatch = true
          pos += 8 + metaLen + msg.bodyLength().toInt
        }
      }
    }
    (dicts.result(), sawBatch)
  }

  test("the engine's dictionary WRITER never emits deltas: one non-delta " +
      "DictionaryBatch per encoded column per file") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_dict_writer").toString
    val df = (0 until 3000).map(i => (i.toLong, s"cat${i % 7}"))
      .toDF("id", "cat").coalesce(1)
    Ipc.writeIpcDict(df, out, Seq("cat"))
    val f = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val (flags, sawBatch) = walkDictMessages(
      java.nio.file.Files.readAllBytes(f.toPath))
    assert(sawBatch, "no record batch found — message walk broken")
    assert(flags == Seq(false),
      s"expected exactly 1 non-delta dictionary message, got $flags")
  }

  test("the DELTA dictionary writer emits an initial batch plus isDelta " +
      "extensions; the engine and stock pyarrow read them back intact") {
    val sp = spark; import sp.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_dict_delta").toString
    // categories arrive in 3000-row waves against BatchRows = 4096:
    // batch 1 sees cat0/cat1, batches 2 and 3 introduce cat2/cat3 →
    // real isDelta extensions; `tag` is constant → initial dictionary
    // only; the i % 97 nulls exercise the validity path
    val df = (0 until 10000).map(i => (i.toLong,
        if (i % 97 == 0) null else s"cat${i / 3000}", "t0"))
      .toDF("id", "cat", "tag").coalesce(1)
    Ipc.writeIpcDictDelta(df, out, Seq("cat", "tag"))
    val f = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".arrow")).head
    val (flags, sawBatch) = walkDictMessages(
      java.nio.file.Files.readAllBytes(f.toPath))
    assert(sawBatch)
    // two initial dictionaries (cat, tag) first, then only deltas
    assert(flags.count(_ == false) == 2 && !flags.take(2).exists(identity),
      s"dictionary message flags: $flags")
    assert(flags.count(_ == true) >= 2, s"no deltas emitted: $flags")
    // engine read-back decodes through the grown dictionary exactly
    val back = Ipc.readIpc(spark, out)
    assert(back.schema("cat").dataType == StringType)
    assert(back.count() == 10000)
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    // stock-pyarrow read-back: distinct sets and an id×rank pairing
    // checksum (catches right-values-wrong-rows decodes)
    pythonWithPyarrow.foreach { py =>
      val pr = new ProcessBuilder(
        py, "tools/make_delta_dict.py", "readback", out)
        .directory(new java.io.File(sys.props("user.dir")))
        .redirectErrorStream(true).start()
      val log = new String(pr.getInputStream.readAllBytes())
      assert(pr.waitFor() == 0, s"pyarrow readback failed:\n$log")
      assert(log.contains("ROWS=10000"), log)
      assert(log.contains("DISTINCT_cat=cat0,cat1,cat2,cat3"), log)
      assert(log.contains("DISTINCT_tag=t0"), log)
      val chkCat = (0 until 10000).map(i =>
        if (i % 97 == 0) 0L else i.toLong * (i / 3000 + 1)).sum
      val chkTag = (0 until 10000).map(_.toLong).sum
      assert(log.contains(s"CHK_cat=$chkCat"), log)
      assert(log.contains(s"CHK_tag=$chkTag"), log)
    }
    // the 65536-distinct cap still refuses loudly, now mid-write
    val wide = (0 until 70000).map(i => (i.toLong, s"v$i", "t"))
      .toDF("id", "cat", "tag").coalesce(1)
    val e = intercept[Exception] {
      Ipc.writeIpcDictDelta(wide, out + "_wide", Seq("cat"))
    }
    def texts(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: texts(x.getCause))
    assert(texts(e).exists(m => m != null && m.contains("65536")), e)
  }

  test("DELTA dictionary writer seeded fuzz: random value streams with " +
      "growing vocabularies round-trip exactly (5 rounds)") {
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(20260817 + seed)
      val nRows = 1500 + rnd.nextInt(4000)
      val nCats = 1 + rnd.nextInt(12)
      // values draw from a prefix that GROWS with the row index, so
      // later batches introduce new values (the delta path) with high
      // probability — nCats = 1 degenerates to initial-only, also legal
      val rows = (0 until nRows).map { i =>
        val avail = 1 + (i * nCats) / nRows
        val v = if (rnd.nextInt(10) == 0) null
          else s"s${seed}_v${rnd.nextInt(avail)}"
        (i.toLong, v)
      }
      val df = rows.toDF("id", "cat").coalesce(1)
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_dict_delta_fz_$seed").toString
      Ipc.writeIpcDictDelta(df, out, Seq("cat"),
        batchRows = 256 + rnd.nextInt(1024))
      val back = Ipc.readIpc(spark, out)
      assert(back.count() == nRows, s"seed $seed row count")
      assert(back.exceptAll(df).count() == 0 &&
        df.exceptAll(back).count() == 0, s"seed $seed round-trip mismatch")
      val f = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".arrow")).head
      val (flags, sawBatch) = walkDictMessages(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(sawBatch && flags.count(_ == false) == 1 &&
        !flags.headOption.getOrElse(false),
        s"seed $seed dictionary flags $flags")
    }
  }

  test("stream codec round-trips 40 random NESTED schemas (list/struct/map/decimal, depth ≤ 2)") {
    for (trial <- 0 until 40) {
      val schema = randNestedSchema(4, 2)
      val nRows = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => Ipc.BatchRows - 1 + rnd.nextInt(3)
        case _ => rnd.nextInt(120)
      }
      val rows = randRows(schema, nRows)
      val bytes = Ipc.writeIpcStream(rows, schema)
      val (back, backSchema) = Ipc.readIpcStream(bytes)
      assertSameRows(trial, schema, rows, back, backSchema)
    }
  }
}
