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
