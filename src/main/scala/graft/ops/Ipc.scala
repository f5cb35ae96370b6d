package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, BitVector, DateDayVector, Float4Vector, Float8Vector, IntVector, TimeStampMicroTZVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.sources.Tables

/** Arrow IPC (Feather v2) file source/sink — the reference's native
  * interchange format (`cpp/src/arrow/ipc/reader.h:58`
  * RecordBatchFileReader, `writer.h:54`, `feather.h:129`), built on
  * the Arrow Java library Spark already ships.
  *
  * Both directions are distributed with the reference's own
  * granularity: the writer emits ONE .arrow FILE PER PARTITION from
  * the executors (the `write_csv` one-file-per-partition model,
  * `rust/datafusion/src/execution/context.rs:451-496`), and the
  * reader plans ONE PARTITION PER FILE (DataFusion's
  * `CsvExec::build_file_list` model, `physical_plan/csv.rs:31-66`).
  * Schema comes from the file footer of one file, the
  * `SourceFactory::Inspect` discovery step (`dataset/discovery.h:55`).
  *
  * All file I/O goes through the Hadoop FileSystem API (driver-side
  * listing/cleanup AND executor-side writes/reads), so the path may
  * be any Hadoop-supported filesystem (local, HDFS, object store) —
  * executors need not share the driver's local disk. Writes follow a
  * task-commit protocol: each attempt writes an attempt-unique
  * temporary file and renames it into place on success, so a
  * speculative or retried task can never interleave bytes with the
  * winning attempt (first successful rename wins; losers delete
  * their temp).
  *
  * Type subset (documented convention): BIGINT, INT, FLOAT, DOUBLE,
  * STRING, BOOLEAN, BINARY, DATE, TIMESTAMP(µs, UTC) — nullable
  * throughout. Nested/decimal types travel via parquet, our primary
  * interchange (SURVEY §2.1).
  */
object Ipc {

  private[graft] def toArrowSchema(s: StructType): ArrowSchema = {
    val fields = s.fields.map { f =>
      val t = f.dataType match {
        case LongType      => new ArrowType.Int(64, true)
        case IntegerType   => new ArrowType.Int(32, true)
        case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType     => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType    => ArrowType.Utf8.INSTANCE
        case BooleanType   => ArrowType.Bool.INSTANCE
        case BinaryType    => ArrowType.Binary.INSTANCE
        case DateType      => new ArrowType.Date(DateUnit.DAY)
        // Spark TimestampType is a µs-precision instant → UTC-zoned
        // Arrow timestamp (the SURVEY §1.2 ns-truncation convention
        // applies upstream of this sink)
        case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
        case other => throw new IllegalArgumentException(
          s"IPC sink supports bigint/int/float/double/string/bool/binary/date/timestamp, got $other for ${f.name}")
      }
      new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList[Field])
    }
    new ArrowSchema(fields.toSeq.asJava)
  }

  private[graft] def toSparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8   => StringType
    case _: ArrowType.Bool   => BooleanType
    case _: ArrowType.Binary => BinaryType
    case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
    case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND => TimestampType
    case other => throw new IllegalArgumentException(
      s"IPC source supports bigint/int/float/double/string/bool/binary/date/timestamp, got $other for ${f.getName}")
  }

  /** Shared per-type copy kernels between Spark external rows and
    * Arrow vectors (the Row-based writeIpc/readIpc paths; the DSv2
    * writer has its own InternalRow variant). */
  private[graft] def setFromRow(vec: org.apache.arrow.vector.FieldVector,
      r: Int, row: Row, c: Int): Unit = vec match {
    case v: BigIntVector => v.setSafe(r, row.getLong(c))
    case v: IntVector    => v.setSafe(r, row.getInt(c))
    case v: Float8Vector => v.setSafe(r, row.getDouble(c))
    case v: Float4Vector => v.setSafe(r, row.getFloat(c))
    case v: VarCharVector =>
      v.setSafe(r, row.getString(c).getBytes("UTF-8"))
    case v: BitVector => v.setSafe(r, if (row.getBoolean(c)) 1 else 0)
    case v: VarBinaryVector => v.setSafe(r, row.getAs[Array[Byte]](c))
    case v: DateDayVector =>
      v.setSafe(r, row.getDate(c).toLocalDate.toEpochDay.toInt)
    case v: TimeStampMicroTZVector =>
      val ts = row.getTimestamp(c)
      v.setSafe(r, math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
  }

  private[graft] def getToAny(vec: org.apache.arrow.vector.FieldVector,
      r: Int): Any = vec match {
    case v: BigIntVector    => v.get(r)
    case v: IntVector       => v.get(r)
    case v: Float8Vector    => v.get(r)
    case v: Float4Vector    => v.get(r)
    case v: VarCharVector   => new String(v.get(r), "UTF-8")
    case v: BitVector       => v.get(r) == 1
    case v: VarBinaryVector => v.get(r)
    case v: DateDayVector   =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.get(r).toLong))
    case v: TimeStampMicroTZVector =>
      val us = v.get(r)
      val ts = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
  }

  private[graft] val BatchRows = 4096

  /** Distributed IPC write: each task streams its partition into its
    * own Arrow file in `dir`, batching [[BatchRows]] rows per record
    * batch — rows never leave their executor. */
  def writeIpc(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val confSer = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(confSer.value)
    fs.mkdirs(dirPath)
    // overwrite semantics: a previous run with MORE partitions must not
    // leave stale part files behind to be re-read alongside new ones;
    // also clear orphaned temps from crashed attempts
    // also collect DSv2 stats sidecars: a stale sidecar must never
    // outlive the data file it described
    for (pat <- Seq("*.arrow", ".*.arrow.tmp", "*.arrow.stats", ".*.arrow.tmp.stats");
         st <- Option(fs.globStatus(new HPath(dirPath, pat))).getOrElse(Array()))
      fs.delete(st.getPath, false)
    df.rdd.foreachPartition { rows =>
      val tc = TaskContext.get()
      val pid = tc.partitionId()
      val taskFs = new HPath(dir).getFileSystem(confSer.value)
      val finalPath = new HPath(dir, s"part-$pid.arrow")
      val tmpPath = new HPath(dir, s".part-$pid-a${tc.taskAttemptId()}.arrow.tmp")
      val allocator = new RootAllocator()
      val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
      val out = taskFs.create(tmpPath, true)
      val ch = java.nio.channels.Channels.newChannel(out)
      val writer = new ArrowFileWriter(root, null, ch)
      writer.start()
      val buf = new Array[Row](BatchRows)
      def flush(n: Int): Unit = if (n > 0) {
        var c = 0
        while (c < schema.length) {
          val vec = root.getVector(c)
          vec.setInitialCapacity(n)
          vec.allocateNew()
          var r = 0
          while (r < n) {
            val row = buf(r)
            if (row.isNullAt(c)) () // unset = null in Arrow validity
            else setFromRow(vec, r, row, c)
            r += 1
          }
          vec.setValueCount(n)
          c += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      var n = 0
      for (row <- rows) {
        buf(n) = row; n += 1
        if (n == BatchRows) { flush(n); n = 0 }
      }
      flush(n)
      writer.end(); writer.close(); out.close(); root.close(); allocator.close()
      // commit: first attempt to commit wins; a loser (speculative twin
      // already committed) discards its temp. The exists() guard is
      // load-bearing on POSIX-semantics filesystems (RawLocalFileSystem),
      // where rename OVERWRITES an existing destination — without it a
      // losing attempt silently replaces the winner's file. Benign for
      // deterministic partition contents, wrong in general. (exists+
      // rename is not atomic; HDFS/object-store rename refuses an
      // existing destination on its own, and on local FS Spark runs
      // speculative twins in one JVM where the window is nanoseconds —
      // the DSv2 writer's driver-side commit coordinator is the
      // fully-atomic path.)
      if (taskFs.exists(finalPath) || !taskFs.rename(tmpPath, finalPath))
        taskFs.delete(tmpPath, false)
    }
  }

  /** Minimal SeekableByteChannel over a Hadoop FSDataInputStream, the
    * shape ArrowFileReader needs to reach the footer of a file on any
    * Hadoop filesystem. */
  private[graft] final class HadoopSeekableChannel(in: FSDataInputStream, len: Long)
      extends java.nio.channels.SeekableByteChannel {
    private var closed = false
    override def read(dst: java.nio.ByteBuffer): Int = {
      val want = dst.remaining()
      if (want == 0) return 0
      val buf = new Array[Byte](want)
      val got = in.read(buf, 0, want)
      if (got > 0) dst.put(buf, 0, got)
      got
    }
    override def write(src: java.nio.ByteBuffer): Int =
      throw new java.nio.channels.NonWritableChannelException
    override def position(): Long = in.getPos
    override def position(p: Long): java.nio.channels.SeekableByteChannel = {
      in.seek(p); this
    }
    override def size(): Long = len
    override def truncate(s: Long): java.nio.channels.SeekableByteChannel =
      throw new java.nio.channels.NonWritableChannelException
    override def isOpen: Boolean = !closed
    override def close(): Unit = { closed = true; in.close() }
  }

  /** Distributed IPC read: schema discovered from one file's footer,
    * then one scan partition per file. */
  def readIpc(s: SparkSession, dir: String): DataFrame = {
    val confSer = new SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(confSer.value)
    // discovery via the Hadoop FS listing — sees files written by any
    // executor, not just ones sharing the driver's local disk
    val files = Option(fs.globStatus(new HPath(dirPath, "*.arrow")))
      .getOrElse(Array()).toSeq
      .map(st => (st.getPath.toString, st.getLen)).sortBy(_._1)
    require(files.nonEmpty, s"no .arrow files in $dir")
    // discovery/Inspect: one footer read on the driver
    val sparkSchema = {
      val allocator = new RootAllocator()
      val (headPath, headLen) = files.head
      val rd = new ArrowFileReader(
        new HadoopSeekableChannel(fs.open(new HPath(headPath)), headLen),
        allocator)
      val arrowFields = rd.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
      val st = StructType(arrowFields.map(f =>
        StructField(f.getName, toSparkType(f), nullable = true)))
      rd.close(); allocator.close()
      st
    }
    val nCols = sparkSchema.length
    val rowRdd = s.sparkContext
      .parallelize(files, files.size) // one partition per file
      .flatMap { case (path, len) =>
        val p = new HPath(path)
        val taskFs = p.getFileSystem(confSer.value)
        val allocator = new RootAllocator()
        val rd = new ArrowFileReader(
          new HadoopSeekableChannel(taskFs.open(p), len), allocator)
        val root = rd.getVectorSchemaRoot
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (rd.loadNextBatch()) {
          var r = 0
          val n = root.getRowCount
          while (r < n) {
            val vals = new Array[Any](nCols)
            var c = 0
            while (c < nCols) {
              val vec = root.getVector(c)
              vals(c) = if (vec.isNull(r)) null else getToAny(vec, r)
              c += 1
            }
            out += Row.fromSeq(vals.toIndexedSeq)
            r += 1
          }
        }
        rd.close(); allocator.close()
        out
      }
    s.createDataFrame(rowRdd, sparkSchema)
  }

  /** Arrow IPC STREAM format (`ipc/reader.h:58`
    * RecordBatchStreamReader): the unseekable wire variant of the file
    * format — no footer, schema first, batches until EOS. Byte-array
    * in/out (the transport payload shape); same type subset. Used for
    * handing batches to another process over a socket/pipe, not for
    * at-rest storage — EgressSpec round-trips it in memory. */
  def writeIpcStream(rows: Seq[Row], schema: StructType): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeIpcStreamTo(rows.iterator, schema, bos)
    bos.toByteArray
  }

  /** Incremental stream-format writer: drains `rows` in [[BatchRows]]
    * batches straight to `out` (socket, pipe, file), holding at most
    * one batch in memory — the transport-side half of the codec that
    * [[graft.ops.FlightLite]] serves DoGet responses with. */
  def writeIpcStreamTo(rows: Iterator[Row], schema: StructType,
      out: java.io.OutputStream): Unit = {
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
      root, null, java.nio.channels.Channels.newChannel(out))
    writer.start()
    rows.grouped(BatchRows).foreach { batch =>
      val n = batch.length
      var c = 0
      while (c < schema.length) {
        val vec = root.getVector(c)
        vec.setInitialCapacity(n)
        vec.allocateNew()
        var r = 0
        while (r < n) {
          val row = batch(r)
          if (row.isNullAt(c)) ()
          else setFromRow(vec, r, row, c)
          r += 1
        }
        vec.setValueCount(n)
        c += 1
      }
      root.setRowCount(n)
      writer.writeBatch()
    }
    writer.end(); writer.close(); root.close(); allocator.close()
  }

  /** Stream-format read: schema from the stream head, batches to EOS. */
  def readIpcStream(bytes: Array[Byte]): (Seq[Row], StructType) =
    readIpcStreamFrom(new java.io.ByteArrayInputStream(bytes))

  /** Stream-format read from any InputStream (socket, pipe): consumes
    * batches until the Arrow end-of-stream marker. */
  def readIpcStreamFrom(in: java.io.InputStream): (Seq[Row], StructType) = {
    val allocator = new RootAllocator()
    val rd = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, allocator)
    val root = rd.getVectorSchemaRoot
    val sparkSchema = StructType(root.getSchema.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, toSparkType(f), nullable = true)))
    val nCols = sparkSchema.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (rd.loadNextBatch()) {
      var r = 0
      val n = root.getRowCount
      while (r < n) {
        val vals = new Array[Any](nCols)
        var c = 0
        while (c < nCols) {
          val vec = root.getVector(c)
          vals(c) = if (vec.isNull(r)) null else getToAny(vec, r)
          c += 1
        }
        out += Row.fromSeq(vals.toIndexedSeq)
        r += 1
      }
    }
    rd.close(); allocator.close()
    (out.toSeq, sparkSchema)
  }

  /** IPC round-trip query: project orders to the IPC type subset,
    * write one Arrow file per partition, re-discover + read, and
    * aggregate — lossless round-trip proven by the oracle hash over
    * the ORIGINAL parquet. */
  def qIpcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/orders_ipc"
    writeIpc(
      Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        // spread over several files so the read half demonstrably
        // plans one partition per file
        .repartition(4, col("o_orderkey")),
      out)
    readIpc(s, out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  val qIpcRoundtripSql: String = s"""
    SELECT o_orderstatus, COUNT(*) AS n,
      ${dsumSql("o_totalprice")} AS total_price,
      MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** The same round-trip through the DataSource V2 connector
    * ([[graft.sources.ipc.IpcDataSource]], format "graft-ipc"):
    * `df.write.format(...)` runs the job-commit write, `spark.read
    * .format(...)` plans a BatchScan with one partition per file, and
    * the aggregation only references two of the three written columns
    * — so Catalyst pushes a pruned required schema into the scan
    * (asserted in EgressSpec). Lossless vs the original parquet is
    * what the oracle hash proves. */
  def qIpcDsv2(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/orders_ipc_dsv2"
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .repartition(4, col("o_orderkey"))
      .write.format("graft-ipc").mode("overwrite").save(out)
    s.read.format("graft-ipc").load(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderstatus")
  }

  val qIpcDsv2Sql: String = s"""
    SELECT o_orderstatus, COUNT(*) AS n,
      ${dsumSql("o_totalprice")} AS total_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
  """.trim

  /** Stats-based file skipping under an ORACLE: orders written as a
    * range-partitioned graft-ipc layout (8 files with disjoint
    * o_orderkey ranges + min/max sidecars), then a key-range query
    * reads it back — planning opens only the files whose sidecar
    * ranges intersect the predicate, and the answer must equal the
    * same query on the parquet original. The skipping is invisible to
    * semantics (every filter stays residual); this row pins that. */
  def qIpcSkip(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/orders_ipc_skip"
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .repartitionByRange(8, col("o_orderkey"))
      .write.format("graft-ipc").mode("overwrite").save(out)
    s.read.format("graft-ipc").load(out)
      .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("o_orderpriority")
  }

  val qIpcSkipSql: String = s"""
    SELECT o_orderpriority, COUNT(*) AS n,
      ${dsumSql("o_totalprice")} AS total_price
    FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim

  /** Sidecar-answered MIN/MAX/COUNT under an oracle: the whole
    * directory's extremes fold from per-file sidecar bounds (column
    * data never opened — EgressSpec asserts the plan), equal to the
    * parquet-side answer bit-for-bit. */
  def qIpcMinMax(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/orders_ipc_minmax"
    Tables(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_orderdate").cast(org.apache.spark.sql.types.DateType).as("odate"))
      .repartition(4, col("o_orderkey"))
      .write.format("graft-ipc").mode("overwrite").save(out)
    s.read.format("graft-ipc").load(out)
      .agg(min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("odate")).as("first_date"),
        max(col("odate")).as("last_date"),
        count(lit(1)).as("n"))
  }

  val qIpcMinMaxSql: String = """
    SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
      CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
      MIN(CAST(o_orderdate AS DATE)) AS first_date,
      MAX(CAST(o_orderdate AS DATE)) AS last_date,
      COUNT(*) AS n
    FROM orders
  """.trim
}
