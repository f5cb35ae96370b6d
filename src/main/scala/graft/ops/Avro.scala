package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.sources.Tables

/** Avro container-file source/sink over the Avro core + mapred jars
  * Spark ships (the spark-avro CONNECTOR is deliberately not a
  * dependency — this is the engine's own row-format ingestion path,
  * the same role `graft.ops.Ipc` plays for the Arrow format).
  *
  * Reference context: the reference's ingestion surface is
  * format-per-module (CSV `cpp/src/arrow/csv/`, JSON
  * `cpp/src/arrow/json/`, ORC `adapters/orc/`, Feather `ipc/`); Avro
  * is the ubiquitous ROW-major container a Kafka/log-shipping
  * pipeline hands a 100 TB ingest, so the engine treats it exactly
  * like the others: distributed one-file-per-partition write,
  * one-partition-per-file planned read, schema from a single-file
  * header probe (the `SourceFactory::Inspect` discovery step,
  * `cpp/src/arrow/dataset/discovery.h:55`).
  *
  * Same execution contract as [[Ipc]]:
  *  - all I/O through the Hadoop FileSystem API (works on any Hadoop
  *    FS, executors need not share the driver's disk);
  *  - task-commit protocol — attempt-unique temp file, exists-guarded
  *    rename, losers delete their temp;
  *  - type subset = the engine's nine-type wire convention:
  *    bigint/int/float/double/string/boolean/binary/date/timestamp,
  *    nullable as `union(null, T)`, date as `int`+`date` logical
  *    type, timestamp as `long`+`timestamp-micros` (Avro spec's
  *    standard logical annotations, which is what makes these files
  *    readable by any Avro consumer, not just this engine).
  */
object Avro {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // ---- schema mapping ----

  private[graft] def toAvroSchema(schema: StructType): ASchema = {
    val fields = SchemaBuilder.record("graft_row").namespace("graft").fields()
    schema.foldLeft(fields) { (fb, f) =>
      val base = f.dataType match {
        case LongType    => ASchema.create(ASchema.Type.LONG)
        case IntegerType => ASchema.create(ASchema.Type.INT)
        case DoubleType  => ASchema.create(ASchema.Type.DOUBLE)
        case FloatType   => ASchema.create(ASchema.Type.FLOAT)
        case StringType  => ASchema.create(ASchema.Type.STRING)
        case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
        case BinaryType  => ASchema.create(ASchema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
        case TimestampType => LogicalTypes.timestampMicros()
          .addToSchema(ASchema.create(ASchema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"graft-avro: unsupported type $other for column ${f.name}")
      }
      fb.name(f.name).`type`(
        ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base))
        .withDefault(null)
    }.endRecord()
  }

  private[graft] def toSparkType(s: ASchema): DataType = {
    // unwrap the union(null, T) convention
    val inner =
      if (s.getType == ASchema.Type.UNION)
        s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get
      else s
    (inner.getType, Option(inner.getLogicalType).map(_.getName)) match {
      case (ASchema.Type.INT, Some("date"))               => DateType
      case (ASchema.Type.LONG, Some("timestamp-micros"))  => TimestampType
      case (ASchema.Type.LONG, _)    => LongType
      case (ASchema.Type.INT, _)     => IntegerType
      case (ASchema.Type.DOUBLE, _)  => DoubleType
      case (ASchema.Type.FLOAT, _)   => FloatType
      case (ASchema.Type.STRING, _)  => StringType
      case (ASchema.Type.BOOLEAN, _) => BooleanType
      case (ASchema.Type.BYTES, _)   => BinaryType
      case (tpe, _) => throw new IllegalArgumentException(
        s"graft-avro: unsupported avro type $tpe")
    }
  }

  // ---- value mapping (micros convention matches Ipc's) ----

  private def toAvroValue(row: Row, c: Int, dt: DataType): AnyRef = dt match {
    case DateType =>
      Int.box(row.getDate(c).toLocalDate.toEpochDay.toInt)
    case TimestampType =>
      val ts = row.getTimestamp(c)
      Long.box(math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
    case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](c))
    case _          => row.get(c).asInstanceOf[AnyRef]
  }

  private def fromAvroValue(v: AnyRef, dt: DataType): Any = dt match {
    case _ if v == null => null
    case DateType =>
      java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
    case TimestampType =>
      val us = v.asInstanceOf[Long]
      val ts = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      ts
    case StringType => v.toString // Utf8 -> String
    case BinaryType =>
      val bb = v.asInstanceOf[java.nio.ByteBuffer]
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case _ => v
  }

  // ---- sink ----

  /** Distributed Avro write: one container file per partition,
    * snappy-less null codec (codec jars are environment-dependent;
    * the container format is the contract), task-commit rename. */
  def writeAvro(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString // Schema isn't Serializable
    val confSer = new SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(confSer.value)
    fs.mkdirs(dirPath)
    for (pat <- Seq("*.avro", ".*.avro.tmp");
         st <- Option(fs.globStatus(new HPath(dirPath, pat))).getOrElse(Array()))
      fs.delete(st.getPath, false)
    df.rdd.foreachPartition { rows =>
      val tc = TaskContext.get()
      val avroSchema = new ASchema.Parser().parse(avroJson)
      val taskFs = new HPath(dir).getFileSystem(confSer.value)
      val finalPath = new HPath(dir, s"part-${tc.partitionId()}.avro")
      val tmpPath = new HPath(dir,
        s".part-${tc.partitionId()}-a${tc.taskAttemptId()}.avro.tmp")
      val out = taskFs.create(tmpPath, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      for (row <- rows) {
        val rec = new GenericData.Record(avroSchema)
        var c = 0
        while (c < schema.length) {
          rec.put(c, if (row.isNullAt(c)) null
            else toAvroValue(row, c, schema(c).dataType))
          c += 1
        }
        writer.append(rec)
      }
      writer.close() // closes the underlying stream
      // same atomic first-publish-wins commit as Ipc.writeIpc
      if (!graft.sources.CasFs.publish(taskFs, tmpPath, finalPath))
        taskFs.delete(tmpPath, false)
    }
  }

  // ---- source ----

  /** Distributed Avro read: header probe on one file for the schema,
    * then one scan partition per container file. */
  def readAvro(s: SparkSession, dir: String): DataFrame = {
    val confSer = new SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(confSer.value)
    val files = Option(fs.globStatus(new HPath(dirPath, "*.avro")))
      .getOrElse(Array()).toSeq.map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files in $dir")
    val (sparkSchema, avroJson) = {
      val in = new FsInput(new HPath(files.head), confSer.value)
      val rd = new DataFileReader[GenericRecord](
        in, new GenericDatumReader[GenericRecord]())
      val aSchema = rd.getSchema
      val st = StructType(aSchema.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = true)))
      rd.close()
      (st, aSchema.toString)
    }
    val nCols = sparkSchema.length
    val types = sparkSchema.fields.map(_.dataType)
    val rowRdd = s.sparkContext
      .parallelize(files, files.size)
      .flatMap { path =>
        val taskFs = new FsInput(new HPath(path), confSer.value)
        val rd = new DataFileReader[GenericRecord](
          taskFs, new GenericDatumReader[GenericRecord](
            new ASchema.Parser().parse(avroJson)))
        // close on task END (success or failure), and stream rows
        // lazily — peak task memory is one record, never the file
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try rd.close() catch { case _: Throwable => () }))
        new Iterator[Row] {
          override def hasNext: Boolean = rd.hasNext
          override def next(): Row = {
            val rec = rd.next()
            val vals = new Array[Any](nCols)
            var c = 0
            while (c < nCols) {
              vals(c) =
                fromAvroValue(rec.get(c).asInstanceOf[AnyRef], types(c))
              c += 1
            }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    s.createDataFrame(rowRdd, sparkSchema)
  }

  // ---- in-memory byte codec (spec surface, same mapping as the
  //      file paths — lets the property fuzz run without Spark jobs) ----

  private[graft] def writeAvroBytes(rows: Seq[Row],
      schema: StructType): Array[Byte] = {
    val avroSchema = toAvroSchema(schema)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.create(avroSchema, bos)
    for (row <- rows) {
      val rec = new GenericData.Record(avroSchema)
      var c = 0
      while (c < schema.length) {
        rec.put(c, if (row.isNullAt(c)) null
          else toAvroValue(row, c, schema(c).dataType))
        c += 1
      }
      writer.append(rec)
    }
    writer.close()
    bos.toByteArray
  }

  private[graft] def readAvroBytes(bytes: Array[Byte]): (Seq[Row], StructType) = {
    val rd = DataFileReader.openReader(
      new org.apache.avro.file.SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord]())
    val aSchema = rd.getSchema
    val st = StructType(aSchema.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), toSparkType(f.schema()), nullable = true)))
    val types = st.fields.map(_.dataType)
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (rd.hasNext) {
      val rec = rd.next()
      out += Row.fromSeq(types.indices.map(c =>
        fromAvroValue(rec.get(c).asInstanceOf[AnyRef], types(c))))
    }
    rd.close()
    (out.toSeq, st)
  }

  // ---- declared query ----

  /** Avro write + read-back round-trip over the orders projection,
    * aggregated per priority; the oracle reads the original parquet,
    * so a green hash proves the Avro pipe is lossless (doubles exact,
    * dates via the int-epoch-day logical type). */
  def qAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = Egress.outRoot(dir) + "/orders_avro"
    writeAvro(t(s, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate").cast(DateType).as("o_orderdate"),
      col("o_orderpriority")), out)
    readAvro(s, out)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderpriority")
  }

  val qAvroRoundtripSql: String = """
    SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      MIN(CAST(o_orderdate AS DATE)) AS first_date,
      MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """.trim
}
