package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal column handling for training-data pipelines (builder
  * brief): media as opaque `binary` columns with typed metadata, plus
  * a batched per-partition decode/feature-extract stage.
  *
  * The decode itself is a STUB — image/audio codecs are not in this
  * environment — substituted by a deterministic fake that reads the
  * fixture's synthetic header. Everything around it is the real
  * plumbing a production pipeline needs and what this module tests:
  * the binary+metadata schema, the `mapPartitions` batch shape (the
  * Scala analogue of `mapInPandas`: one iterator per partition, so a
  * codec can amortize model/codec init per partition, not per row),
  * partition preservation, and a declared-schema feature output.
  *
  * Scale posture: media bytes stream through one narrow stage —
  * never shuffled, never collected; features (tiny) are what flows on.
  */
object Multimodal {

  /** Synthetic media corpus derived deterministically from `documents`:
    * a 4-byte magic, 2x2-byte fake dimensions, then md5-derived
    * payload bytes — enough structure for the stub decoder to parse. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      concat(
        lit(Array[Byte]('G', 'R', 'F', 'T')),
        // width = 1 + (n_chars % 640), height = 1 + (n_chars % 480), 2 bytes BE each
        to_binary(lpad(hex((col("n_chars") % 640 + 1).cast(IntegerType)), 4, "0"), lit("hex")),
        to_binary(lpad(hex((col("n_chars") % 480 + 1).cast(IntegerType)), 4, "0"), lit("hex")),
        unhex(md5(col("text")))).as("media"),
      struct(lit("grft").as("format"), col("source").as("origin"))
        .as("meta"))

  /** Input row for the decode stage (typed Dataset boundary). */
  final case class MediaBlob(media_id: Long, media: Array[Byte])

  /** Decoded feature row: what the stub "codec" emits per media blob. */
  final case class MediaFeatures(media_id: Long, width: Int, height: Int,
      n_payload_bytes: Int, mean_byte: Double)

  /** Schema of [[decodeFeatures]] output (the [[MediaFeatures]]
    * encoder's schema: primitives are non-nullable). */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_payload_bytes", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** Batched decode/feature-extract over partitions of media rows —
    * the per-partition stage a real codec would plug into: one
    * iterator per partition, so codec init amortizes per partition,
    * not per row.
    *
    * Runs as TYPED `Dataset.mapPartitions`, not `.rdd`: the stage
    * stays inside the SQL plan (DeserializeToObject → MapPartitions →
    * SerializeFromObject, all codegen'd expression encoders), so
    * there's no RDD boundary, no external-Row boxing, and no
    * driver-side schema re-validation — the plan around it keeps
    * whole-stage codegen and the exchange-free shape. (PySpark's
    * `mapInArrow` is the same stage for Python codecs; its Scala
    * overload takes a PythonUDF column and has no native-lambda form,
    * so the typed-encoder pipeline IS the Scala-native equivalent.)
    *
    * STUB: a real implementation would decode `media` with an image/
    * audio library here. This deterministic fake parses the synthetic
    * header and computes a payload byte statistic, keeping the
    * signature, schema, and batching real. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val session = media.sparkSession
    import session.implicits._
    media.select(col("media_id"), col("media")).as[MediaBlob]
      .mapPartitions { blobs =>
        // per-partition codec init would go here (once per batch)
        blobs.map { m =>
          val bytes = m.media
          // stub decode: magic(4) | width(2, BE hex) | height(2) | payload
          val width = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
          val height = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
          val payload = bytes.drop(8)
          val mean = payload.map(b => (b & 0xff).toDouble).sum / payload.length
          MediaFeatures(m.media_id, width, height, payload.length, mean)
        }
      }
      .toDF()
  }

  /** Frame sampling over a video-like binary column: treat the payload
    * as fixed-size frames and keep every k-th one — pure expression
    * (substring on binary), no UDF, bytes never leave the row. A real
    * container format would swap the fixed stride for header-driven
    * offsets in the same shape. */
  def frameSample(media: org.apache.spark.sql.Column, frameBytes: Int,
      every: Int): org.apache.spark.sql.Column = {
    val payload = substring(media, 9, Int.MaxValue) // skip 8-byte header
    val nFrames = floor(octet_length(payload) / frameBytes).cast("int")
    val sampled = transform(
      sequence(lit(0), ceil(nFrames.cast("double") / every).cast("int") - 1),
      i => substring(payload, i * every * frameBytes + 1, lit(frameBytes)))
    // zero complete frames → empty array (ceil(0/k)-1 = -1 would
    // otherwise need clamping to 0 and emit one truncated frame)
    when(nFrames === 0, typedlit(Array.empty[Array[Byte]])).otherwise(sampled)
  }

  /** Resize stub over the synthetic media format: dimensions divided
    * by k (floored, min 1) in a rebuilt header, payload subsampled to
    * every k-th byte — pure expressions (substring/conv/aggregate over
    * binary), no UDF, bytes never leave the row. A real implementation
    * would swap the byte subsample for a codec-backed scaler in the
    * same column-in/column-out shape. */
  def resizeMedia(media: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    require(k >= 1, "resize factor must be >= 1")
    def dimField(off: Int) =
      conv(hex(substring(media, off, 2)), 16, 10).cast("int")
    val newW = greatest(dimField(5) / k, lit(1)).cast("int")
    val newH = greatest(dimField(7) / k, lit(1)).cast("int")
    val payload = substring(media, 9, Int.MaxValue)
    val nKept = (octet_length(payload) / k).cast("int")
    val kept = when(nKept <= 0, typedlit(Array.empty[Array[Byte]]))
      .otherwise(transform(sequence(lit(0), nKept - 1),
        i => substring(payload, i * k + 1, lit(1))))
    val newPayload = aggregate(kept,
      lit(Array.emptyByteArray), (acc, b) => concat(acc, b))
    concat(
      substring(media, 1, 4),
      to_binary(lpad(hex(newW), 4, "0"), lit("hex")),
      to_binary(lpad(hex(newH), 4, "0"), lit("hex")),
      newPayload)
  }

  /** Oracle-checkable binary surface over the same corpus: blob
    * length, hex round-trip, payload fingerprint. */
  def qBinaryFuncs(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .filter(col("media_id") < 50)
      .select(col("media_id"),
        octet_length(col("media")).as("n_bytes"),
        lower(hex(col("media"))).as("media_hex"),
        col("meta.format").as("format"))
      .orderBy("media_id")

  val qBinaryFuncsSql: String = """
    WITH m AS (
      SELECT doc_id AS media_id,
        'GRFT'::BLOB ||
        from_hex(lpad(hex(CAST(n_chars % 640 + 1 AS INT)), 4, '0')) ||
        from_hex(lpad(hex(CAST(n_chars % 480 + 1 AS INT)), 4, '0')) ||
        from_hex(md5(text)) AS media
      FROM documents)
    SELECT media_id, CAST(octet_length(media) AS INT) AS n_bytes,
      lower(hex(media)) AS media_hex, 'grft' AS format
    FROM m WHERE media_id < 50 ORDER BY media_id
  """.trim

  /** Exact multimodal dedup by content hash — the image-dedup step of
    * a multimodal pipeline: fingerprint the OPAQUE payload bytes
    * (sha-256 of the hex encoding — bijective with the bytes, and
    * DuckDB's sha256 is VARCHAR-only; never decode), group identical
    * blobs, keep the min-media_id copy. The fixture has no binary
    * duplicates, so the query seeds them deterministically: re-keyed
    * copies of the first ten blobs (ids +10000) — a re-crawled-asset
    * stand-in the oracle replays identically. At 100 TB the shuffle
    * carries (digest, id, n_bytes) per blob — never media bytes —
    * the `dedup_exact` shape lifted to binary columns. */
  def qMediaDedup(s: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(s, dir)
    val recrawled = m.filter(col("media_id") < 10)
      .withColumn("media_id", col("media_id") + 10000)
    m.unionByName(recrawled)
      .select(col("media_id"),
        sha2(lower(hex(col("media"))), 256).as("content_sha"),
        octet_length(col("media")).as("n_bytes"))
      .groupBy(col("content_sha"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        max(col("n_bytes")).as("n_bytes"))
      .filter(col("n_copies") >= 2)
      .select(col("keeper_id"), col("n_copies"), col("n_bytes"),
        col("content_sha"))
      .orderBy("keeper_id")
  }

  val qMediaDedupSql: String = """
    WITH m0 AS (
      SELECT doc_id AS media_id,
        'GRFT'::BLOB ||
        from_hex(lpad(hex(CAST(n_chars % 640 + 1 AS INT)), 4, '0')) ||
        from_hex(lpad(hex(CAST(n_chars % 480 + 1 AS INT)), 4, '0')) ||
        from_hex(md5(text)) AS media
      FROM documents),
    m AS (
      SELECT * FROM m0
      UNION ALL
      SELECT media_id + 10000 AS media_id, media FROM m0 WHERE media_id < 10)
    SELECT min(media_id) AS keeper_id, COUNT(*) AS n_copies,
      CAST(max(octet_length(media)) AS INT) AS n_bytes,
      sha256(lower(hex(media))) AS content_sha
    FROM m GROUP BY sha256(lower(hex(media))) HAVING COUNT(*) >= 2
    ORDER BY keeper_id
  """.trim
}
