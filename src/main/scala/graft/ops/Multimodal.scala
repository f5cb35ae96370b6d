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

  /** Perceptual near-duplicate media detection — the aHash/dHash
    * step a multimodal crawl runs AFTER exact dedup: re-encoded or
    * slightly-recompressed assets have different bytes (so
    * [[qMediaDedup]]'s content hash misses them) but nearly identical
    * downsampled grids. The stub decoder exposes the payload's 16
    * high nibbles as a 4x4 grayscale grid (resolution reduction IS
    * the perceptual-hash trick: small re-encodings perturb low bits,
    * the kept high nibble is stable); from it:
    *
    *  - aHash (16 bits): cell > grid mean (mean is /16.0 — a power
    *    of two, so the double is exact and the compare is portable);
    *  - dHash-H (16 bits): circular row gradient, cell > next cell;
    *  - dHash-V (16 bits): circular column gradient, cell > the cell
    *    4 below — the 4x4-grid vertical analogue;
    *  - candidate generation: band b (0..3) takes nibble b of EACH
    *    hash → a 12-bit band value, LSH-style — pairs sharing any
    *    band collide, so any pair within 3 flipped bits of the
    *    combined 48 is GUARANTEED a candidate (pigeonhole: 3 flips
    *    cannot touch all 4 bands), and a random pair collides with
    *    P ≈ 4·2⁻¹² ≈ 0.1% — the band width is what keeps the
    *    candidate count ~N²/1000, not the N²/64 a 4-bit band would
    *    give (a production pipeline over billions of images widens
    *    the grid and the bands further; the structure is the same);
    *  - verify: combined Hamming distance over all 48 bits <= 3.
    *
    * The fixture has no near-dups, so the query seeds them: copies of
    * the first ten blobs with the LOW nibble of payload byte 0
    * incremented (ids +20000) — bytes differ, the decoded grid does
    * not, the re-encoded-asset stand-in. Everything derives from
    * md5(text) hex arithmetic, so DuckDB replays the pipeline
    * bit-for-bit. At 100 TB the shuffle carries (id, 2 ints, band)
    * per blob — never media bytes. */
  def qMediaNearDup(s: SparkSession, dir: String): DataFrame = {
    val hexd = "0123456789abcdef"
    def nib(c: org.apache.spark.sql.Column) = conv(c, 16, 10).cast(IntegerType)
    // both generations come out of ONE projection (explode of a 1- or
    // 2-element array) instead of a self-union — no second scan, and
    // it sidesteps a Catalyst Union constraint-rewrite bug on the
    // pruned `text` attribute (Spark 4.1)
    val ph0 = col("ph0")
    val perturbedPh = concat(substring(ph0, 1, 1),
      lit(hexd).substr(pmod(nib(substring(ph0, 2, 1)) + 1, lit(16)) + 1, lit(1)),
      substring(ph0, 3, 30))
    val orig = struct(col("doc_id").as("media_id"), ph0.as("ph"))
    val fake = struct((col("doc_id") + 20000).as("media_id"),
      perturbedPh.as("ph"))
    val cells = transform(sequence(lit(0), lit(15)),
      i => nib(col("ph").substr(i * 2 + 1, lit(1))))
    def foldBits(bit: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(transform(sequence(lit(0), lit(15)),
        i => when(bit(i), 1).otherwise(0)),
        lit(0), (acc, b) => acc * 2 + b)
    // materialize (media_id, v) ONCE: higher-order functions are not
    // codegen'd, so without a plan barrier CollapseProject inlines the
    // `cells` transform (and the md5 beneath it) into all ~96 lambda
    // references of the three hash folds — a 100x per-row recompute
    // (measured 7 s -> 1.8 s at sf0.1). The 17-value-per-media grid
    // frame is exactly the "decoded perceptual index" a production
    // pipeline persists before banding, so the barrier is the honest
    // 100 TB shape, not a local hack.
    val grid = Tables(s, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("ph0"))
      .select(explode(when(col("doc_id") < 10, array(orig, fake))
        .otherwise(array(orig))).as("r"))
      .select(col("r.media_id").as("media_id"), col("r.ph").as("ph"))
      .select(col("media_id"), cells.as("v"))
      .localCheckpoint(true)
    val hashed = grid
      .withColumn("mean",
        aggregate(col("v"), lit(0), (a, b) => a + b).cast(DoubleType) / 16.0)
      .select(col("media_id"),
        foldBits(i => element_at(col("v"), i + 1) > col("mean")).as("ahash"),
        foldBits(i => element_at(col("v"), i + 1) >
          element_at(col("v"), pmod(i + 1, lit(16)) + 1)).as("dhash"),
        foldBits(i => element_at(col("v"), i + 1) >
          element_at(col("v"), pmod(i + 4, lit(16)) + 1)).as("vhash"))
      // second barrier: both sides of the banded self-join read the
      // 4-int hash table instead of re-running the interpreted folds
      .localCheckpoint(true)
    def nibble(h: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      pmod(floor(h / pow(lit(16.0), b)).cast(IntegerType), lit(16))
    val banded = hashed
      .select(col("media_id"), col("ahash"), col("dhash"), col("vhash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("bv",
        nibble(col("ahash"), col("b")) * 256 +
          nibble(col("dhash"), col("b")) * 16 +
          nibble(col("vhash"), col("b")))
    val x = banded.select(col("b"), col("bv"), col("media_id").as("i"),
      col("ahash").as("ai"), col("dhash").as("di"), col("vhash").as("vi"))
    val y = banded.select(col("b"), col("bv"), col("media_id").as("j"),
      col("ahash").as("aj"), col("dhash").as("dj"), col("vhash").as("vj"))
    val ham = bit_count(col("ai").bitwiseXOR(col("aj"))) +
      bit_count(col("di").bitwiseXOR(col("dj"))) +
      bit_count(col("vi").bitwiseXOR(col("vj")))
    x.join(y, Seq("b", "bv")).where(col("i") < col("j"))
      .select(col("i"), col("j"), col("ai"), col("aj"),
        col("di"), col("dj"), col("vi"), col("vj"))
      .distinct()
      .where(ham <= 3)
      .select(col("i").as("keeper_id"), col("j").as("dup_id"),
        ham.cast(IntegerType).as("hamming"))
      .orderBy("keeper_id", "dup_id")
  }

  val qMediaNearDupSql: String = """
    WITH d0 AS (SELECT doc_id AS media_id, md5(text) AS ph FROM documents),
    pert AS (
      SELECT media_id + 20000 AS media_id,
        substr(ph, 1, 1) ||
        substr('0123456789abcdef',
          ((strpos('0123456789abcdef', substr(ph, 2, 1)) - 1 + 1) % 16) + 1, 1) ||
        substr(ph, 3, 30) AS ph
      FROM d0 WHERE media_id < 10),
    m AS (SELECT * FROM d0 UNION ALL SELECT * FROM pert),
    c AS (
      SELECT media_id,
        list_transform(range(0, 16), i ->
          strpos('0123456789abcdef', substr(ph, CAST(i*2+1 AS INT), 1)) - 1) AS v
      FROM m),
    h AS (SELECT media_id, v,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), v), (a,b) -> a+b) AS DOUBLE) / 16.0 AS mean
      FROM c),
    hh AS (
      SELECT media_id,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 16),
            i -> CASE WHEN v[i+1] > mean THEN 1 ELSE 0 END)),
          (a,b) -> a*2+b) AS INT) AS ahash,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 16),
            i -> CASE WHEN v[i+1] > v[((i+1)%16)+1] THEN 1 ELSE 0 END)),
          (a,b) -> a*2+b) AS INT) AS dhash,
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(0, 16),
            i -> CASE WHEN v[i+1] > v[((i+4)%16)+1] THEN 1 ELSE 0 END)),
          (a,b) -> a*2+b) AS INT) AS vhash
      FROM h),
    bands AS (
      SELECT media_id, ahash, dhash, vhash, b,
        (CAST(FLOOR(ahash / POWER(16, b)) AS INT) % 16) * 256 +
        (CAST(FLOOR(dhash / POWER(16, b)) AS INT) % 16) * 16 +
        (CAST(FLOOR(vhash / POWER(16, b)) AS INT) % 16) AS bv
      FROM hh CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t),
    cand AS (
      SELECT DISTINCT x.media_id AS i, y.media_id AS j,
        x.ahash AS ai, y.ahash AS aj, x.dhash AS di, y.dhash AS dj,
        x.vhash AS vi, y.vhash AS vj
      FROM bands x JOIN bands y
        ON x.b = y.b AND x.bv = y.bv AND x.media_id < y.media_id)
    SELECT i AS keeper_id, j AS dup_id,
      CAST(bit_count(xor(ai, aj)) + bit_count(xor(di, dj)) +
           bit_count(xor(vi, vj)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(ai, aj)) + bit_count(xor(di, dj)) +
          bit_count(xor(vi, vj)) <= 3
    ORDER BY keeper_id, dup_id
  """.trim

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
