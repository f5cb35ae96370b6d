package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** Multimodal plumbing: binary+metadata schema, stub decode through
  * the mapPartitions batch stage, determinism, and that media bytes
  * stay out of any shuffle.
  */
class MultimodalSpec extends SparkSpec {

  test("media table has the binary + typed-metadata schema") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.schema("media").dataType == BinaryType)
    assert(m.schema("meta").dataType.isInstanceOf[StructType])
    val first = m.orderBy("media_id").select("media").head().getAs[Array[Byte]](0)
    assert(first.take(4).map(_.toChar).mkString == "GRFT")
    assert(first.length == 4 + 2 + 2 + 16) // magic + dims + md5 payload
  }

  test("stub decode emits declared feature schema with sane values") {
    val f = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
    assert(f.schema == Multimodal.featureSchema)
    val rows = f.collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val (w, h, n, mean) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))
      w >= 1 && w <= 640 && h >= 1 && h <= 480 && n == 16 && mean >= 0 && mean < 256
    })
  }

  test("decode is deterministic and joins back on media_id") {
    val a = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
    val b = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
    assert(a.orderBy("media_id").collect().toSeq == b.orderBy("media_id").collect().toSeq)
    // features join back against source metadata without touching bytes
    val joined = a.join(
      Multimodal.mediaTable(spark, sfDir).select("media_id", "meta"), "media_id")
    assert(joined.count() == 500)
  }

  test("frame sampling keeps every k-th fixed-size block of the payload") {
    val m = Multimodal.mediaTable(spark, sfDir)
    // payload is 16 bytes → 4 frames of 4 bytes; every=2 keeps frames 0,2
    val sampled = m.select(col("media_id"),
      Multimodal.frameSample(col("media"), frameBytes = 4, every = 2).as("frames"))
    val r = sampled.orderBy("media_id").head()
    val frames = r.getSeq[Array[Byte]](1)
    assert(frames.length == 2 && frames.forall(_.length == 4))
    val full = m.orderBy("media_id").head().getAs[Array[Byte]]("media").drop(8)
    assert(frames(0).toSeq == full.slice(0, 4).toSeq)
    assert(frames(1).toSeq == full.slice(8, 12).toSeq)
  }

  test("frame sampling of a payload with zero complete frames is empty") {
    // 16-byte payload, 32-byte frames → 0 complete frames → [] (not one
    // truncated block)
    val m = Multimodal.mediaTable(spark, sfDir).limit(3)
    val sampled = m.select(
      Multimodal.frameSample(col("media"), frameBytes = 32, every = 2).as("frames"))
    assert(sampled.collect().forall(_.getSeq[Array[Byte]](0).isEmpty))
  }

  test("resize halves header dimensions and subsamples the payload") {
    val m = Multimodal.mediaTable(spark, sfDir).limit(5)
    val pairs = m.select(col("media"),
      Multimodal.resizeMedia(col("media"), 2).as("small")).collect()
    for (r <- pairs) {
      val full = r.getAs[Array[Byte]]("media")
      val small = r.getAs[Array[Byte]]("small")
      def dim(b: Array[Byte], off: Int) =
        ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      assert(small.slice(0, 4).toSeq == full.slice(0, 4).toSeq) // magic
      assert(dim(small, 4) == math.max(dim(full, 4) / 2, 1))
      assert(dim(small, 6) == math.max(dim(full, 6) / 2, 1))
      val payload = full.drop(8)
      val expected = payload.indices.collect {
        case i if i % 2 == 0 && i / 2 < payload.length / 2 => payload(i)
      }
      assert(small.drop(8).toSeq == expected.toSeq)
    }
  }

  test("width/height parse matches the header formula") {
    val f = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("n_chars") % 640 + 1).cast("int").as("exp_w"),
        (col("n_chars") % 480 + 1).cast("int").as("exp_h"))
    val bad = f.join(docs, "media_id")
      .filter(col("width") =!= col("exp_w") || col("height") =!= col("exp_h"))
    assert(bad.count() == 0)
  }

  test("media dedup groups the seeded re-crawls under their original keeper") {
    val rows = Multimodal.qMediaDedup(spark, sfDir).collect()
    // exactly the ten seeded duplicates, each a (original, +10000) pair
    // kept under the ORIGINAL id
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("keeper_id")).sorted.toSeq == (0L until 10L))
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
    // digests are distinct across groups (no accidental collisions)
    assert(rows.map(_.getAs[String]("content_sha")).distinct.length == 10)
  }

  test("perceptual near-dup finds every planted re-encoded pair at " +
      "hamming 0, and the join is banded, not all-pairs") {
    val df = Multimodal.qMediaNearDup(spark, sfDir)
    val rows = df.collect()
    // recall: all ten planted (i, i+20000) pairs — the low-nibble
    // perturbation changes bytes but not the decoded 4x4 grid, so
    // their perceptual distance is exactly 0
    val planted = rows.filter(r => r.getAs[Long]("dup_id") >= 20000)
    assert(planted.map(r =>
      (r.getAs[Long]("keeper_id"), r.getAs[Long]("dup_id"))).toSet ==
      (0L until 10L).map(i => (i, i + 20000L)).toSet,
      s"planted near-dups missed: ${planted.mkString(",")}")
    assert(planted.forall(_.getAs[Int]("hamming") == 0))
    // precision at the fixture scale: random 32-bit pairs at
    // hamming <= 3 are ~1e-6 likely, so the planted pairs should
    // dominate the output
    assert(rows.length <= 30, s"near-dup output implausibly large: ${rows.length}")
    // scale shape: banded LSH join, never a cartesian pair blowup
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join:\n$plan")
  }
}
