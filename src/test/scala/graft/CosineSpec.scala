package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{functions => gf}
import graft.ops.Dedup

/** The native CosineSimilarity expression: value parity with the
  * composed higher-order-function form (bit-exact — same fold order),
  * SQL registration, null handling, codegen execution.
  */
class CosineSpec extends SparkSpec {

  test("bit-exact parity with the composed aggregate(zip_with(..)) form") {
    val e = graft.sources.Tables(spark, sfDir, "embeddings").limit(100)
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 3)
        .select(col("embedding").as("b"))))
    val composed = Dedup.dotD(col("a"), col("b")) /
      (sqrt(Dedup.dotD(col("a"), col("a"))) * sqrt(Dedup.dotD(col("b"), col("b"))))
    val diffs = pairs
      .select(gf.cosine_sim(col("a"), col("b")).as("native"), composed.as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact: same fold order
      .count()
    assert(diffs == 0)
  }

  test("registered for SQL via the extensions registry") {
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(got == 0.0)
    val same = spark.sql(
      "SELECT cosine_sim(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))")
      .collect()(0).getDouble(0)
    assert(math.abs(same - 1.0) < 1e-15)
  }

  test("lloydMeans collects O(k) array rows, not O(k*d) scalars") {
    val e = graft.sources.Tables(spark, sfDir, "embeddings")
    val seeds = e.orderBy("vec_id").limit(10).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toSeq).toSeq
    val means = graft.ops.Similarity.lloydMeans(e, seeds)
    val d = e.selectExpr("size(embedding)").first().getInt(0)
    val rows = means.collect()
    // the driver transfer is one row per NON-EMPTY cell (<= k), each
    // carrying the full d-length mean vector — the k*d scalar-row
    // shape would return rows.length == k*d here
    assert(rows.length <= seeds.length,
      s"${rows.length} rows collected for k=${seeds.length} (O(k*d) shape?)")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Double](1).length == d,
        s"mean vector truncated: ${r.getSeq[Double](1).length} != $d")
    }
  }

  test("null array yields null, not an error") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(1.0f), null)),
      StructType(Seq(StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    assert(df.select(gf.cosine_sim(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("runs inside whole-stage codegen (no interpreted fallback)") {
    val e = graft.sources.Tables(spark, sfDir, "embeddings")
    val df = e.select(gf.cosine_sim(col("embedding"), col("embedding")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [cosine_sim"), s"no codegen span:\n$plan")
    assert(df.filter(col("c").isNotNull).count() == 500)
  }

  test("embed_project: 8 dims, matches a driver-side recompute, no shuffle") {
    val df = graft.ops.Similarity.qEmbedProject(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("projected").split(",").length == 8))
    // independent recompute of vec 0 from the raw fixture
    val raw = graft.sources.Tables(spark, sfDir, "embeddings")
      .filter("vec_id = 0").selectExpr("embedding").head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(r: Int, c: Int): Long = {
      val hex = md.digest(s"w:$r:$c".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 3)
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    val expect = (0 until 8).map { r =>
      var acc = 0.0
      for (c <- 0 until 64) acc += w(r, c).toDouble * raw(c)
      math.floor(acc * 10000.0 + 0.5).toLong
    }
    val got = rows.find(_.getLong(0) == 0L).get
      .getAs[String]("projected").split(",").map(_.toLong).toSeq
    assert(got == expect, s"projection mismatch: $got vs $expect")
    // per-row expressions only — the single shuffle is the declared
    // output ORDER BY's range exchange (no aggregation/join exchange)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected hash shuffle:\n$plan")
  }
}
