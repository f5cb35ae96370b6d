package graft

import org.apache.spark.sql.functions._

/** Pins the SCALE.md replication methodology — the properties that
  * make the scale-up measurement honest rather than an artifact of the
  * copy process (naive duplication would give every doc `mult` exact
  * twins and quadratic LSH candidates):
  *  - fact volume multiplies, dims stay fixed;
  *  - every FK chain survives the key offsets (no orphan lineitems);
  *  - replicas are LEXICALLY DISJOINT (the letter bijection leaves no
  *    cross-replica text collisions) while within-replica structure is
  *    preserved (bijections preserve text-equality classes);
  *  - embedding isometries preserve norms (cosine geometry intact
  *    within a replica).
  */
class ScaleBenchSpec extends SparkSpec {

  test("scaled replicas: volumes, FK chains, lexical disjointness, isometry") {
    val out = graft.ops.Egress.outRoot(sfDir) + "/scale_methodology"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val mult = 3
    ScaleBench.buildScaled(spark, sfDir, out, mult)

    def base(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def scaled(t: String) = spark.read.parquet(s"$out/$t.parquet")

    // facts multiply, dims don't
    for (t <- Seq("lineitem", "orders", "events", "documents", "embeddings"))
      assert(scaled(t).count() == mult * base(t).count(), s"$t volume")
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      assert(scaled(t).count() == base(t).count(), s"$t dim grew")

    // FK: every scaled lineitem still finds its order
    val orphans = scaled("lineitem").select(col("l_orderkey").as("k"))
      .join(scaled("orders").select(col("o_orderkey").as("k")),
        Seq("k"), "left_anti").count()
    assert(orphans == 0, s"$orphans orphan lineitems after key offsets")

    // lexical disjointness + structure preservation: a bijection maps
    // equal texts to equal texts and distinct to distinct, and the
    // rotations differ per replica — so the scaled corpus has exactly
    // mult × the base's distinct texts
    val baseDistinct = base("documents").select("text").distinct().count()
    val scaledDistinct = scaled("documents").select("text").distinct().count()
    assert(scaledDistinct == mult * baseDistinct,
      s"cross-replica text collision or broken bijection: " +
        s"$scaledDistinct vs ${mult}x$baseDistinct")
    // bijectivity also preserves lengths (n_chars metadata stays true)
    assert(scaled("documents")
      .filter(length(col("text")) =!= col("n_chars")).count() == 0)

    // isometry: every replica vector has its source's norm (shift and
    // sign flips permute/negate terms, so the double SUM re-associates
    // — compare with a float-scale tolerance)
    val vecStride = base("embeddings").agg(max("vec_id")).head.getLong(0) + 1
    val norms = (df: org.apache.spark.sql.DataFrame) => df.select(
      (col("vec_id") % vecStride).as("src_id"),
      aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double")).as("sq"))
    val drift = norms(scaled("embeddings"))
      .join(norms(base("embeddings")).withColumnRenamed("sq", "base_sq")
        .withColumnRenamed("src_id", "b_id"),
        col("src_id") === col("b_id"))
      .filter(abs(col("sq") - col("base_sq")) > 1e-3).count()
    assert(drift == 0, s"$drift vectors changed norm under the isometry")
  }
}
