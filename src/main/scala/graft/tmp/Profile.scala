package graft.tmp
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("32", "32")
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = graft.sources.Tables(spark, dir, "documents")
    println("[prof] docs rows: " + docs.count())
    noop(docs.select(col("doc_id")))
    val sh = graft.ops.Dedup.shingled(docs)
    time("shingled")(noop(sh))
    time("shingled again")(noop(sh))
    val hs = sh.select(col("doc_id"), array_distinct(transform(col("shingles"), x => xxhash64(x))).as("hs"))
    time("hashedShingles")(noop(hs))
    val ex = hs.select(col("doc_id"), explode(col("hs")).as("shingle"))
    time("explode")(noop(ex))
    val minAggs = (0 until 64).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    time("minhash 64 xxhash")(noop(ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)))
    val minAggs2 = (0 until 64).map(i => min(col("shingle") * lit(0x9E3779B97F4A7C15L * (2*i+1)) + lit(i * 0x632BE59BD9B4E019L)).as(s"h$i"))
    time("minhash 64 affine")(noop(ex.groupBy(col("doc_id")).agg(minAggs2.head, minAggs2.tail: _*)))
    time("full dedup_minhash")(noop(graft.ops.Dedup.qDedupMinhash(spark, dir)))
    time("full dedup_ngram")(noop(graft.ops.Dedup.qDedupNgram(spark, dir)))
    time("full dedup_simhash")(noop(graft.ops.Dedup.qDedupSimhash(spark, dir)))
    time("full dedup_embed")(noop(graft.ops.Dedup.qDedupEmbed(spark, dir)))
    time("full knn_ivf")(noop(graft.ops.Similarity.qKnnIvf(spark, dir)))
    spark.stop()
  }
}
