package graft

import org.apache.spark.sql.functions.lit

import graft.{functions => gf}

/** Property tests for the arithmetic facade: the algebraic invariants
  * that must hold for EVERY input, not just the fixture's values —
  * driven by a seeded generator over one batched Spark projection per
  * invariant (so what's tested is engine semantics, and the whole
  * sample set evaluates in a single job).
  */
class PropertySpec extends SparkSpec {

  private lazy val sp = spark

  private val rnd = new scala.util.Random(42)

  test("division algorithm: a == div(a,b)*b + mod(a,b), |mod| < |b|, mod keeps sign") {
    val cases = Seq.fill(200) {
      val a = rnd.nextLong() % 1000000L
      var b = rnd.nextLong() % 10000L
      if (b == 0) b = 7L
      (a, b)
    }
    import sp.implicits._
    val got = cases.toDF("a", "b")
      .select($"a", $"b", gf.div($"a", $"b").as("d"), gf.mod($"a", $"b").as("m"))
      .collect()
    for (r <- got) {
      val (a, b, d, m) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d * b + m == a, s"a=$a b=$b")
      assert(math.abs(m) < math.abs(b), s"a=$a b=$b")
      assert(m == 0 || (m < 0) == (a < 0), s"a=$a b=$b")
    }
  }

  test("truncate moves toward zero, within one unit of the last kept digit") {
    val cases = Seq.fill(100)((rnd.nextDouble() * 2e6 - 1e6, rnd.nextInt(5)))
    import sp.implicits._
    val got = cases.toDF("x", "s")
      .select($"x", $"s", gf.truncate($"x", 2).as("t2"))
      .collect()
    for (r <- got) {
      val (x, t2) = (r.getDouble(0), r.getDouble(2))
      assert(math.abs(t2) <= math.abs(x) + 1e-9, s"x=$x")
      assert(math.abs(t2 - x) < 0.01 + 1e-9, s"x=$x")
    }
  }

  test("shingle_hashes kernel == composed form on arbitrary generated text") {
    // random word counts/lengths, multi-byte chars, runs of spaces,
    // leading/trailing spaces — the kernel must equal the composed
    // split/zip_with/xxhash64 pipeline on every one
    val alphabet = "abcdeéλ語🙂"
    def word() = Seq.fill(1 + rnd.nextInt(4))(
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = Seq.fill(150) {
      val n = rnd.nextInt(8)
      val sep = () => " " * (1 + rnd.nextInt(3))
      val lead = if (rnd.nextBoolean()) " " else ""
      lead + Seq.fill(n)(word()).mkString(sep()) +
        (if (rnd.nextBoolean()) " " else "")
    }
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val df = cases.zipWithIndex.toDF("text", "doc_id")
    val composed = graft.ops.Dedup.shingled(df).select(col("doc_id"),
      array_sort(array_distinct(transform(col("shingles"), x => xxhash64(x))))
        .as("expected"))
    val native = df.select(col("doc_id"),
      gf.shingle_hashes(col("text"), 3).as("got"))
    val bad = composed.join(native, "doc_id")
      .filter(col("expected") =!= col("got"))
    assert(bad.count() == 0)
  }

  test("concat null-as-empty never yields null; concatOperator is strict") {
    val vals: Seq[(String, String)] = Seq(
      ("a", "b"), (null, "b"), ("a", null), (null, null), ("", "x"))
    import sp.implicits._
    val got = vals.toDF("a", "b")
      .select($"a", $"b", gf.concat($"a", $"b").as("soft"),
        gf.concatOperator($"a", $"b").as("strict"))
      .collect()
    for (r <- got) {
      val (a, b) = (Option(r.getString(0)), Option(r.getString(1)))
      assert(r.getString(2) == a.getOrElse("") + b.getOrElse(""))
      if (a.isEmpty || b.isEmpty) assert(r.isNullAt(3))
      else assert(r.getString(3) == a.get + b.get)
    }
  }

  test("TopKPerGroup == window idiom on generated data (skew, ties, tiny groups)") {
    // heavy-tailed group sizes, duplicate order values (ties), groups
    // smaller than k — the custom operator must agree with row_number
    // for every draw
    import sp.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rows = Seq.fill(3000) {
      val g = if (rnd.nextInt(10) < 7) rnd.nextInt(3) else 3 + rnd.nextInt(40)
      (g, rnd.nextInt(50).toLong, rnd.nextLong())
    }
    for (k <- Seq(1, 4, 17)) {
      // repartition(7): group rows scattered across partitions so the
      // partial phase genuinely merges in the final phase
      val df = rows.toDF("g", "v", "tie").repartition(7)
      val custom = graft.plans.TopKPerGroup(
        df, Seq("g"), Seq("v" -> false, "tie" -> true), k)
      val window = df.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"tie".asc)))
        .filter($"rn" <= k).drop("rn")
      assert(custom.count() == window.count(), s"k=$k count")
      assert(custom.exceptAll(window).isEmpty && window.exceptAll(custom).isEmpty,
        s"k=$k contents differ")
    }
  }

  test("chunk geometry: every char covered, last chunk reaches the end") {
    // the integer ceil-div formula behind qDocChunk, checked for every
    // text length the fixture could ever present
    val (len0, stride) = (graft.ops.TextAnalysis.chunkLen,
      graft.ops.TextAnalysis.chunkStride)
    for (n <- 1 to 5000) {
      val k = (math.max(n - (len0 - stride), 1) + stride - 1) / stride
      assert((k - 1) * stride < n, s"len=$n: last chunk starts past the end")
      assert((k - 1) * stride + len0 >= n, s"len=$n: tail uncovered")
      // non-last chunks are always full-length (adjacent overlap = 20)
      if (k > 1) assert((k - 2) * stride + len0 <= n + stride,
        s"len=$n: penultimate chunk over-truncated")
      // one chunk fewer would leave a gap
      if (k > 1) assert((k - 2) * stride + len0 < n, s"len=$n: k not minimal")
    }
  }
}
