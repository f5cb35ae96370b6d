package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Dedup

/** Native text/vector kernels (TextVectorKernels.scala): each must be
  * VALUE-EQUAL to the composed Spark-expression form it replaced, so
  * swapping them into the dedup/similarity queries cannot move any
  * oracle-checked result. All comparisons run over the real fixture.
  */
class KernelsSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")

  test("shingle_hashes == sorted distinct xxhash64 of the composed shingling") {
    val composed = Dedup.shingled(docs).select(col("doc_id"),
      array_sort(array_distinct(transform(col("shingles"), x => xxhash64(x))))
        .as("expected"))
    val native = docs.select(col("doc_id"),
      graft.functions.shingle_hashes(col("text"), 3).as("got"))
    val diff = composed.join(native, "doc_id")
      .filter(col("expected") =!= col("got"))
    assert(diff.count() == 0)
  }

  test("shingle_hashes tokenization edge cases match split semantics") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "a b c",        // exactly one shingle
      "a b",          // too short -> empty
      "",             // empty text -> empty
      "a  b c",       // double space -> empty token, like split(text,' ')
      "a b c ",       // trailing space -> trailing empty token
      "a b c d e").toDF("text")
    // compare against the composed pipeline per row
    val composed = Dedup.shingled(
      rows.withColumn("doc_id", monotonically_increasing_id()))
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("shingles"), x => xxhash64(x))))
          .as("expected"))
    val native = rows.withColumn("doc_id", monotonically_increasing_id())
      .select(col("doc_id"),
        graft.functions.shingle_hashes(col("text"), 3).as("got"))
    val joined = composed.join(native, "doc_id").collect()
    assert(joined.length == 6)
    joined.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"row $r")
    }
  }

  test("md5_bucket_feats == composed filter/zip_with/md5 feature chain") {
    val raw = split(col("text"), " ")
    val uni = filter(raw, x => x =!= "")
    val big = filter(
      zip_with(slice(raw, lit(1), greatest(size(raw) - 1, lit(0))),
        slice(raw, lit(2), greatest(size(raw) - 1, lit(0))),
        (a, b) => when(a =!= "" && b =!= "", concat(a, lit("_"), b))),
      x => x.isNotNull)
    val composed = docs.select(col("doc_id"),
      transform(concat(uni, big), f =>
        conv(substring(md5(f), 1, 4), 16, 10).cast("int") % 256)
        .as("expected"))
    val native = docs.select(col("doc_id"),
      graft.functions.md5_bucket_feats(col("text"), 256).as("got"))
    val j = composed.join(native, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("expected") =!= col("got")).count() == 0)
    // edge shapes: empties, double spaces, trailing separators
    val sp = spark; import sp.implicits._
    val edges = Seq("", " ", "a", "a b", "a  b", "a b ", " a b c")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val ec = edges.select(col("doc_id"),
      transform(concat(uni, big), f =>
        conv(substring(md5(f), 1, 4), 16, 10).cast("int") % 256)
        .as("expected"))
    val en = edges.select(col("doc_id"),
      graft.functions.md5_bucket_feats(col("text"), 256).as("got"))
    assert(ec.join(en, "doc_id")
      .filter(col("expected") =!= col("got")).count() == 0)
  }

  test("sorted_intersect_count == size(array_intersect) on shingle-hash sets") {
    // every cross pair of real fixture docs (bounded subset), plus
    // edge shapes: empty vs non-empty, identical arrays, disjoint
    val hs = docs.filter(col("doc_id") < 40).select(col("doc_id"),
      graft.functions.shingle_hashes(col("text"), 3).as("hs"))
    val pairs = hs.select(col("doc_id").as("d1"), col("hs").as("a"))
      .crossJoin(hs.select(col("doc_id").as("d2"), col("hs").as("b")))
    val diff = pairs.filter(
      graft.functions.sorted_intersect_count(col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b"))))
    assert(pairs.count() > 100)
    assert(diff.count() == 0)
    val sp = spark; import sp.implicits._
    val edges = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
      .toDF("a", "b")
    val bad = edges.filter(
      graft.functions.sorted_intersect_count(col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b")))).count()
    assert(bad == 0)
  }

  test("minhash_sigs == 64 min(xxhash64(shingle, i)) aggregates") {
    val hs = docs.select(col("doc_id"),
      graft.functions.shingle_hashes(col("text"), 3).as("hs"))
    val ex = hs.select(col("doc_id"), explode(col("hs")).as("shingle"))
    val minAggs = (0 until 64).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    val expected = ex.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col(s"h$i")): _*).as("expected"))
    val native = hs.filter(size(col("hs")) > 0).select(col("doc_id"),
      graft.functions.minhash_sigs(col("hs"), 64).as("got"))
    val j = expected.join(native, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("expected") =!= col("got")).count() == 0)
  }

  test("simhash64 == summed bit votes with >=0 tie semantics") {
    val hs = docs.select(col("doc_id"),
      graft.functions.shingle_hashes(col("text"), 3).as("hs"))
    val ex = hs.select(col("doc_id"), explode(col("hs")).as("h"))
    val sums = (0 until 64).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"s$j"))
    val expected = ex.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).foldLeft(lit(0L)) { (acc, j) =>
          acc.bitwiseOR(shiftleft(
            when(col(s"s$j") >= 0, lit(1L)).otherwise(lit(0L)), j))
        }.as("expected"))
    val native = hs.filter(size(col("hs")) > 0).select(col("doc_id"),
      graft.functions.simhash64(col("hs")).as("got"))
    val j = expected.join(native, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("expected") =!= col("got")).count() == 0)
  }

  test("minhash_sigs and simhash64 of an empty set are null") {
    val sp = spark; import sp.implicits._
    val empty = Seq(Seq.empty[Long]).toDF("hs")
    val r = empty.select(
      graft.functions.minhash_sigs(col("hs"), 8).as("mh"),
      graft.functions.simhash64(col("hs")).as("sh")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("vector_dots == composed zip_with/aggregate fold, bit-for-bit") {
    val e = graft.sources.Tables(spark, sfDir, "embeddings").limit(100)
    val pl = typedlit(Dedup.hyperplanes)
    val expected = e.select(col("vec_id"),
      transform(pl, p => Dedup.dotD(p, col("embedding"))).as("expected"))
    val native = e.select(col("vec_id"),
      graft.functions.vector_dots(pl, col("embedding")).as("got"))
    // exact equality expected: both are strict left-to-right double folds
    val j = expected.join(native, "vec_id")
    assert(j.filter(col("expected") =!= col("got")).count() == 0)
  }

  test("md5_shingles64 == composed split/slice/md5/conv form, bit-for-bit") {
    import org.apache.spark.sql.types.LongType
    def h64(sh: Column): Column = {
      val hex = md5(sh)
      shiftleft(conv(substring(hex, 1, 8), 16, 10).cast(LongType), 32)
        .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast(LongType))
    }
    val w = split(col("text"), " ")
    val expected = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_sort(array_distinct(
        transform(transform(sequence(lit(1), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i, lit(3)))), h64(_))))
        .as("expected"))
    val native = docs.select(col("doc_id"),
      graft.functions.md5_shingles64(col("text"), 3).as("got"))
      .filter(size(col("got")) > 0)
    val j = expected.join(native, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("expected") =!= col("got")).count() == 0,
      "kernel md5-shingle hashes must equal the composed expression form")
  }

  test("md5_shingles_pos64 == composed positional form, bit-for-bit; sort+distinct recovers md5_shingles64") {
    import org.apache.spark.sql.types.LongType
    def h64(sh: Column): Column = {
      val hex = md5(sh)
      shiftleft(conv(substring(hex, 1, 8), 16, 10).cast(LongType), 32)
        .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast(LongType))
    }
    val w = split(col("text"), " ")
    val expected = docs
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        transform(transform(sequence(lit(1), size(col("w")) - 4),
          i => concat_ws(" ", slice(col("w"), i, lit(5)))), h64(_))
          .as("expected"))
    val native = docs.select(col("doc_id"),
      graft.functions.md5_shingles_pos64(col("text"), 5).as("got"))
      .filter(size(col("got")) > 0)
    val j = expected.join(native, "doc_id")
    assert(j.count() > 0)
    assert(j.filter(col("expected") =!= col("got")).count() == 0,
      "positional kernel hashes must equal the composed form IN ORDER")
    // and the sorted-distinct view must be exactly the set kernel
    val viaPos = docs.select(col("doc_id"), array_sort(array_distinct(
      graft.functions.md5_shingles_pos64(col("text"), 5))).as("a"))
    val direct = docs.select(col("doc_id"),
      graft.functions.md5_shingles64(col("text"), 5).as("b"))
    assert(viaPos.join(direct, "doc_id")
      .filter(col("a") =!= col("b")).count() == 0)
  }

  test("vector_dots_bcast == vector_dots at k=10,000; plan size independent of k") {
    val e = graft.sources.Tables(spark, sfDir, "embeddings").limit(20)
    val dim = e.select(size(col("embedding"))).head.getInt(0)
    // k=10,000 planes — far past where a typedlit literal is sane
    val planes: Seq[Seq[Double]] = (0 until 10000).map(i =>
      (0 until dim).map(j => math.sin(i * 31 + j).toDouble))
    val bc = spark.sparkContext.broadcast(planes.map(_.toArray).toArray)
    val got = e.select(col("vec_id"),
      graft.functions.vector_dots_bcast(bc, col("embedding")).as("d")).collect()
    // literal path only over the first 50 planes (keep the plan sane),
    // bit-compared against the same slice of the broadcast result
    val lit50 = e.select(col("vec_id"),
      graft.functions.vector_dots(typedlit(planes.take(50)),
        col("embedding")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got.foreach { r =>
      val full = r.getSeq[Double](1)
      assert(full.length == 10000)
      assert(full.take(50) == lit50(r.getLong(0)),
        "broadcast and literal kernels must be bit-equal")
    }
    // the plan must NOT embed the matrix: its string stays tiny
    val plan = e.select(graft.functions.vector_dots_bcast(bc,
      col("embedding"))).queryExecution.optimizedPlan.toString
    assert(plan.length < 10000, s"plan grew with k: ${plan.length} chars")
    bc.destroy()
  }

  test("vector_dots_by_key routes each row to its own cell's matrix") {
    val sp = spark; import sp.implicits._
    val mats = new java.util.HashMap[java.lang.Long, Array[Array[Double]]]
    mats.put(1L, Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    mats.put(2L, Array(Array(2.0, 2.0)))
    val bc = sp.sparkContext.broadcast(mats)
    val rows = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(3.0, 4.0)),
      (9L, Seq(1.0, 1.0))).toDF("cell", "vec")
    val got = rows.select(col("cell"),
      graft.functions.vector_dots_by_key(bc, col("cell"), col("vec")).as("d"))
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1)))
      .toMap
    assert(got(1L) == Seq(3.0, 4.0))
    assert(got(2L) == Seq(14.0))
    assert(got(9L) == null, "unknown key must be null, not a wrong answer")
    bc.destroy()
  }

  test("kernels survive whole-stage codegen (plan contains no fallback eval)") {
    val q = docs.select(
      graft.functions.minhash_sigs(
        graft.functions.shingle_hashes(col("text"), 3), 16).as("mh"),
      graft.functions.normalize_text(col("text")).as("norm"))
    // evaluating forces codegen compilation; a Janino failure would
    // fall back and log — correctness here is the compile not throwing
    assert(q.filter(col("mh").isNotNull && col("norm").isNotNull).count() > 0)
    // and the generated Java really contains the static kernel calls
    // (i.e. the expressions sit INSIDE the codegen span, they didn't
    // fall out to interpreted eval)
    import org.apache.spark.sql.execution.debug._
    val gen = q.queryExecution.debug.codegenToSeq().map(_._2).mkString
    assert(gen.contains("TextNorm.normalize"),
      "normalize_text not in generated code")
  }

  test("normalize_text folds precomposed AND decomposed forms to the same bytes") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "  Cr\u00e8me  BR\u00dbL\u00c9E  ",          // precomposed accents + case + runs
      " Cre\u0300me  BRU\u0302LE\u0301E ",        // the same string, decomposed
      "plain ascii stays",
      "tabs\tand\nnewlines collapse",
      "").toDF("text")
    val got = rows.select(graft.functions.normalize_text(col("text")))
      .collect().map(_.getString(0))
    assert(got(0) == "creme brulee")
    assert(got(1) == got(0), "NFD must unify precomposed and decomposed input")
    assert(got(2) == "plain ascii stays")
    assert(got(3) == "tabs and newlines collapse")
    assert(got(4) == "")
    // interpreted eval path (constant folding) agrees with codegen
    val folded = rows.sparkSession.range(1)
      .select(graft.functions.normalize_text(lit("  Cr\u00e8me  BR\u00dbL\u00c9E  ")))
      .head().getString(0)
    assert(folded == "creme brulee")
  }

  test("text_segments == composed split/slice chunking over the fixture") {
    val L = 10
    val w = split(col("text"), " ")
    val nSegs = ceil(size(w).cast(DoubleType) / L).cast(LongType)
    val composed = docs.select(col("doc_id"),
      transform(sequence(lit(0L), nSegs - 1),
        i => concat_ws(" ",
          slice(w, (i * L + 1).cast(IntegerType), lit(L)))).as("expected"))
    val native = docs.select(col("doc_id"),
      graft.functions.text_segments(col("text"), L).as("got"))
    val diff = composed.join(native, "doc_id")
      .filter(col("expected") =!= col("got"))
    assert(diff.count() == 0)
  }

  test("text_segments edge cases match split-on-single-space semantics") {
    val sp = spark; import sp.implicits._
    val rows = Seq(
      "",                       // split("", " ") = [""] -> one empty segment
      "a",                      // single short doc -> one short segment
      "a b c",                  // < L tokens -> one segment, whole doc
      "a b c d e f",            // exact multiple of L
      "a b c d e f g",          // one full + one short segment
      "a  b c d e f g h"        // double space -> empty token kept
    ).toDF("text")
    val got = rows
      .select(graft.functions.text_segments(col("text"), 3).as("segs"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq(""))
    assert(got(1) == Seq("a"))
    assert(got(2) == Seq("a b c"))
    assert(got(3) == Seq("a b c", "d e f"))
    assert(got(4) == Seq("a b c", "d e f", "g"))
    assert(got(5) == Seq("a  b", "c d e", "f g h"))
  }

  test("token_profile == composed split/filter HOF form, on the fixture " +
      "and adversarial literals") {
    val sp = spark; import sp.implicits._
    val stops = "the a of and to"
    val stopArr = stops.split(" ").toSeq
    def composed(t: Column) = {
      val w = split(t, " ")
      struct(
        size(w).as("n_tok"),
        size(filter(w, x => x.isInCollection(stopArr))).as("n_stop"),
        size(filter(array(stopArr.map(lit): _*),
          sw => array_contains(w, sw))).as("n_stop_distinct"),
        size(filter(w, x => x.rlike("[a-z]"))).as("n_alpha"),
        size(filter(w, x => x.contains("#") || x.contains("...")))
          .as("n_sym"))
    }
    val adversarial = Seq(
      "", " ", "  ", "the", "the the the", " the ", "a# b.. c... d....",
      "#", "...", "..", "x...y", "THE A", "толстой 世界 the",
      "to to of of and", "tail space ", " lead").toDF("text")
    for (df <- Seq(docs.select(col("text")), adversarial)) {
      val diff = df
        .select(composed(col("text")).as("expected"),
          graft.functions.token_profile(col("text"), stops).as("got"),
          col("text"))
        .filter(col("expected") =!= col("got"))
        .collect()
      assert(diff.isEmpty, diff.take(3).map(r =>
        s"'${r.get(2)}': expected=${r.get(0)} got=${r.get(1)}").mkString("; "))
    }
    // null text -> null struct
    val n = Seq[String](null).toDF("text")
      .select(graft.functions.token_profile(col("text"), stops))
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("md5_margin == composed distinct-unigram+bigram md5-weight aggregate") {
    val sp = spark; import sp.implicits._
    def composed(t: Column) = {
      val w = split(t, " ")
      val n = size(w)
      val bigrams = slice(
        zip_with(w, slice(w, lit(2), greatest(n - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b)),
        lit(1), greatest(n - 1, lit(0)))
      val feats = concat(array_distinct(w), array_distinct(bigrams))
      def weight(f: Column): Column =
        conv(substring(md5(f.cast(BinaryType)), 1, 3), 16, 10)
          .cast(LongType) % 2001 - 1000
      aggregate(feats, lit(0L), (acc, f) => acc + weight(f))
    }
    val adversarial = Seq(
      "", " ", "a", "a a a", "a b a b", " x ", "толстой 世界 mix",
      "the quick brown fox the quick").toDF("text")
    for (df <- Seq(docs.select(col("text")), adversarial)) {
      val diff = df.select(composed(col("text")).as("expected"),
          graft.functions.md5_margin(col("text")).as("got"), col("text"))
        .filter(col("expected") =!= col("got")).collect()
      assert(diff.isEmpty, diff.take(3).map(r =>
        s"'${r.get(2)}': expected=${r.get(0)} got=${r.get(1)}").mkString("; "))
    }
  }

  test("cdc_chunks == composed explode/union/window/groupBy CDC pipeline") {
    import org.apache.spark.sql.expressions.Window
    // the r14-era composed form, verbatim (the shape the fused kernel
    // replaced in Dedup.cdcChunks)
    def composed(docs: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val w = split(col("text"), " ")
      val words = docs.select(col("doc_id"), posexplode(w))
        .select(col("doc_id"), col("pos").cast(LongType).as("wpos"),
          col("col").as("word"), lit(0).as("is_cut"))
      val cuts = docs.select(col("doc_id"),
          posexplode(graft.functions.md5_shingles_pos64(col("text"), 4)))
        .filter(pmod(col("col"), lit(8)) === 0)
        .select(col("doc_id"), (col("pos") + 4).cast(LongType).as("wpos"),
          lit(null).cast(StringType).as("word"), lit(1).as("is_cut"))
      val byDoc = Window.partitionBy("doc_id")
        .orderBy(col("wpos").asc, col("is_cut").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      words.unionAll(cuts)
        .withColumn("chunk_id", sum(col("is_cut")).over(byDoc))
        .filter(col("is_cut") === 0)
        .groupBy(col("doc_id"), col("chunk_id"))
        .agg(md5(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("wpos"), col("word")))),
            s => s.getField("word")))).as("digest"),
          count(lit(1)).as("n_words"))
    }
    val sp = spark; import sp.implicits._
    val adversarial = Seq(
      (1000L, ""), (1001L, "a"), (1002L, "a  b c "),
      (1003L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (1004L, Seq.fill(40)("x").mkString(" "))).toDF("doc_id", "text")
    for (d <- Seq(docs.select(col("doc_id"), col("text")), adversarial)) {
      val exp = composed(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val got = Dedup.cdcChunks(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(exp == got,
        s"cdc mismatch: onlyExpected=${(exp -- got).take(3)} " +
          s"onlyGot=${(got -- exp).take(3)}")
    }
  }
}
