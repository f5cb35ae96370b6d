package graft

import org.apache.spark.sql.Row

import graft.ops.Tensors

/** Tensor / sparse COO / dictionary-encode tier (ops/Tensors.scala).
  * The oracle rows check Spark-vs-DuckDB parity; these asserts check
  * the tensor ALGEBRA itself against independently computed values. */
class TensorsSpec extends SparkSpec {

  test("tensor_funcs: transpose and Gram agree with a driver-side recompute") {
    val rows = Tensors.qTensorFuncs(spark, sfDir).collect()
    assert(rows.length == 50)
    // recompute row 0 from the raw fixture
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter("vec_id = 0").selectExpr("embedding").head()
      .getSeq[Float](0).take(8).map(_.toDouble).toArray
    def fx(x: Double): Long = math.floor(x * 10000.0 + 0.5).toLong
    val r0 = rows.find(_.getLong(0) == 0L).get
    val transposed = (0 until 4).flatMap(j => Seq(raw(j), raw(4 + j)))
    assert(r0.getAs[String]("transposed") ==
      transposed.map(fx).mkString(","))
    val gram = for (i <- 0 to 1; j <- 0 to 1)
      yield (0 until 4).map(k => raw(i * 4 + k) * raw(j * 4 + k)).sum
    assert(r0.getAs[String]("gram") == gram.map(fx).mkString(","))
    // Gram of A·Aᵀ is symmetric: g01 == g10 on every row
    rows.foreach { r =>
      val g = r.getAs[String]("gram").split(",")
      assert(g(1) == g(2), s"asymmetric gram on vec ${r.getLong(0)}")
    }
    assert(r0.getAs[String]("row1") ==
      raw.drop(4).map(fx).mkString(","))
  }

  test("sparse_tensor: COO indices/values match the dense threshold; round-trip holds") {
    val rows = Tensors.qSparseTensor(spark, sfDir).collect()
    assert(rows.length == 100)
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter("vec_id = 1").selectExpr("embedding").head()
      .getSeq[Float](0).take(8).map(_.toDouble).toArray
    val expectedIdx = raw.indices.filter(i => math.abs(raw(i)) > 0.1)
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Int]("nnz") == expectedIdx.length)
    assert(r1.getAs[String]("coo_idx") == expectedIdx.mkString(","))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"),
        s"COO round-trip failed on vec ${r.getLong(0)}")
      // empty COO (all cells below threshold) is a NULL string — the
      // oracle's array_to_string([]) convention, matched engine-side
      val idx = Option(r.getAs[String]("coo_idx"))
      assert(idx.map(_.split(",").filter(_.nonEmpty).length).getOrElse(0)
        == r.getAs[Int]("nnz"))
    }
  }

  test("dict_encode: codes are dense 0..n-1 per column and decode round-trips") {
    val df = Tensors.qDictEncode(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("decoded_ok")))
    // dense code space: distinct codes are exactly 0..card-1
    def codes(c: String): Seq[Int] =
      rows.map(_.getAs[Int](c)).distinct.sorted.toSeq
    val lc = codes("lang_code")
    assert(lc == (0 until lc.length), s"lang codes not dense: $lc")
    val sc = codes("source_code")
    assert(sc == (0 until sc.length), s"source codes not dense: $sc")
    // encode is a function: one code per value, one value per code
    val pairs = rows.map(r => (r.getAs[String]("lang"),
      r.getAs[Int]("lang_code"))).distinct.toSeq
    assert(pairs.map(_._1).distinct.length == pairs.length)
    assert(pairs.map(_._2).distinct.length == pairs.length)
    // codes follow sort order of the dictionary values
    assert(pairs.sortBy(_._1).map(_._2) == pairs.map(_._2).sorted)
  }
}
