package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Estimator-quality contracts for the hash-checked sketch tier
  * (KMV distinct/Jaccard, Count-Min frequency). The DuckDB oracle
  * pins the exact VALUES (both sketches are md5-deterministic); these
  * tests pin the statistical contracts the oracle can't express —
  * error bounds, one-sidedness, composition laws.
  */
class SketchesSpec extends SparkSpec {

  test("KMV estimates land within the k=256 concentration bound") {
    val rows = Sketches.qKmvDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("a", "b", "union"))
    for ((part, r) <- rows) {
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est")
      // relative error concentrates at 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
      assert(math.abs(est - exact) / exact < 0.25,
        s"$part: est $est vs exact $exact out of bound")
      assert(r.getAs[Long]("sketch_n") <= 256)
    }
    val u = rows("union")
    val (jEst, jExact) =
      (u.getAs[Double]("jacc_est"), u.getAs[Double]("jacc_exact"))
    assert(jExact > 0 && jExact < 1, s"degenerate fixture jaccard $jExact")
    // k-sample of the union: binomial sd ~ sqrt(j(1-j)/k) ~ 3%; 5 sigma
    assert(math.abs(jEst - jExact) < 0.16,
      s"jaccard est $jEst vs exact $jExact")
    // the halves are bigger than the union's parts-wise max
    assert(u.getAs[Long]("n_exact") >= rows("a").getAs[Long]("n_exact"))
  }

  test("CMS point estimates never undercount and respect the epsilon bound") {
    val rows = Sketches.qCmsFreq(spark, sfDir).collect()
    assert(rows.length == 15, s"expected 15 probes, got ${rows.length}")
    val totalTokens = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    rows.foreach { r =>
      val over = r.getAs[Long]("overcount")
      assert(over >= 0, s"CMS undercounted ${r.getString(0)}: $over")
      assert(r.getAs[Long]("n_est") ===
        r.getAs[Long]("n_exact") + over)
      // REGRESSION PIN, not an invariant: the ≤ 8·N/w margin is a
      // with-high-probability bound that the deterministic fixture +
      // fixed hash salts comfortably satisfy; a legitimate hash/seed
      // change could exceed it (then re-pin), but a silent kernel
      // regression that inflates collisions will trip it first
      assert(over <= 8L * totalTokens / 512,
        s"overcount $over above the pinned margin for N=$totalTokens")
    }
    // probes are the exact global top-15 - counts must be descending
    val ns = rows.map(_.getAs[Long]("n_exact"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("join size estimate: unbiased-sample estimate lands near the " +
      "true join cardinality, sample rate honest") {
    val r = graft.ops.Sketches.qJoinSizeEst(spark, sfDir).collect().head
    val (nk, est, exact, errBp) = (r.getAs[Long]("n_sampled_keys"),
      r.getAs[Long]("est_rows"), r.getAs[Long]("exact_rows"),
      r.getAs[Long]("err_bp"))
    assert(exact > 0 && est > 0 && nk > 0)
    assert(errBp == math.abs(est - exact) * 10000 / exact)
    // REGRESSION PIN (cms convention): the 1/8 md5-nibble gate is a
    // w.h.p. concentration, and the deterministic fixture sits well
    // inside 25% — a broken gate (wrong rate, one-sided sampling)
    // lands orders of magnitude off
    assert(errBp <= 2500, s"estimate off by $errBp bp (est=$est exact=$exact)")
    // the sampled key count itself reflects the 1/8 rate (loose 2x band)
    val totalKeys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").distinct().count()
    assert(nk * 8 > totalKeys / 2 && nk * 8 < totalKeys * 2,
      s"sample rate off: $nk sampled of $totalKeys keys")
  }
}
