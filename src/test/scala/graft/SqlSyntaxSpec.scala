package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.SqlSyntax

/** QUALIFY / DISTINCT ON rewrites (ops/SqlSyntax): result parity with
  * the hand-written window forms, scanner literal/subquery safety, and
  * the refusal contracts. */
class SqlSyntaxSpec extends SparkSpec {

  private def sess = Session(spark)
  private def orders = graft.sources.Tables(spark, sfDir, "orders")
  private def customer = graft.sources.Tables(spark, sfDir, "customer")

  test("QUALIFY equals the hand-written window-subquery form") {
    sess.registerTable("orders", orders)
    val got = sess.sql(graft.ops.Sql.qualifySql).collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders
      .filter(col("o_custkey") % 25 === 3)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
    assert(!got.head.schema.fieldNames.contains("__qualify__"))
  }

  test("DISTINCT ON equals the row_number()=1 window form") {
    sess.registerTable("customer", customer)
    val got = sess.sql(graft.ops.Sql.distinctOnSql).collect()
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = customer
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("QUALIFY inside a string literal or subquery does not trigger") {
    assert(SqlSyntax.findTopLevel(
      "SELECT 'no QUALIFY here' AS s FROM t", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT * FROM (SELECT a FROM t QUALIFY rn <= 2) q", "QUALIFY").isEmpty)
    // and word boundaries: DISQUALIFY / QUALIFYING are not the keyword
    assert(SqlSyntax.findTopLevel(
      "SELECT disqualify, qualifying FROM t", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t QUALIFY rn = 1", "QUALIFY").isDefined)
  }

  test("DISTINCT ON without ORDER BY is refused") {
    val e = intercept[IllegalArgumentException] {
      SqlSyntax.rewriteDistinctOn(
        "SELECT DISTINCT ON (a) a, b FROM t")
    }
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("psi_drift: smoothed buckets, finite values, integer row identity") {
    val rows = graft.ops.Quality.qPsiDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val feats = rows.map(_.getString(0)).distinct.sorted
    assert(feats.toSeq == Seq("type", "val"))
    rows.foreach { r =>
      val psi = r.getDouble(4)
      assert(!psi.isNaN && !psi.isInfinite, s"non-finite PSI in $r")
      // identical halves give PSI 0; a bucket with ca=cb must be ~0
      if (r.getLong(2) == r.getLong(3)) assert(math.abs(psi) < 1e-3)
    }
  }
}
