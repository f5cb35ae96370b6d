package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Temporal

/** as-of join edge semantics on a hand-built fixture: inclusive
  * boundary, no-prior-row null, per-key isolation.
  */
class TemporalSpec extends SparkSpec {

  private def df(rows: Seq[Row], schema: String) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType.fromDDL(schema))
  }

  test("asof: latest right <= left time, inclusive, null when none, per key") {
    val left = df(Seq(
      Row(1L, 100L, "p1"), Row(1L, 200L, "p2"), Row(2L, 150L, "p3"),
      Row(3L, 50L, "p4")),
      "k BIGINT, lt BIGINT, name STRING")
    val right = df(Seq(
      Row(1L, 100L, 10L), Row(1L, 150L, 11L), Row(2L, 149L, 20L),
      Row(2L, 151L, 21L)),
      "k BIGINT, rt BIGINT, rid BIGINT")
    val got = Temporal.asofJoin(left, right, "k", "lt", "rt",
      payload = Seq("rid"))
      .orderBy("name")
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq == Seq(
      ("p1", 10L),  // boundary rt == lt is included
      ("p2", 11L),  // latest of the two earlier rights
      ("p3", 20L),  // rt=151 is in the future → excluded
      ("p4", -1L))) // key with no rights at all → null
  }
}
