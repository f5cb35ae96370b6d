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

  test("overlapJoin bucket decomposition = naive inequality join, " +
      "each pair exactly once, across multi-bucket and boundary cases") {
    // bucket width 100: intervals spanning 1, 3, and 12 buckets;
    // boundary-touching pairs (end == start → overlap 0); disjoint
    // pairs; a pair overlapping in MANY shared buckets (the dedup trap)
    val sess = df(Seq(
      Row(1L, 0L, 1200L),      // 12 buckets, overlaps almost everyone
      Row(2L, 50L, 350L),      // 3 buckets, shares 3 with user 1
      Row(3L, 350L, 360L),     // touches user 2's end exactly
      Row(4L, 2000L, 2100L),   // disjoint from all
      Row(5L, 100L, 110L),     // inside user 1, inside user 2
      Row(1L, 5000L, 5050L)),  // second session of user 1, disjoint
      "user_id BIGINT, s_us BIGINT, e_us BIGINT")
    val got = Temporal.overlapJoin(sess, 100L)
      .select("ua", "ub", "sa", "sb", "overlap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    // naive: every pair, inequality predicate, no buckets
    val a = sess.select(col("user_id").as("ua"), col("s_us").as("sa"),
      col("e_us").as("ea"))
    val b = sess.select(col("user_id").as("ub"), col("s_us").as("sb"),
      col("e_us").as("eb"))
    val naive = a.crossJoin(b)
      .filter(col("ua") < col("ub") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select(col("ua"), col("ub"), col("sa"), col("sb"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(naive.nonEmpty && naive.contains((2L, 3L, 50L, 350L, 0L)),
      "fixture must exercise the touching-boundary case")
    assert(got == naive,
      s"decomposition != naive:\n got=$got\n exp=$naive")
  }
}
