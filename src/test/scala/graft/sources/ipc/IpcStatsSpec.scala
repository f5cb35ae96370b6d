package graft.sources.ipc

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Sidecar format-versioning contract: v2 sidecars prune strings in
  * UTF8 byte order; pre-v2 (marker-less) sidecars recorded string
  * bounds under Java String (UTF-16) order and must DECLINE string
  * pruning — the two orders disagree beyond the BMP, so trusting a
  * legacy bound could silently drop supplementary-plane rows. */
class IpcStatsSpec extends AnyFunSuite {

  // U+E000 sorts ABOVE U+10000 in UTF-16 code-unit order (surrogates
  // D800.. < E000) but BELOW it in UTF-8 byte order — the disagreement
  // the version gate exists for
  private val privateUse = "\ue000"
  private val supplementary = new String(Character.toChars(0x10000))

  test("a v2 sidecar prunes strings on its recorded bounds") {
    val json =
      s"""{"v":2,"rows":10,"cols":{"s":{"t":"s","nulls":0,"min":"a","max":"m"}}}"""
    val st = IpcStats.fromJson(json).get
    assert(IpcStats.mightMatch(st, Array(EqualTo("s", "b"))))
    assert(!IpcStats.mightMatch(st, Array(EqualTo("s", "z"))),
      "a probe above the recorded max must prune")
    assert(!IpcStats.mightMatch(st, Array(GreaterThan("s", "m"))))
  }

  test("a marker-less (pre-v2) sidecar declines ALL string pruning " +
      "but keeps numeric pruning") {
    val json =
      s"""{"rows":10,"cols":{
         |"s":{"t":"s","nulls":0,"min":"a","max":"$privateUse"},
         |"n":{"t":"l","nulls":0,"min":"5","max":"9"}}}""".stripMargin
    val st = IpcStats.fromJson(json).get
    // the legacy max U+E000 was computed under UTF-16 order, where it
    // exceeds U+10000; trusting it under UTF-8 order would prune a
    // file that CONTAINS the supplementary row — so: no string claim
    assert(IpcStats.mightMatch(st, Array(EqualTo("s", supplementary))),
      "legacy string bounds must not prune")
    assert(IpcStats.mightMatch(st, Array(GreaterThan("s", privateUse))))
    // numeric bounds order identically in both generations: still prune
    assert(!IpcStats.mightMatch(st, Array(EqualTo("n", 42L))))
    assert(IpcStats.mightMatch(st, Array(EqualTo("n", 7L))))
  }

  test("NaN never mis-prunes: NaN probes decline, and a file " +
      "CONTAINING NaN records max = NaN (Spark's largest double)") {
    import org.apache.spark.sql.types._
    // NaN probe against finite bounds: every double comparison is
    // false, so pruning would drop files whose residual filter
    // matches (Spark's NaN = NaN is TRUE) — must keep
    val fin = IpcStats.fromJson(
      """{"v":2,"rows":5,"cols":{"d":{"t":"d","nulls":0,"min":"1.0","max":"3.0"}}}""").get
    assert(IpcStats.mightMatch(fin, Array(EqualTo("d", Double.NaN))))
    assert(IpcStats.mightMatch(fin, Array(LessThan("d", Double.NaN))),
      "every non-NaN sorts below NaN — the file matches d < NaN")
    assert(!IpcStats.mightMatch(fin, Array(EqualTo("d", 9.0))),
      "finite probes outside finite bounds still prune")
    // writer: a NaN value forces max = NaN, min stays finite
    val acc = new IpcStats.ColAcc(StructField("d", DoubleType))
    val mk = (v: Double) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](v))
    acc.update(mk(1.0), 0); acc.update(mk(Double.NaN), 0)
    acc.update(mk(2.0), 0)
    val st = IpcStats.fromJson(IpcStats.toJson(3L, Array(acc))).get
    // NaN is above every finite probe: range probes must KEEP the file
    assert(IpcStats.mightMatch(st, Array(GreaterThan("d", 100.0))),
      "a NaN row matches d > 100 — the file must not prune")
    assert(IpcStats.mightMatch(st, Array(EqualTo("d", 1.5))))
    assert(!IpcStats.mightMatch(st, Array(LessThan("d", 1.0))),
      "the finite MIN still prunes below-range probes")
  }

  test("an ALL-NaN file records min = NaN, not the +Infinity sentinel") {
    import org.apache.spark.sql.types._
    val acc = new IpcStats.ColAcc(StructField("d", DoubleType))
    val mk = (v: Double) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](v))
    acc.update(mk(Double.NaN), 0); acc.update(mk(Double.NaN), 0)
    val json = IpcStats.toJson(2L, Array(acc))
    assert(!json.contains("Infinity"),
      s"all-NaN column serialized the +Infinity min sentinel: $json")
    val st = IpcStats.fromJson(json).get
    assert(st.cols("d").min.contains("NaN") && st.cols("d").max.contains("NaN"))
    // semantics under the NaN bounds: NaN rows match d > x (NaN is
    // Spark's largest double) but never d = x or d < x for finite x
    assert(IpcStats.mightMatch(st, Array(GreaterThan("d", 100.0))))
    assert(!IpcStats.mightMatch(st, Array(EqualTo("d", 1.5))),
      "an all-NaN file cannot contain a finite equality match")
    assert(!IpcStats.mightMatch(st, Array(LessThan("d", 1.0))),
      "NaN sorts above every finite value — d < 1.0 matches nothing")
    // the repair must gate on "saw no non-NaN value", NOT on the
    // +Infinity sentinel: a file of {+Infinity, NaN} rows has a
    // GENUINE +Infinity min — rewriting it to NaN would prune an
    // equality probe on +Infinity that the file actually matches
    val acc2 = new IpcStats.ColAcc(StructField("d", DoubleType))
    acc2.update(mk(Double.PositiveInfinity), 0)
    acc2.update(mk(Double.NaN), 0)
    val st2 = IpcStats.fromJson(IpcStats.toJson(2L, Array(acc2))).get
    assert(st2.cols("d").min.contains("Infinity"),
      s"genuine +Infinity min rewritten: ${st2.cols("d")}")
    assert(IpcStats.mightMatch(st2,
      Array(EqualTo("d", Double.PositiveInfinity))),
      "a {+Inf, NaN} file must be kept for d = +Infinity")
  }

  test("the writer stamps the version marker (round-trip prunes)") {
    import org.apache.spark.sql.types._
    val acc = new IpcStats.ColAcc(StructField("s", StringType))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("k")))
    acc.update(row, 0)
    val st = IpcStats.fromJson(IpcStats.toJson(1L, Array(acc))).get
    assert(!IpcStats.mightMatch(st, Array(EqualTo("s", "z"))),
      "a freshly written sidecar must carry the marker and prune")
  }
}
