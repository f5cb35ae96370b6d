package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.{functions => gf}

/** Pins the reference-divergent semantics of the §2.8 facade against
  * literal expectations (the analogue of the reference's per-kernel
  * unit tests, e.g. cpp/src/arrow/compute/kernels/cast_test.cc).
  */
class FunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any = {
    val df = spark.range(1).select(c.as("v"))
    df.collect()(0).get(0)
  }

  test("concat: reference concat treats null as empty; concatOperator propagates") {
    val df = spark.createDataFrame(
      java.util.List.of(Row("a", null), Row("a", "b")),
      StructType(Seq(StructField("x", StringType), StructField("y", StringType))))
    val got = df.select(
      gf.concat(col("x"), col("y")).as("c"),
      gf.concatOperator(col("x"), col("y")).as("co")).collect()
    assert(got(0).getString(0) == "a")     // null -> ""
    assert(got(0).isNullAt(1))             // null propagates
    assert(got(1).getString(0) == "ab" && got(1).getString(1) == "ab")
  }

  test("div truncates toward zero; mod keeps dividend sign (C/Rust convention)") {
    assert(one(gf.div(lit(7L), lit(2L))) == 3L)
    assert(one(gf.div(lit(-7L), lit(2L))) == -3L)   // not floor (-4)
    assert(one(gf.div(lit(7L), lit(-2L))) == -3L)
    assert(one(gf.mod(lit(-7L), lit(2L))) == -1L)   // sign of dividend
    assert(one(gf.mod(lit(7L), lit(-2L))) == 1L)
  }

  test("div is exact for quotients beyond double's 2^53 integer range") {
    // 2^62 / 7 = 658812288346769700 — double division yields ...664.
    assert(one(gf.div(lit(4611686018427387904L), lit(7L))) == 658812288346769700L)
    assert(one(gf.div(lit(-4611686018427387904L), lit(7L))) == -658812288346769700L)
  }

  test("truncate(x, scale) truncates toward zero, not floor") {
    assert(one(gf.truncate(lit(3.19), 1)) == 3.1)
    assert(one(gf.truncate(lit(-3.19), 1)) == -3.1) // floor would give -3.2
    assert(one(gf.truncate(lit(-2.7))) == -2.0)
  }

  test("extractDow is ISO: Monday=1 .. Sunday=7") {
    // 2024-01-01 is a Monday, 2024-01-07 a Sunday
    assert(one(gf.extractDow(lit("2024-01-01").cast(DateType))) == 1)
    assert(one(gf.extractDow(lit("2024-01-07").cast(DateType))) == 7)
  }

  test("extract century/decade/millennium use the year-1 convention") {
    val d = lit("2000-06-01").cast(DateType)
    assert(one(gf.extractCentury(d)) == 20L)      // 2000 is 20th century
    assert(one(gf.extractCentury(lit("2001-01-01").cast(DateType))) == 21L)
    assert(one(gf.extractDecade(d)) == 200L)
    assert(one(gf.extractMillennium(d)) == 2L)
  }

  test("timestampdiff truncates complete units toward zero") {
    val a = lit("2024-01-01 00:00:00").cast(TimestampType)
    val b = lit("2024-01-02 23:59:59").cast(TimestampType)
    assert(one(gf.timestampdiffDay(a, b)) == 1L)
    assert(one(gf.timestampdiffDay(b, a)) == -1L)
    assert(one(gf.timestampdiffSecond(a, b)) == 172799L)
    assert(one(gf.timestampdiffMonth(
      lit("2024-01-31").cast(TimestampType),
      lit("2024-03-30").cast(TimestampType))) == 1)
  }

  test("month-unit diffs follow the Gandiva complete-months algorithm " +
      "(timestamp_arithmetic.cc:36-86), including the both-last-day case") {
    def m(a: String, b: String): Int = one(gf.timestampdiffMonth(
      lit(a).cast(TimestampType), lit(b).cast(TimestampType)))
      .asInstanceOf[Int]
    // Jan 31 -> Feb 29: end day-of-month (29) < start (31) => 0 complete
    // months — months_between would call both 'last days' and answer 1
    assert(m("2024-01-31 00:00:00", "2024-02-29 00:00:00") == 0)
    assert(m("2024-01-31 00:00:00", "2024-03-31 00:00:00") == 2)
    // time-of-day tiebreak when the day-of-month matches
    assert(m("2024-01-15 12:00:00", "2024-03-15 11:59:59") == 1)
    assert(m("2024-01-15 12:00:00", "2024-03-15 12:00:00") == 2)
    // sign adjustment = swap-and-negate, so reversal is exact
    assert(m("2024-03-15 12:00:00", "2024-01-15 12:00:01") == -1)
    // quarter/year divide the complete-month count, truncating to zero
    assert(one(gf.timestampdiffQuarter(
      lit("2024-01-31 00:00:00").cast(TimestampType),
      lit("2024-09-30 00:00:00").cast(TimestampType))) == 2)
    assert(one(gf.timestampdiffYear(
      lit("2020-06-15 00:00:00").cast(TimestampType),
      lit("2023-06-14 00:00:00").cast(TimestampType))) == 2)
    assert(one(gf.timestampdiffWeek(
      lit("2024-01-01 00:00:00").cast(TimestampType),
      lit("2024-01-15 00:00:00").cast(TimestampType))) == 2L)
  }

  test("timestampadd month clamps end-of-month like SQL interval arithmetic") {
    assert(one(gf.timestampaddMonth(lit(1),
      lit("2024-01-31 12:00:00").cast(TimestampType))).toString
      .startsWith("2024-02-29"))
  }

  test("unsigned widening casts land on the documented Spark types") {
    assert(one(gf.castFromUInt8(lit(200))) == 200.toShort)
    assert(one(gf.castFromUInt32(lit(3000000000L))) == 3000000000L)
    assert(one(gf.castFromUInt64(lit("18446744073709551615").cast(DecimalType(20, 0))))
      == new java.math.BigDecimal("18446744073709551615"))
  }

  test("isnumeric accepts numeric strings only") {
    assert(one(gf.isnumeric(lit("3.14"))) == true)
    assert(one(gf.isnumeric(lit("-2e3"))) == true)
    assert(one(gf.isnumeric(lit("abc"))) == false)
    // strtod-style: the words Infinity/NaN are not numerals
    assert(one(gf.isnumeric(lit("Infinity"))) == false)
    assert(one(gf.isnumeric(lit("-infinity"))) == false)
    assert(one(gf.isnumeric(lit("NaN"))) == false)
  }

  test("non-ANSI cast semantics: invalid input → null, overflow wraps") {
    // the reference's unsafe CastOptions (cpp/src/arrow/compute/kernels/
    // cast.h:36): allow_int_overflow wraps, invalid strings → null
    assert(one(lit("abc").cast(IntegerType)) == null)
    assert(one(lit("2.7").cast(IntegerType)) == 2) // float truncate
    assert(one(lit(4294967296L).cast(IntegerType)) == 0) // 2^32 wraps
    assert(one(lit(2147483648L).cast(IntegerType)) == Int.MinValue)
  }

  test("hash functions are deterministic across invocations") {
    val a = one(gf.hash64(lit("spark")))
    val b = one(gf.hash64(lit("spark")))
    assert(a == b && a != one(gf.hash64(lit("sparks"))))
  }

  test("trim/pad/extract family edge semantics") {
    // trims strip a character SET, not a prefix string
    assert(one(gf.ltrim(lit("aabca"), "a")) == "bca")
    assert(one(gf.btrim(lit("aabcaa"), "a")) == "bc")
    // split_part: 1-based; out-of-range → empty string, not null
    assert(one(gf.split_part(lit("x y"), " ", 2)) == "y")
    assert(one(gf.split_part(lit("x"), " ", 3)) == "")
    // lpad truncates when the target is shorter than the input
    assert(one(gf.lpad(lit("abcdef"), 3, "*")) == "abc")
    assert(one(gf.left(lit("abcdef"), 2)) == "ab")
    assert(one(gf.right(lit("abcdef"), 2)) == "ef")
    assert(one(gf.levenshtein(lit("kitten"), lit("sitting"))) == 3)
    assert(one(gf.translate(lit("abc"), "abc", "xyz")) == "xyz")
  }

  test("nulls-last sort helpers put nulls last on asc") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.lang.Integer.valueOf(2)), Row(null.asInstanceOf[java.lang.Integer]), Row(java.lang.Integer.valueOf(1))),
      StructType(Seq(StructField("v", IntegerType))))
    val got = df.orderBy(gf.ascNullsLast(col("v"))).collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(1, 2, null))
  }
}
