package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{acos, asin, concat_ws, atan2, coalesce, col, cos, countDistinct, date_trunc, expr, greatest, least, lit, make_dt_interval, make_ym_interval, month, nullif, round, signum, sin, struct, tan, try_divide, unix_micros, when, width_bucket}
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.{functions => gf}

/** Table-level queries exercising the §2.8 scalar facade
  * (graft.functions) end-to-end, each with a DuckDB oracle twin. All
  * expressions are `functions._` compositions → whole-stage codegen,
  * no UDFs in the hot path.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** String function surface (function_registry_string.cc). */
  def qStringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") <= 500)
      .select(
        col("p_partkey"),
        gf.upper(col("p_name")).as("up"),
        gf.lower(col("p_type")).as("lo"),
        gf.char_length(col("p_name")).as("len"),
        gf.octet_length(col("p_name")).as("olen"),
        gf.bit_length(col("p_name")).as("blen"),
        gf.reverse(col("p_name")).as("rev"),
        gf.substr(col("p_name"), 2, 3).as("sub"),
        gf.substr(col("p_brand"), 6).as("brand_num"),
        gf.locate("o", col("p_name")).as("pos_o"),
        gf.starts_with(col("p_name"), "red").cast(IntegerType).as("is_red"),
        gf.ends_with(col("p_name"), "bolt").cast(IntegerType).as("is_bolt"),
        gf.concat(col("p_name"), lit("/"), col("p_type")).as("cat"),
        gf.replace(col("p_name"), " ", "_").as("repl"),
        gf.castVARCHAR(col("p_type"), 3).as("typ3"))
      .orderBy(col("p_partkey"))

  val qStringFuncsSql: String = """
    SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_type) AS lo,
      LENGTH(p_name) AS len, STRLEN(p_name) AS olen,
      BIT_LENGTH(p_name) AS blen, REVERSE(p_name) AS rev,
      SUBSTR(p_name, 2, 3) AS sub, SUBSTR(p_brand, 6) AS brand_num,
      CAST(STRPOS(p_name, 'o') AS INTEGER) AS pos_o,
      CAST(STARTS_WITH(p_name, 'red') AS INTEGER) AS is_red,
      CAST(p_name LIKE '%bolt' AS INTEGER) AS is_bolt,
      p_name || '/' || p_type AS cat,
      REPLACE(p_name, ' ', '_') AS repl,
      SUBSTR(p_type, 1, 3) AS typ3
    FROM part WHERE p_partkey <= 500
    ORDER BY p_partkey
  """.trim

  /** Second math tier: trigonometry, sign, n-ary min/max. Results are
    * rounded to 6 decimals — libm implementations differ by an ulp
    * across engines, and the declared contract is the function
    * surface, not the last bit of a transcendental. Inputs are
    * l_discount/l_tax (0..0.1), inside every inverse-trig domain. */
  def qMathFuncs2(s: SparkSession, dir: String): DataFrame = {
    def r6(c: org.apache.spark.sql.Column) = round(c, 6)
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r6(sin(col("l_discount"))).as("sin_d"),
        r6(cos(col("l_discount"))).as("cos_d"),
        r6(tan(col("l_discount"))).as("tan_d"),
        r6(asin(col("l_discount"))).as("asin_d"),
        r6(acos(col("l_discount"))).as("acos_d"),
        r6(atan2(col("l_discount"), col("l_tax") + 0.01)).as("atan2_dt"),
        signum(col("l_discount") - 0.05).as("sign_d"),
        greatest(col("l_discount"), col("l_tax")).as("gr"),
        least(col("l_discount"), col("l_tax")).as("le"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val qMathFuncs2Sql: String = """
    SELECT l_orderkey, l_linenumber,
      round(sin(l_discount), 6) AS sin_d, round(cos(l_discount), 6) AS cos_d,
      round(tan(l_discount), 6) AS tan_d, round(asin(l_discount), 6) AS asin_d,
      round(acos(l_discount), 6) AS acos_d,
      round(atan2(l_discount, l_tax + 0.01), 6) AS atan2_dt,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
      greatest(l_discount, l_tax) AS gr, least(l_discount, l_tax) AS le
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
  """.trim

  /** Second string tier (function_registry_string.cc trim/pad/extract
    * family): trims with character sets, pads, field extraction,
    * translate, edit distance. */
  def qStringFuncs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") < 40)
      .select(
        col("p_partkey"),
        gf.ltrim(col("p_name"), "a").as("lt"),
        gf.rtrim(col("p_name"), "e").as("rt"),
        gf.btrim(col("p_name"), "ae").as("bt"),
        gf.lpad(col("p_brand"), 12, "*").as("lp"),
        gf.rpad(col("p_brand"), 12, "*").as("rp"),
        gf.split_part(col("p_type"), " ", 2).as("sp2"),
        gf.ascii(col("p_name")).as("asc1"),
        gf.repeat(col("p_brand"), 2).as("rep"),
        gf.left(col("p_name"), 4).as("l4"),
        gf.right(col("p_name"), 4).as("r4"),
        gf.translate(col("p_name"), "aeiou", "01234").as("tr"),
        gf.levenshtein(col("p_brand"), col("p_type")).as("lev"))
      .orderBy(col("p_partkey"))

  val qStringFuncs2Sql: String = """
    SELECT p_partkey,
      ltrim(p_name, 'a') AS lt, rtrim(p_name, 'e') AS rt, trim(p_name, 'ae') AS bt,
      lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
      split_part(p_type, ' ', 2) AS sp2,
      ascii(p_name) AS asc1, repeat(p_brand, 2) AS rep,
      left(p_name, 4) AS l4, right(p_name, 4) AS r4,
      translate(p_name, 'aeiou', '01234') AS tr,
      CAST(levenshtein(p_brand, p_type) AS INT) AS lev
    FROM part WHERE p_partkey < 40 ORDER BY p_partkey
  """.trim

  /** Math function surface (function_registry_math_ops.cc). Inputs are
    * strictly positive so div/mod/floor conventions agree across
    * engines; signed edge cases are pinned in FunctionsSpec. */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0 && col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        gf.abs(col("l_discount") - 0.05).as("abs_d"),
        gf.ceil(col("l_quantity")).as("ceil_q"),
        gf.floor(col("l_extendedprice")).as("floor_p"),
        gf.round(col("l_extendedprice"), 1).as("round_p1"),
        gf.truncate(col("l_extendedprice"), 1).as("trunc_p1"),
        // transcendentals: libm implementations differ by 1 ulp across
        // engines — round to 6dp for the exact-hash compare
        gf.round(gf.cbrt(col("l_quantity")), 6).as("cbrt_q"),
        gf.round(gf.exp(col("l_discount")), 6).as("exp_d"),
        gf.round(gf.log(col("l_extendedprice")), 6).as("ln_p"),
        gf.round(gf.log10(col("l_extendedprice")), 6).as("log10_p"),
        gf.round(gf.log(2.0, col("l_quantity")), 6).as("log2_q"),
        gf.power(col("l_quantity"), lit(2.0)).as("q_sq"),
        gf.mod(col("l_orderkey"), lit(97L)).as("mod97"),
        gf.div(col("l_orderkey"), lit(7L)).as("div7"),
        gf.isnumeric(col("l_returnflag")).cast(IntegerType).as("flag_numeric"),
        gf.is_not_distinct_from(col("l_quantity"), col("l_linenumber"))
          .cast(IntegerType).as("nsafe_eq"))
      .orderBy(col("l_orderkey"))

  val qMathFuncsSql: String = """
    SELECT l_orderkey,
      ABS(l_discount - 0.05) AS abs_d,
      CAST(CEIL(l_quantity) AS BIGINT) AS ceil_q,
      CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_p,
      ROUND(l_extendedprice, 1) AS round_p1,
      TRUNC(l_extendedprice * 10) / 10 AS trunc_p1,
      ROUND(CBRT(l_quantity), 6) AS cbrt_q,
      ROUND(EXP(l_discount), 6) AS exp_d,
      ROUND(LN(l_extendedprice), 6) AS ln_p,
      ROUND(LOG10(l_extendedprice), 6) AS log10_p,
      ROUND(LN(l_quantity) / LN(2.0), 6) AS log2_q,
      POW(l_quantity, 2.0) AS q_sq,
      l_orderkey % 97 AS mod97,
      l_orderkey // 7 AS div7,
      CAST(l_returnflag SIMILAR TO '[-+]?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?' AS INTEGER) AS flag_numeric,
      CAST(l_quantity IS NOT DISTINCT FROM CAST(l_linenumber AS DOUBLE) AS INTEGER) AS nsafe_eq
    FROM lineitem
    WHERE l_orderkey % 500 = 0 AND l_linenumber = 1
    ORDER BY l_orderkey
  """.trim

  /** Datetime extract surface (function_registry_datetime.cc). */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 200 === 0)
      .select(
        col("o_orderkey"),
        gf.extractYear(col("o_orderdate")).as("yy"),
        gf.extractQuarter(col("o_orderdate")).as("qq"),
        gf.extractMonth(col("o_orderdate")).as("mm"),
        gf.extractWeek(col("o_orderdate")).as("ww"),
        gf.extractDay(col("o_orderdate")).as("dd"),
        gf.extractDoy(col("o_orderdate")).as("doy"),
        gf.extractDow(col("o_orderdate")).as("dow_iso"),
        gf.extractHour(col("o_orderdate")).as("hh"),
        gf.extractMinute(col("o_orderdate")).as("mi"),
        gf.extractSecond(col("o_orderdate")).as("ss"),
        gf.extractEpoch(col("o_orderdate")).as("epoch_s"),
        gf.extractDecade(col("o_orderdate")).as("decade"),
        gf.extractCentury(col("o_orderdate")).as("century"),
        gf.date_trunc("month", col("o_orderdate")).as("month_start"),
        gf.castDATE(col("o_orderdate")).as("odate"))
      .orderBy(col("o_orderkey"))

  val qDateFuncsSql: String = """
    SELECT o_orderkey,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yy,
      CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qq,
      CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mm,
      CAST(EXTRACT(WEEK FROM o_orderdate) AS INTEGER) AS ww,
      CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dd,
      CAST(EXTRACT(DOY FROM o_orderdate) AS INTEGER) AS doy,
      CAST(EXTRACT(ISODOW FROM o_orderdate) AS INTEGER) AS dow_iso,
      CAST(EXTRACT(HOUR FROM o_orderdate) AS INTEGER) AS hh,
      CAST(EXTRACT(MINUTE FROM o_orderdate) AS INTEGER) AS mi,
      CAST(EXTRACT(SECOND FROM o_orderdate) AS INTEGER) AS ss,
      epoch_us(o_orderdate) // 1000000 AS epoch_s,
      CAST(EXTRACT(YEAR FROM o_orderdate) // 10 AS BIGINT) AS decade,
      CAST((EXTRACT(YEAR FROM o_orderdate) - 1) // 100 + 1 AS BIGINT) AS century,
      DATE_TRUNC('month', o_orderdate) AS month_start,
      CAST(o_orderdate AS DATE) AS odate
    FROM orders WHERE o_orderkey % 200 = 0
    ORDER BY o_orderkey
  """.trim

  /** Timestamp arithmetic surface
    * (function_registry_timestamp_arithmetic.cc). */
  def qTsArith(s: SparkSession, dir: String): DataFrame = {
    val mid96 = lit("1996-06-15 00:00:00").cast(TimestampType)
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 200 === 0)
      .select(
        col("o_orderkey"),
        gf.timestampaddDay(lit(30), col("o_orderdate")).as("plus_30d"),
        gf.timestampaddWeek(lit(2), col("o_orderdate")).as("plus_2w"),
        gf.timestampaddMonth(lit(2), col("o_orderdate")).as("plus_2mo"),
        gf.timestampaddQuarter(lit(1), col("o_orderdate")).as("plus_1q"),
        gf.timestampaddYear(lit(-1), col("o_orderdate")).as("minus_1y"),
        gf.timestampaddHour(lit(-6), col("o_orderdate")).as("minus_6h"),
        gf.timestampaddMinute(lit(90), col("o_orderdate")).as("plus_90min"),
        gf.timestampaddSecond(lit(-30), col("o_orderdate")).as("minus_30s"),
        gf.timestampdiffDay(col("o_orderdate"), mid96).as("days_to_mid96"),
        gf.timestampdiffWeek(col("o_orderdate"), mid96).as("weeks_to_mid96"),
        gf.timestampdiffHour(col("o_orderdate"), mid96).as("hours_to_mid96"),
        gf.timestampdiffMinute(col("o_orderdate"), mid96).as("mins_to_mid96"),
        gf.timestampdiffSecond(col("o_orderdate"), mid96).as("secs_to_mid96"),
        gf.timestampdiffMonth(col("o_orderdate"), mid96).as("months_to_mid96"),
        gf.timestampdiffQuarter(col("o_orderdate"), mid96).as("quarters_to_mid96"),
        gf.timestampdiffYear(col("o_orderdate"), mid96).as("years_to_mid96"),
        gf.date_diff(lit("1996-06-15").cast(DateType),
          gf.castDATE(col("o_orderdate"))).as("datediff_d"),
        gf.date_add(gf.castDATE(col("o_orderdate")), 7).as("plus_7d"),
        gf.date_sub(gf.castDATE(col("o_orderdate")), 7).as("minus_7d"))
      .orderBy(col("o_orderkey"))
  }

  /** Oracle twin of the Gandiva complete-months algorithm
    * (`timestamp_arithmetic.cc:36-86`): calendar month delta minus one
    * when the end (day, time) key precedes the start's, swap-and-negate
    * for reversed order — all integer, so bit-identical cross-engine.
    * Fixed units truncate toward zero (TRUNC, not //: DuckDB // floors
    * and the diffs change sign across the corpus). */
  val qTsArithSql: String = """
    WITH base AS (
      SELECT o_orderkey, o_orderdate,
        TIMESTAMP '1996-06-15 00:00:00' AS b,
        epoch_us(TIMESTAMP '1996-06-15 00:00:00') // 1000000
          - epoch_us(o_orderdate) // 1000000 AS secs
      FROM orders WHERE o_orderkey % 200 = 0),
    mdiff AS (
      SELECT *,
        CASE WHEN b >= o_orderdate THEN
          12 * (year(b) - year(o_orderdate)) + (month(b) - month(o_orderdate))
          - CASE WHEN day(b) * 86400 + hour(b) * 3600 + minute(b) * 60 + second(b)
                    < day(o_orderdate) * 86400 + hour(o_orderdate) * 3600
                      + minute(o_orderdate) * 60 + second(o_orderdate)
                 THEN 1 ELSE 0 END
        ELSE
          -(12 * (year(o_orderdate) - year(b)) + (month(o_orderdate) - month(b))
          - CASE WHEN day(o_orderdate) * 86400 + hour(o_orderdate) * 3600
                      + minute(o_orderdate) * 60 + second(o_orderdate)
                    < day(b) * 86400 + hour(b) * 3600 + minute(b) * 60 + second(b)
                 THEN 1 ELSE 0 END)
        END AS m
      FROM base)
    SELECT o_orderkey,
      o_orderdate + INTERVAL 30 DAY AS plus_30d,
      o_orderdate + INTERVAL 14 DAY AS plus_2w,
      o_orderdate + INTERVAL 2 MONTH AS plus_2mo,
      o_orderdate + INTERVAL 3 MONTH AS plus_1q,
      o_orderdate - INTERVAL 1 YEAR AS minus_1y,
      o_orderdate - INTERVAL 6 HOUR AS minus_6h,
      o_orderdate + INTERVAL 90 MINUTE AS plus_90min,
      o_orderdate - INTERVAL 30 SECOND AS minus_30s,
      CAST(TRUNC(secs / 86400.0) AS BIGINT) AS days_to_mid96,
      CAST(TRUNC(secs / 604800.0) AS BIGINT) AS weeks_to_mid96,
      CAST(TRUNC(secs / 3600.0) AS BIGINT) AS hours_to_mid96,
      CAST(TRUNC(secs / 60.0) AS BIGINT) AS mins_to_mid96,
      secs AS secs_to_mid96,
      CAST(m AS INTEGER) AS months_to_mid96,
      CAST(TRUNC(m / 3.0) AS INTEGER) AS quarters_to_mid96,
      CAST(TRUNC(m / 12.0) AS INTEGER) AS years_to_mid96,
      DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1996-06-15') AS datediff_d,
      CAST(o_orderdate AS DATE) + 7 AS plus_7d,
      CAST(o_orderdate AS DATE) - 7 AS minus_7d
    FROM mdiff
    ORDER BY o_orderkey
  """.trim

  /** INTERVAL / DURATION / TIME type conventions (SURVEY §1.2;
    * reference `cpp/src/arrow/type.h:107-146`): Spark's
    * `YearMonthIntervalType` / `DayTimeIntervalType` stand in for
    * Arrow INTERVAL(YEAR_MONTH/DAY_TIME) and DURATION, and TIME32/64
    * lowers to the micros-since-midnight LongType convention. The
    * intervals are constructed (`make_ym_interval`/`make_dt_interval`),
    * applied to timestamps, and lowered to their integer storage
    * conventions — int32 total months for YM, int64 total seconds for
    * DT — which is also what makes the row parquet-dumpable (interval
    * types have no parquet encoding, in Arrow or Spark). */
  def qIntervalArith(s: SparkSession, dir: String): DataFrame = {
    val od = col("o_orderdate")
    val mid96 = lit("1996-06-15 00:00:00").cast(TimestampType)
    // synthetic intra-day offset so the TIME convention isn't trivially
    // zero on the midnight-valued fixture dates
    val ts = od + make_dt_interval(lit(0), lit(0), lit(0),
      (col("o_orderkey") % 86400).cast(DoubleType))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 200 === 0)
      .select(
        col("o_orderkey"),
        (od + make_ym_interval(lit(1), lit(2))).as("plus_1y2m"),
        (od - make_ym_interval(lit(0), lit(5))).as("minus_5mo"),
        make_ym_interval(lit(0), month(od)).cast(IntegerType).as("ym_months"),
        (od + make_dt_interval(lit(2), lit(3), lit(30), lit(1.5)))
          .as("plus_dt"),
        (mid96 - od).cast(LongType).as("dur_secs"),
        (unix_micros(ts.cast(TimestampType)) -
          unix_micros(date_trunc("DAY", ts).cast(TimestampType))).as("time_us"))
      .orderBy(col("o_orderkey"))
  }

  val qIntervalArithSql: String = """
    SELECT o_orderkey,
      o_orderdate + INTERVAL 14 MONTH AS plus_1y2m,
      o_orderdate - INTERVAL 5 MONTH AS minus_5mo,
      CAST(month(o_orderdate) AS INTEGER) AS ym_months,
      o_orderdate + INTERVAL 2 DAY + INTERVAL 3 HOUR
        + INTERVAL 30 MINUTE + INTERVAL 1500 MILLISECOND AS plus_dt,
      epoch_us(TIMESTAMP '1996-06-15 00:00:00') // 1000000
        - epoch_us(o_orderdate) // 1000000 AS dur_secs,
      (o_orderkey % 86400) * 1000000 AS time_us
    FROM orders WHERE o_orderkey % 200 = 0
    ORDER BY o_orderkey
  """.trim

  /** HALF_FLOAT convention with query evidence (SURVEY §1.2; Arrow
    * `type.h:78`): synthetic binary16 bit patterns spread across every
    * class — subnormals, normals, ±Inf, NaN — decoded to float32 by
    * [[graft.functions.halfFloatToFloat]] and cross-checked against
    * the identical sign/exponent/mantissa arithmetic in DuckDB. All
    * intermediates are exact powers of two, so the comparison is
    * bit-exact, not tolerance-based; NaN lowers to NULL on both
    * sides. */
  def qHalfFloat(s: SparkSession, dir: String): DataFrame = {
    // hashed spread over the corpus + pinned vectors (negative keys)
    // guaranteeing every class appears: ±0, ±Inf, NaN, 1.0, min
    // subnormal 2^-24, max finite 65504
    val pinned = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(-1L, 0x0000), // +0
        org.apache.spark.sql.Row(-2L, 0x8000), // -0
        org.apache.spark.sql.Row(-3L, 0x7C00), // +Inf
        org.apache.spark.sql.Row(-4L, 0xFC00), // -Inf
        org.apache.spark.sql.Row(-5L, 0x7E00), // NaN
        org.apache.spark.sql.Row(-6L, 0x3C00), // 1.0
        org.apache.spark.sql.Row(-7L, 0x0001), // 2^-24
        org.apache.spark.sql.Row(-8L, 0x7BFF)), // 65504 (max finite)
      StructType(Seq(StructField("p_partkey", LongType),
        StructField("f16_bits_in", IntegerType))))
    val hashed = t(s, dir, "part")
      .filter(col("p_partkey") % 20 === 0)
      .select(col("p_partkey"),
        ((col("p_partkey") * 2654435761L + 40503L) % 65536L)
          .cast(IntegerType).as("f16_bits_in"))
    val bits = col("f16_bits_in")
    val e = org.apache.spark.sql.functions.shiftright(
      bits.cast(IntegerType), 10).bitwiseAND(lit(31))
    val m = bits.cast(IntegerType).bitwiseAND(lit(1023))
    pinned.unionAll(hashed)
      .select(
        col("p_partkey"),
        bits.cast(IntegerType).as("f16_bits"),
        org.apache.spark.sql.functions
          .when(e === 31, org.apache.spark.sql.functions
            .when(m === 0, "inf").otherwise("nan"))
          .when(e === 0, org.apache.spark.sql.functions
            .when(m === 0, "zero").otherwise("subnormal"))
          .otherwise("normal").as("f16_class"),
        // Hash-canonical projection: ±Inf rows carry their identity in
        // f16_class/f16_bits, so the float column NULLs them (IEEE Inf
        // byte images differ across the two engines' result paths);
        // `+ 0f` collapses -0.0 to +0.0 (same value, different bytes).
        org.apache.spark.sql.functions
          .when(e === 31, lit(null).cast("float"))
          .otherwise(gf.halfFloatToFloat(bits) + lit(0f)).as("f32_value"))
      .orderBy(col("p_partkey"))
  }

  val qHalfFloatSql: String = """
    WITH b AS (
      SELECT * FROM (VALUES
        (-1, 0), (-2, 32768), (-3, 31744), (-4, 64512),
        (-5, 32256), (-6, 15360), (-7, 1), (-8, 31743))
        AS pinned(p_partkey, bits)
      UNION ALL
      SELECT p_partkey,
        CAST((p_partkey * 2654435761 + 40503) % 65536 AS INTEGER) AS bits
      FROM part WHERE p_partkey % 20 = 0),
    f AS (
      SELECT p_partkey, bits,
        (bits >> 15) & 1 AS s, (bits >> 10) & 31 AS e, bits & 1023 AS m
      FROM b)
    SELECT p_partkey, bits AS f16_bits,
      CASE WHEN e = 31 THEN (CASE WHEN m = 0 THEN 'inf' ELSE 'nan' END)
           WHEN e = 0 THEN (CASE WHEN m = 0 THEN 'zero' ELSE 'subnormal' END)
           ELSE 'normal' END AS f16_class,
      CAST(CASE
        WHEN e = 31 THEN NULL
        WHEN e = 0 THEN (CASE WHEN s = 1 THEN -1.0 ELSE 1.0 END)
          * m * power(2.0, -24)
        ELSE (CASE WHEN s = 1 THEN -1.0 ELSE 1.0 END)
          * (1.0 + m / 1024.0) * power(2.0, e - 15)
      END AS FLOAT) + CAST(0.0 AS FLOAT) AS f32_value
    FROM f ORDER BY p_partkey
  """.trim

  /** UNION type convention with query evidence (SURVEY §1.2; Arrow
    * `type.h:127`, dense union `format/Schema.fbs`): Spark has no
    * union type, so a union column is encoded as a STRUCT OF
    * NULLABLES with a tag field — exactly one variant non-null per
    * row, selected by the tag. The query BUILDS such a column (tag
    * chosen per row from the data), CONSUMES it the only way a union
    * can be consumed (per-tag dispatch on the tag field), and
    * flattens to per-tag aggregates the oracle reproduces without the
    * encoding — proving the convention carries the information, not
    * just the shape. Doubles aggregate through DECIMAL snap
    * (order-independence across partitionings). */
  def qUnionType(s: SparkSession, dir: String): DataFrame = {
    val tag = (col("event_id") % 3).cast(IntegerType)
    val u = org.apache.spark.sql.functions.struct(
      tag.as("tag"),
      org.apache.spark.sql.functions.when(tag === 0, col("user_id"))
        .otherwise(lit(null)).as("v_long"),
      org.apache.spark.sql.functions.when(tag === 1, col("value"))
        .otherwise(lit(null)).as("v_double"),
      org.apache.spark.sql.functions.when(tag === 2, col("event_type"))
        .otherwise(lit(null)).as("v_string"))
    Tables(s, dir, "events")
      .select(col("event_id"), u.as("u"))
      // union invariant: exactly one non-null variant per row
      .withColumn("n_set",
        org.apache.spark.sql.functions.when(col("u.v_long").isNotNull, 1)
          .otherwise(0)
        + org.apache.spark.sql.functions.when(col("u.v_double").isNotNull, 1)
          .otherwise(0)
        + org.apache.spark.sql.functions.when(col("u.v_string").isNotNull, 1)
          .otherwise(0))
      .groupBy(col("u.tag").as("tag"))
      .agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("u.v_long")).as("sum_long"),
        org.apache.spark.sql.functions.sum(
          col("u.v_double").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_double"),
        org.apache.spark.sql.functions.min(col("u.v_string")).as("min_string"),
        org.apache.spark.sql.functions.min(col("n_set")).as("min_set"),
        org.apache.spark.sql.functions.max(col("n_set")).as("max_set"))
      .orderBy(col("tag"))
  }

  val qUnionTypeSql: String = """
    WITH u AS (
      SELECT event_id,
        CAST(event_id % 3 AS INTEGER) AS tag,
        CASE WHEN event_id % 3 = 0 THEN user_id END AS v_long,
        CASE WHEN event_id % 3 = 1 THEN value END AS v_double,
        CASE WHEN event_id % 3 = 2 THEN event_type END AS v_string
      FROM events)
    SELECT tag, COUNT(*) AS n,
      CAST(SUM(v_long) AS BIGINT) AS sum_long,
      CAST(SUM(CAST(v_double AS DECIMAL(18,6))) AS DOUBLE) AS sum_double,
      MIN(v_string) AS min_string,
      1 AS min_set, 1 AS max_set
    FROM u GROUP BY tag ORDER BY tag
  """.trim

  /** Hash functions (function_registry_hash.cc + Gandiva's
    * sha1/sha256 in function_registry_string.cc lineage): the
    * cryptographic hashes have standard values, so md5/sha256 are
    * oracle-hash-checked against DuckDB. murmur3/xxhash64 are
    * seed/implementation-specific per engine — no cross-engine oracle
    * can exist for their raw values — so they ride along as a
    * COUNT of distinct values (the structural property an oracle CAN
    * check: determinism + near-injectivity on this corpus), with the
    * exact per-row values pinned by FunctionsSpec. */
  def qHashFuncs(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val perRow = p.select(
      col("p_partkey"),
      org.apache.spark.sql.functions.md5(
        col("p_name").cast(BinaryType)).as("h_md5"),
      org.apache.spark.sql.functions.sha2(
        col("p_name").cast(BinaryType), 256).as("h_sha256"),
      gf.hash32(col("p_name")).as("h32"),
      gf.hash64(col("p_name")).as("h64"))
    // injectivity is relative to DISTINCT inputs — p_name repeats
    val murmurCard = p.select(col("p_name"))
      .agg(
        countDistinct(gf.hash32(col("p_name"))).as("n32"),
        countDistinct(gf.hash64(col("p_name"))).as("n64"),
        countDistinct(col("p_name")).as("n"))
    perRow.select(col("p_partkey"), col("h_md5"), col("h_sha256"))
      .crossJoin(org.apache.spark.sql.functions.broadcast(murmurCard)
        .select((col("n64") === col("n")).as("murmur64_injective_here"),
          (col("n32") === col("n")).as("murmur32_injective_here")))
      .orderBy(col("p_partkey"))
  }

  val qHashFuncsSql: String = """
    SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256,
      true AS murmur64_injective_here, true AS murmur32_injective_here
    FROM part ORDER BY p_partkey
  """.trim

  /** Regex surface (Gandiva's regexp_replace/extract + RE2 `like`
    * lineage, function_registry_string.cc): extract the first digit
    * run, strip vowels, and a regex match predicate. Patterns stay in
    * the character-class subset where Java regex and RE2 agree.
    * All three compile once per task and run inside whole-stage
    * codegen. */
  def qRegexFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .select(
        col("c_custkey"),
        org.apache.spark.sql.functions.regexp_extract(
          col("c_name"), "([0-9]+)", 1).as("digits"),
        org.apache.spark.sql.functions.regexp_replace(
          col("c_name"), "[0-9]", "#").as("masked_name"),
        col("c_mktsegment").rlike("^(BUILD|AUTO)").as("seg_match"))
      .orderBy(col("c_custkey"))

  val qRegexFuncsSql: String = """
    SELECT c_custkey,
      regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
      regexp_matches(c_mktsegment, '^(BUILD|AUTO)') AS seg_match
    FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey
  """.trim

  /** Conditional scalar surface (Gandiva `if`/`coalesce`/`nullif`
    * kernels, function_registry_math_ops.cc + LLVM if-else codegen):
    * nullif manufactures NULLs from the fixture, coalesce/greatest/
    * least/CASE consume them. Spark's greatest/least skip NULLs
    * (return the greatest non-NULL); DuckDB 1.x matches. */
  def qConditionalFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")),
          lit("URGENT!")).as("prio_or_flag"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floored"),
        least(col("o_orderkey") % 500, col("o_custkey")).as("smaller_key"),
        when(col("o_totalprice") > 200000.0, lit("big"))
          .when(col("o_totalprice") > 100000.0, lit("mid"))
          .otherwise(lit("small")).as("bucket"))
      .orderBy(col("o_orderkey"))

  val qConditionalFuncsSql: String = """
    SELECT o_orderkey,
      COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_or_flag,
      GREATEST(o_totalprice, 100000.0) AS floored,
      LEAST(o_orderkey % 500, o_custkey) AS smaller_key,
      CASE WHEN o_totalprice > 200000.0 THEN 'big'
           WHEN o_totalprice > 100000.0 THEN 'mid'
           ELSE 'small' END AS bucket
    FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
  """.trim

  /** Third string-registry tier (Gandiva function_registry_string.cc
    * remainder): position search (instr/strpos), token extraction
    * (substring_index), binary↔text codecs (base64 round-trip, hex),
    * printf-style formatting, byte length, edit distance. */
  def qStringFuncs3(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{base64, format_string, hex, instr, levenshtein, lower, octet_length, substring_index, unbase64}
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        instr(col("c_name"), "#").as("pos_hash"),
        substring_index(col("c_name"), "#", 1).as("before_hash"),
        base64(col("c_name").cast(BinaryType)).as("b64"),
        (unbase64(base64(col("c_name").cast(BinaryType))).cast(StringType)
          === col("c_name")).as("b64_roundtrip"),
        hex(col("c_name").cast(BinaryType)).as("hexed"),
        format_string("%.2f", col("c_acctbal")).as("bal_fmt"),
        octet_length(col("c_name")).cast(LongType).as("olen"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("lev"),
        // Gandiva convert_toUTF8/convert_fromUTF8: text → UTF-8 bytes
        // → text, byte-preserving
        gf.convert_fromUTF8(gf.convert_toUTF8(col("c_mktsegment")))
          .as("utf8_rt"))
      .orderBy(col("c_custkey"))
  }

  val qStringFuncs3Sql: String = """
    SELECT c_custkey,
      CAST(strpos(c_name, '#') AS INT) AS pos_hash,
      split_part(c_name, '#', 1) AS before_hash,
      base64(CAST(c_name AS BLOB)) AS b64,
      CAST(from_base64(base64(CAST(c_name AS BLOB))) AS VARCHAR) = c_name AS b64_roundtrip,
      hex(c_name) AS hexed,
      printf('%.2f', c_acctbal) AS bal_fmt,
      octet_length(CAST(c_name AS BLOB)) AS olen,
      CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev,
      decode(CAST(c_mktsegment AS BLOB)) AS utf8_rt
    FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey
  """.trim

  /** Calendar-arithmetic registry (Gandiva
    * function_registry_datetime.cc last_day/next_day/add_months
    * lineage): everything on DATE after one explicit cast so both
    * engines do date—not timestamp—arithmetic. next_day has no DuckDB
    * builtin; the oracle derives it from ISO day-of-week. */
  def qDateFuncs2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{add_months, date_add, date_format, date_sub, datediff, last_day, make_date, months_between, next_day, to_date, trunc, year}
    val d = to_date(col("o_orderdate"))
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 200 === 0)
      .select(
        col("o_orderkey"),
        last_day(d).as("month_end"),
        next_day(d, "Mon").as("next_monday"),
        add_months(d, 2).as("plus_2m"),
        months_between(trunc(d, "MM"), to_date(lit("1995-01-01")))
          .as("months_since"),
        date_add(d, 30).as("plus30"),
        date_sub(d, 30).as("minus30"),
        datediff(d, to_date(lit("1995-01-01"))).as("days_since"),
        make_date(year(d), month(d), lit(1)).as("month_start"),
        date_format(d, "EEEE").as("dname"))
      .orderBy(col("o_orderkey"))
  }

  val qDateFuncs2Sql: String = """
    WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders
               WHERE o_orderkey % 200 = 0)
    SELECT o_orderkey,
      last_day(d) AS month_end,
      d + to_days((CAST(7 - isodow(d) AS INT) % 7) + 1) AS next_monday,
      d + INTERVAL 2 MONTH AS plus_2m,
      CAST(datediff('month', DATE '1995-01-01', date_trunc('month', d)) AS DOUBLE) AS months_since,
      d + to_days(30) AS plus30,
      d - to_days(30) AS minus30,
      CAST(datediff('day', DATE '1995-01-01', d) AS INT) AS days_since,
      make_date(CAST(EXTRACT(YEAR FROM d) AS INT), CAST(EXTRACT(MONTH FROM d) AS INT), 1) AS month_start,
      dayname(d) AS dname
    FROM o ORDER BY o_orderkey
  """.trim

  /** Bitwise scalar registry (CK `boolean.cc` + Gandiva bitwise
    * kernels): shifts, and/or/xor/not on int64 — pure codegen'd
    * integer ops. */
  def qBitwiseFuncs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{bitwise_not, shiftleft, shiftright}
    t(s, dir, "customer")
      .filter(col("c_custkey") <= 400)
      .select(
        col("c_custkey"),
        shiftleft(col("c_custkey"), 3).as("shl"),
        shiftright(col("c_custkey"), 2).as("shr"),
        col("c_custkey").bitwiseAND(lit(255L)).as("band"),
        col("c_custkey").bitwiseOR(lit(4096L)).as("bor"),
        col("c_custkey").bitwiseXOR(lit(1023L)).as("bxor"),
        bitwise_not(col("c_custkey")).as("bnot"))
      .orderBy(col("c_custkey"))
  }

  val qBitwiseFuncsSql: String = """
    SELECT c_custkey,
      c_custkey << 3 AS shl, c_custkey >> 2 AS shr,
      c_custkey & 255 AS band, c_custkey | 4096 AS bor,
      xor(c_custkey, 1023) AS bxor, ~c_custkey AS bnot
    FROM customer WHERE c_custkey <= 400 ORDER BY c_custkey
  """.trim

  /** Struct (nested record) surface — the reference's STRUCT type
    * (`cpp/src/arrow/type.h:116` StructType): build a nested struct,
    * read fields back out, and carry the whole struct through a
    * parquet sink so the nested schema round-trips. */
  def qStructFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .select(
        col("s_suppkey"),
        struct(
          col("s_name").as("name"),
          col("s_nationkey").as("nation"),
          struct(col("s_acctbal").as("bal")).as("acct")).as("info"))
      .withColumn("info_name", col("info.name"))
      .withColumn("info_bal", col("info.acct.bal"))
      // Output boundary: the nested struct is re-read field-by-field
      // into a pinned-format string (the harness compare sorts by
      // column values, which nested types break) — the struct build +
      // nested field access is still the exercised surface.
      .select(col("s_suppkey"),
        concat_ws("|", col("info.name"), col("info.nation"),
          col("info.acct.bal").cast(StringType)).as("info_repr"),
        col("info_name"), col("info_bal"))
      .orderBy(col("s_suppkey"))

  val qStructFuncsSql: String = """
    WITH b AS (
      SELECT s_suppkey,
        {'name': s_name, 'nation': s_nationkey,
         'acct': {'bal': s_acctbal}} AS info
      FROM supplier)
    SELECT s_suppkey,
      info.name || '|' || CAST(info.nation AS VARCHAR)
        || '|' || CAST(info.acct.bal AS VARCHAR) AS info_repr,
      info.name AS info_name, info.acct.bal AS info_bal
    FROM b ORDER BY s_suppkey
  """.trim

  /** Error-SAFE scalar surface — `try_divide` / `try_cast` return
    * NULL where the strict forms raise (ANSI) or silently wrap
    * (legacy): the semantics a 100 TB pipeline wants, where one
    * malformed row must not kill a stage NOR corrupt an aggregate.
    * Plus `width_bucket`, the SQL histogram-binning primitive (the
    * oracle emulates it with floor arithmetic — DuckDB lacks it —
    * including both out-of-range edge buckets 0 and n+1). The /0 rows
    * (l_linenumber = 3) and the unparsable casts (l_returnflag) are
    * genuine NULL paths, not dead branches. */
  def qSafeMath(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        try_divide(col("l_quantity"), col("l_linenumber") - 3).as("safe_div"),
        expr("try_cast(l_returnflag AS INT)").as("not_a_number"),
        expr("try_cast(cast(l_linenumber AS STRING) AS INT)").as("roundtrip_int"),
        width_bucket(col("l_quantity"), lit(0), lit(50), lit(10)).as("qty_bucket"))
      .orderBy("l_orderkey", "l_linenumber")

  val qSafeMathSql: String = """
    SELECT l_orderkey, l_linenumber,
      CASE WHEN l_linenumber - 3 = 0 THEN NULL
           ELSE CAST(l_quantity / (l_linenumber - 3) AS DOUBLE) END AS safe_div,
      TRY_CAST(l_returnflag AS INT) AS not_a_number,
      TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS roundtrip_int,
      CASE WHEN l_quantity < 0 THEN 0 WHEN l_quantity >= 50 THEN 11
           ELSE CAST(FLOOR(l_quantity / 5) + 1 AS BIGINT) END AS qty_bucket
    FROM lineitem WHERE l_orderkey % 500 = 0
    ORDER BY l_orderkey, l_linenumber
  """.trim
}
