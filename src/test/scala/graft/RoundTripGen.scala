package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Shared generator for the seeded round-trip property suites
  * (IpcPropertySpec, AvroPropertySpec): random schemas over the nine
  * wire types × random values including the adversarial edge set
  * (extremes, NaN/±Inf bit patterns, empty/multi-byte strings, empty
  * binaries). Each suite owns its seed so failures reproduce.
  */
trait RoundTripGen {

  protected def rnd: scala.util.Random

  protected def wireTypes: Seq[DataType] = Seq(LongType, IntegerType,
    DoubleType, FloatType, StringType, BooleanType, BinaryType, DateType,
    TimestampType)

  /** The wider ladder the IPC codec also carries (Avro does not):
    * tinyint/smallint, zoneless timestamp, TIME, and both ANSI
    * intervals. Suites that support them override [[wireTypes]] with
    * `super.wireTypes ++ extendedWireTypes`. */
  protected def extendedWireTypes: Seq[DataType] = Seq(ByteType, ShortType,
    TimestampNTZType, TimeType(TimeType.MICROS_PRECISION),
    DayTimeIntervalType(), YearMonthIntervalType())

  protected def randValue(dt: DataType): Any = dt match {
    case LongType => rnd.nextInt(5) match {
      case 0 => Long.MinValue
      case 1 => Long.MaxValue
      case _ => rnd.nextLong()
    }
    case IntegerType => rnd.nextInt(5) match {
      case 0 => Int.MinValue
      case 1 => Int.MaxValue
      case _ => rnd.nextInt()
    }
    case DoubleType => rnd.nextInt(7) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => -0.0
      case _ => rnd.nextDouble() * math.pow(10, rnd.nextInt(300) - 150)
    }
    case FloatType => rnd.nextInt(6) match {
      case 0 => Float.NaN
      case 1 => Float.MinPositiveValue
      case _ => rnd.nextFloat() * 1e6f
    }
    case StringType => rnd.nextInt(5) match {
      case 0 => ""
      case 1 => "héllo é世界" // multi-byte UTF-8
      case 2 => "line\nbreak\ttab\"quote"
      case _ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
    }
    case ByteType => rnd.nextInt(3) match {
      case 0 => Byte.MinValue
      case 1 => Byte.MaxValue
      case _ => rnd.nextInt().toByte
    }
    case ShortType => rnd.nextInt(3) match {
      case 0 => Short.MinValue
      case 1 => Short.MaxValue
      case _ => rnd.nextInt().toShort
    }
    case TimestampNTZType => // µs precision, pre- and post-epoch
      java.time.LocalDateTime.ofEpochSecond(
        rnd.nextLong() % 4102444800L, rnd.nextInt(1000000) * 1000,
        java.time.ZoneOffset.UTC)
    case _: TimeType => // µs-aligned nanos-of-day (TIME(6) ceiling)
      java.time.LocalTime.ofNanoOfDay(
        (math.abs(rnd.nextLong()) % 86400000000L) * 1000L)
    case _: DayTimeIntervalType => // µs-precision, both signs
      java.time.Duration.ofSeconds(
        rnd.nextLong() % 8640000000L, rnd.nextInt(1000000).toLong * 1000L)
    case _: YearMonthIntervalType =>
      java.time.Period.ofMonths(rnd.nextInt(100000) - 50000).normalized()
    case BooleanType => rnd.nextBoolean()
    case BinaryType =>
      val b = new Array[Byte](rnd.nextInt(24)); rnd.nextBytes(b); b
    case DateType => // incl. pre-epoch (negative epoch-day) dates
      new Date((rnd.nextInt(60000) - 25000).toLong * 86400000L)
    case TimestampType =>
      // pre-epoch timestamps exercise the floorDiv/floorMod µs math
      val t = new Timestamp(
        math.abs(rnd.nextLong()) % 8204889600000L - 4102444800000L)
      t.setNanos((rnd.nextInt(1000000)) * 1000) // µs precision only
      t
    case d: DecimalType => // unscaled fits any precision ≥ 10
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(rnd.nextLong() % 1000000000L), d.scale)
    case ArrayType(et, _) =>
      (0 until rnd.nextInt(5)).map(_ =>
        if (rnd.nextInt(5) == 0) null else randValue(et))
    case st: StructType =>
      Row.fromSeq(st.fields.map(f =>
        if (rnd.nextInt(5) == 0) null else randValue(f.dataType)).toSeq)
    case MapType(kt, vt, _) =>
      (0 until rnd.nextInt(4)).map(_ => randValue(kt) ->
        (if (rnd.nextInt(5) == 0) null else randValue(vt))).toMap
  }

  protected def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x == y // scale-exact
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      x.length == y.length &&
        x.iterator.zip(y.iterator).forall { case (u, v) => sameValue(u, v) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.size == y.size && x.forall { case (k, v) =>
        val ym = y.asInstanceOf[scala.collection.Map[Any, Any]]
        ym.contains(k) && sameValue(v, ym(k))
      }
    case (x: Row, y: Row) =>
      x.length == y.length &&
        (0 until x.length).forall(i => sameValue(x.get(i), y.get(i)))
    case (x: java.time.Period, y: java.time.Period) =>
      // YEAR_MONTH intervals are a months count on the wire; engines
      // may normalize the Period differently on the way out
      x.toTotalMonths == y.toTotalMonths
    case (x, y) => x == y
  }

  protected def randSchema(maxCols: Int): StructType =
    StructType((0 until (1 + rnd.nextInt(maxCols))).map { i =>
      StructField(s"c$i", wireTypes(rnd.nextInt(wireTypes.length)),
        nullable = true)
    })

  /** Random possibly-nested type: list/struct/map over the wire leaves
    * + decimal, bounded depth. Map keys stay string/long (non-null,
    * hashable across engines). */
  protected def randNestedType(depth: Int): DataType =
    if (depth <= 0 || rnd.nextInt(3) > 0) rnd.nextInt(11) match {
      case 9  => DecimalType(14, 2)
      case 10 => DecimalType(38, 9)
      case i  => wireTypes(i)
    }
    else rnd.nextInt(3) match {
      case 0 => ArrayType(randNestedType(depth - 1), containsNull = true)
      case 1 => StructType((0 until 1 + rnd.nextInt(3)).map(i =>
        StructField(s"f$i", randNestedType(depth - 1), nullable = true)))
      case _ => MapType(if (rnd.nextBoolean()) StringType else LongType,
        randNestedType(depth - 1), valueContainsNull = true)
    }

  protected def randNestedSchema(maxCols: Int, depth: Int): StructType =
    StructType((0 until (1 + rnd.nextInt(maxCols))).map { i =>
      StructField(s"c$i", randNestedType(depth), nullable = true)
    })

  protected def randRows(schema: StructType, nRows: Int): Seq[Row] =
    (0 until nRows).map { _ =>
      Row.fromSeq(schema.fields.map(f =>
        if (rnd.nextInt(5) == 0) null else randValue(f.dataType)).toSeq)
    }

  protected def assertSameRows(trial: Int, schema: StructType,
      rows: Seq[Row], back: Seq[Row], backSchema: StructType): Unit = {
    assert(backSchema.map(_.dataType) == schema.map(_.dataType),
      s"trial $trial: schema changed: $schema -> $backSchema")
    assert(back.length == rows.length,
      s"trial $trial: ${rows.length} -> ${back.length} rows")
    for (r <- rows.indices; c <- 0 until schema.length) {
      assert(sameValue(rows(r).get(c), back(r).get(c)),
        s"trial $trial row $r col $c (${schema(c).dataType}): " +
          s"${rows(r).get(c)} -> ${back(r).get(c)}")
    }
  }
}
