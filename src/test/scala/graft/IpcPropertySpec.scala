package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Ipc

/** Randomized round-trip property over the graft-ipc STREAM codec —
  * the analogue of the reference's IPC fuzz targets (`cpp/ci` fuzzing,
  * SURVEY §5): seeded random schemas over all nine wire types ×
  * random nullability × random values including the adversarial edge
  * set (extremes, NaN/±Inf bit patterns, empty/‟weird" strings,
  * empty binaries, zero-row batches, multi-batch row counts), every
  * trial asserting write→read bit-fidelity. Seeded, so a failure
  * reproduces; no Spark jobs — this exercises the codec itself.
  */
class IpcPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private val types: Seq[DataType] = Seq(LongType, IntegerType, DoubleType,
    FloatType, StringType, BooleanType, BinaryType, DateType, TimestampType)

  private def randValue(dt: DataType): Any = dt match {
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
    case BooleanType => rnd.nextBoolean()
    case BinaryType =>
      val b = new Array[Byte](rnd.nextInt(24)); rnd.nextBytes(b); b
    case DateType => new Date(rnd.nextInt(30000).toLong * 86400000L)
    case TimestampType =>
      val t = new Timestamp(math.abs(rnd.nextLong()) % 4102444800000L)
      t.setNanos((rnd.nextInt(1000000)) * 1000) // µs precision only
      t
  }

  private def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y)
    case (x, y) => x == y
  }

  test("stream codec round-trips 60 random schemas bit-exactly (incl. zero rows, multi-batch)") {
    for (trial <- 0 until 60) {
      val nCols = 1 + rnd.nextInt(6)
      val schema = StructType((0 until nCols).map { i =>
        StructField(s"c$i", types(rnd.nextInt(types.length)), nullable = true)
      })
      // bias row counts to the interesting spots: 0, 1, batch edge ±1, multi-batch
      val nRows = rnd.nextInt(5) match {
        case 0 => 0
        case 1 => 1
        case 2 => Ipc.BatchRows - 1 + rnd.nextInt(3)
        case 3 => Ipc.BatchRows + 1 + rnd.nextInt(100)
        case _ => rnd.nextInt(200)
      }
      val rows = (0 until nRows).map { _ =>
        Row.fromSeq(schema.fields.map(f =>
          if (rnd.nextInt(5) == 0) null else randValue(f.dataType)).toSeq)
      }
      val bytes = Ipc.writeIpcStream(rows, schema)
      val (back, backSchema) = Ipc.readIpcStream(bytes)
      assert(backSchema.map(_.dataType) == schema.map(_.dataType),
        s"trial $trial: schema changed: $schema -> $backSchema")
      assert(back.length == rows.length, s"trial $trial: ${rows.length} -> ${back.length} rows")
      for (r <- rows.indices; c <- 0 until nCols) {
        assert(sameValue(rows(r).get(c), back(r).get(c)),
          s"trial $trial row $r col $c (${schema(c).dataType}): " +
            s"${rows(r).get(c)} -> ${back(r).get(c)}")
      }
    }
  }
}
