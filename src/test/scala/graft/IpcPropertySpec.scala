package graft

import org.apache.spark.sql.types._

import graft.ops.Ipc

/** Randomized round-trip property over the graft-ipc STREAM codec —
  * the analogue of the reference's IPC fuzz targets (`cpp/ci` fuzzing,
  * SURVEY §5): seeded random schemas over all nine wire types ×
  * random nullability × random values including the adversarial edge
  * set, every trial asserting write→read bit-fidelity. Seeded, so a
  * failure reproduces; no Spark jobs — this exercises the codec
  * itself. Generator shared with AvroPropertySpec ([[RoundTripGen]]).
  */
class IpcPropertySpec extends SparkSpec with RoundTripGen {

  protected val rnd = new scala.util.Random(20260812L)

  // the IPC codec carries the full ladder (tinyint/smallint, NTZ
  // timestamp, TIME, both ANSI intervals) on top of the nine shared
  // wire types — fuzz over all of them
  override protected def wireTypes: Seq[DataType] =
    super.wireTypes ++ extendedWireTypes

  test("stream codec round-trips 60 random schemas bit-exactly (incl. zero rows, multi-batch)") {
    for (trial <- 0 until 60) {
      val schema = randSchema(6)
      // bias row counts to the interesting spots: 0, 1, batch edge ±1, multi-batch
      val nRows = rnd.nextInt(5) match {
        case 0 => 0
        case 1 => 1
        case 2 => Ipc.BatchRows - 1 + rnd.nextInt(3)
        case 3 => Ipc.BatchRows + 1 + rnd.nextInt(100)
        case _ => rnd.nextInt(200)
      }
      val rows = randRows(schema, nRows)
      val bytes = Ipc.writeIpcStream(rows, schema)
      val (back, backSchema) = Ipc.readIpcStream(bytes)
      assertSameRows(trial, schema, rows, back, backSchema)
    }
  }

  test("stream codec round-trips 40 random NESTED schemas (list/struct/map/decimal, depth ≤ 2)") {
    for (trial <- 0 until 40) {
      val schema = randNestedSchema(4, 2)
      val nRows = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => Ipc.BatchRows - 1 + rnd.nextInt(3)
        case _ => rnd.nextInt(120)
      }
      val rows = randRows(schema, nRows)
      val bytes = Ipc.writeIpcStream(rows, schema)
      val (back, backSchema) = Ipc.readIpcStream(bytes)
      assertSameRows(trial, schema, rows, back, backSchema)
    }
  }
}
