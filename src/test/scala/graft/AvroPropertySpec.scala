package graft

import graft.ops.Avro

/** Randomized round-trip property over the Avro container codec —
  * same seeded generator as IpcPropertySpec ([[RoundTripGen]]), run
  * against the in-memory byte codec (identical value mapping to the
  * distributed file paths): random schemas over the nine wire types,
  * adversarial values (NaN/±Inf bit patterns, extremes, multi-byte
  * and control-char strings, empty binaries), zero-row containers.
  */
class AvroPropertySpec extends SparkSpec with RoundTripGen {

  protected val rnd = new scala.util.Random(20260813L)

  test("avro codec round-trips 60 random schemas bit-exactly (incl. zero rows)") {
    for (trial <- 0 until 60) {
      val schema = randSchema(6)
      val nRows = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => 1
        case _ => rnd.nextInt(300)
      }
      val rows = randRows(schema, nRows)
      val bytes = Avro.writeAvroBytes(rows, schema)
      val (back, backSchema) = Avro.readAvroBytes(bytes)
      assertSameRows(trial, schema, rows, back, backSchema)
    }
  }
}
