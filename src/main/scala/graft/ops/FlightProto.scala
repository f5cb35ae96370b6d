package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

/** Hand-rolled protobuf wire codec for the Arrow Flight message set
  * (reference `format/Flight.proto` — field numbers and types below
  * are that public schema verbatim). The environment ships gRPC
  * (shaded inside the Spark distribution's connect module) but no
  * protoc and no arrow-flight jar, so the ~14 Flight messages are
  * encoded/decoded directly against the protobuf wire format:
  * varints, `(field << 3) | wireType` tags, length-delimited
  * submessages. Proto3 rules: scalar fields at their default value
  * are omitted on write and defaulted on read; unknown fields are
  * skipped by wire type (forward compatibility with newer clients —
  * e.g. `FlightDescriptor.cmd` arriving alongside fields this codec
  * does not model); submessage fields are always written when
  * present (proto3 message presence is explicit).
  *
  * [[FlightProtoSpec]] pins golden bytes for every message and
  * cross-checks the codec against pyarrow's stock Flight client via
  * the gRPC loopback in [[FlightGrpcSpec]].
  */
object FlightProto {

  private val Empty = Array.emptyByteArray

  // ---- wire primitives ---------------------------------------------------

  /** Append-only protobuf writer (wire types 0 and 2 — the only ones
    * the Flight schema uses). */
  final class PWriter {
    private val out = new java.io.ByteArrayOutputStream(64)
    def toBytes: Array[Byte] = out.toByteArray

    private def varintRaw(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wire: Int): Unit =
      varintRaw((field.toLong << 3) | wire)

    /** proto3 scalar: omitted at 0. */
    def uint64(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); varintRaw(v) }
    /** proto3 enum: same wire shape as uint64. */
    def enum(field: Int, v: Int): Unit = uint64(field, v.toLong)
    /** proto3 bytes: omitted when empty. */
    def bytes(field: Int, b: Array[Byte]): Unit =
      if (b != null && b.length > 0) { tag(field, 2); varintRaw(b.length.toLong); out.write(b, 0, b.length) }
    def string(field: Int, s: String): Unit =
      if (s != null && s.nonEmpty) bytes(field, s.getBytes(UTF_8))
    /** Submessage: presence is explicit in proto3, so an EMPTY body is
      * still written as a zero-length field. */
    def message(field: Int, body: Array[Byte]): Unit = {
      tag(field, 2); varintRaw(body.length.toLong); out.write(body, 0, body.length)
    }
  }

  /** Cursor-based protobuf reader over one message's bytes. */
  final class PReader(buf: Array[Byte], start: Int, end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    private var pos = start
    def hasNext: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        if (pos >= end) throw new java.io.EOFException("truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new java.io.IOException("varint overflow")
      }
      v // unreachable
    }
    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 0x7).toInt)
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      if (n < 0 || pos + n > end) throw new java.io.IOException(
        s"length-delimited field of $n bytes overruns message (${end - pos} left)")
      val b = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; b
    }
    def readString(): String = new String(readBytes(), UTF_8)
    def skip(wire: Int): Unit = wire match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val n = readVarint().toInt; pos += n
      case 5 => pos += 4
      case w => throw new java.io.IOException(s"unsupported wire type $w")
    }
  }

  // ---- messages (Flight.proto field numbers) -------------------------------

  /** HandshakeRequest/Response: uint64 protocol_version = 1; bytes payload = 2. */
  final case class Handshake(protocolVersion: Long = 0L,
      payload: Array[Byte] = Empty) {
    def encode: Array[Byte] = {
      val w = new PWriter; w.uint64(1, protocolVersion); w.bytes(2, payload); w.toBytes
    }
  }
  object Handshake {
    def decode(b: Array[Byte]): Handshake = {
      val r = new PReader(b); var v = 0L; var p = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 0) => v = r.readVarint()
        case (2, 2) => p = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Handshake(v, p)
    }
  }

  /** BasicAuth (Flight.proto): string username = 2; string password = 3 —
    * what a stock client's `authenticate_basic_token` conveys via the
    * `authorization: Basic` header, and what a handshake payload may carry. */
  final case class BasicAuth(username: String = "", password: String = "") {
    def encode: Array[Byte] = {
      val w = new PWriter; w.string(2, username); w.string(3, password); w.toBytes
    }
  }
  object BasicAuth {
    def decode(b: Array[Byte]): BasicAuth = {
      val r = new PReader(b); var u = ""; var p = ""
      while (r.hasNext) r.readTag() match {
        case (2, 2) => u = r.readString()
        case (3, 2) => p = r.readString()
        case (_, w) => r.skip(w)
      }
      BasicAuth(u, p)
    }
  }

  /** Criteria: bytes expression = 1. */
  final case class Criteria(expression: Array[Byte] = Empty) {
    def encode: Array[Byte] = { val w = new PWriter; w.bytes(1, expression); w.toBytes }
  }
  object Criteria {
    def decode(b: Array[Byte]): Criteria = {
      val r = new PReader(b); var e = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => e = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Criteria(e)
    }
  }

  /** Action: string type = 1; bytes body = 2. */
  final case class Action(actionType: String = "", body: Array[Byte] = Empty) {
    def encode: Array[Byte] = {
      val w = new PWriter; w.string(1, actionType); w.bytes(2, body); w.toBytes
    }
  }
  object Action {
    def decode(b: Array[Byte]): Action = {
      val r = new PReader(b); var t = ""; var bd = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = r.readString()
        case (2, 2) => bd = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Action(t, bd)
    }
  }

  /** Result: bytes body = 1. */
  final case class ActionResult(body: Array[Byte] = Empty) {
    def encode: Array[Byte] = { val w = new PWriter; w.bytes(1, body); w.toBytes }
    def bodyUtf8: String = new String(body, UTF_8)
  }
  object ActionResult {
    def decode(b: Array[Byte]): ActionResult = {
      val r = new PReader(b); var bd = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => bd = r.readBytes()
        case (_, w) => r.skip(w)
      }
      ActionResult(bd)
    }
  }

  /** ActionType: string type = 1; string description = 2. */
  final case class ActionType(actionType: String = "", description: String = "") {
    def encode: Array[Byte] = {
      val w = new PWriter; w.string(1, actionType); w.string(2, description); w.toBytes
    }
  }
  object ActionType {
    def decode(b: Array[Byte]): ActionType = {
      val r = new PReader(b); var t = ""; var d = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = r.readString()
        case (2, 2) => d = r.readString()
        case (_, w) => r.skip(w)
      }
      ActionType(t, d)
    }
  }

  /** SchemaResult: bytes schema = 1 (IPC-encapsulated Schema message,
    * WITH the 8-byte continuation+length prefix — the form stock
    * clients deserialize). */
  final case class SchemaResult(schema: Array[Byte] = Empty) {
    def encode: Array[Byte] = { val w = new PWriter; w.bytes(1, schema); w.toBytes }
  }
  object SchemaResult {
    def decode(b: Array[Byte]): SchemaResult = {
      val r = new PReader(b); var s = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => s = r.readBytes()
        case (_, w) => r.skip(w)
      }
      SchemaResult(s)
    }
  }

  /** FlightDescriptor: DescriptorType type = 1 (0 UNKNOWN / 1 PATH /
    * 2 CMD); bytes cmd = 2; repeated string path = 3. */
  final case class FlightDescriptor(descType: Int = 0, cmd: Array[Byte] = Empty,
      path: Seq[String] = Nil) {
    def encode: Array[Byte] = {
      val w = new PWriter
      w.enum(1, descType); w.bytes(2, cmd); path.foreach(w.string(3, _))
      w.toBytes
    }
    def cmdUtf8: String = new String(cmd, UTF_8)
  }
  object FlightDescriptor {
    val PATH = 1
    val CMD = 2
    def forPath(p: String*): FlightDescriptor = FlightDescriptor(PATH, Empty, p)
    def forCmd(c: String): FlightDescriptor =
      FlightDescriptor(CMD, c.getBytes(UTF_8), Nil)
    def decode(b: Array[Byte]): FlightDescriptor = {
      val r = new PReader(b); var t = 0; var c = Empty
      val p = Seq.newBuilder[String]
      while (r.hasNext) r.readTag() match {
        case (1, 0) => t = r.readVarint().toInt
        case (2, 2) => c = r.readBytes()
        case (3, 2) => p += r.readString()
        case (_, w) => r.skip(w)
      }
      FlightDescriptor(t, c, p.result())
    }
  }

  /** Ticket: bytes ticket = 1. */
  final case class Ticket(ticket: Array[Byte] = Empty) {
    def encode: Array[Byte] = { val w = new PWriter; w.bytes(1, ticket); w.toBytes }
    def utf8: String = new String(ticket, UTF_8)
  }
  object Ticket {
    def of(s: String): Ticket = Ticket(s.getBytes(UTF_8))
    def decode(b: Array[Byte]): Ticket = {
      val r = new PReader(b); var t = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = r.readBytes()
        case (_, w) => r.skip(w)
      }
      Ticket(t)
    }
  }

  /** Location: string uri = 1. */
  final case class Location(uri: String = "") {
    def encode: Array[Byte] = { val w = new PWriter; w.string(1, uri); w.toBytes }
  }
  object Location {
    def decode(b: Array[Byte]): Location = {
      val r = new PReader(b); var u = ""
      while (r.hasNext) r.readTag() match {
        case (1, 2) => u = r.readString()
        case (_, w) => r.skip(w)
      }
      Location(u)
    }
  }

  /** FlightEndpoint: Ticket ticket = 1; repeated Location location = 2. */
  final case class FlightEndpoint(ticket: Ticket = Ticket(),
      locations: Seq[Location] = Nil) {
    def encode: Array[Byte] = {
      val w = new PWriter
      w.message(1, ticket.encode)
      locations.foreach(l => w.message(2, l.encode))
      w.toBytes
    }
  }
  object FlightEndpoint {
    def decode(b: Array[Byte]): FlightEndpoint = {
      val r = new PReader(b); var t = Ticket()
      val ls = Seq.newBuilder[Location]
      while (r.hasNext) r.readTag() match {
        case (1, 2) => t = Ticket.decode(r.readBytes())
        case (2, 2) => ls += Location.decode(r.readBytes())
        case (_, w) => r.skip(w)
      }
      FlightEndpoint(t, ls.result())
    }
  }

  /** FlightInfo: bytes schema = 1 (prefixed IPC form, like
    * [[SchemaResult]]); FlightDescriptor flight_descriptor = 2;
    * repeated FlightEndpoint endpoint = 3; int64 total_records = 4;
    * int64 total_bytes = 5. */
  final case class FlightInfo(schema: Array[Byte] = Empty,
      descriptor: Option[FlightDescriptor] = None,
      endpoints: Seq[FlightEndpoint] = Nil,
      totalRecords: Long = 0L, totalBytes: Long = 0L) {
    def encode: Array[Byte] = {
      val w = new PWriter
      w.bytes(1, schema)
      descriptor.foreach(d => w.message(2, d.encode))
      endpoints.foreach(e => w.message(3, e.encode))
      // int64 on the wire is the varint of the two's-complement value;
      // -1 (unknown count) must round-trip, so write even when negative
      if (totalRecords != 0L) { w.uint64(4, totalRecords) }
      if (totalBytes != 0L) { w.uint64(5, totalBytes) }
      w.toBytes
    }
  }
  object FlightInfo {
    def decode(b: Array[Byte]): FlightInfo = {
      val r = new PReader(b); var s = Empty
      var d: Option[FlightDescriptor] = None
      val es = Seq.newBuilder[FlightEndpoint]
      var tr = 0L; var tb = 0L
      while (r.hasNext) r.readTag() match {
        case (1, 2) => s = r.readBytes()
        case (2, 2) => d = Some(FlightDescriptor.decode(r.readBytes()))
        case (3, 2) => es += FlightEndpoint.decode(r.readBytes())
        case (4, 0) => tr = r.readVarint()
        case (5, 0) => tb = r.readVarint()
        case (_, w) => r.skip(w)
      }
      FlightInfo(s, d, es.result(), tr, tb)
    }
  }

  /** FlightData: FlightDescriptor flight_descriptor = 1; bytes
    * data_header = 2; bytes app_metadata = 3; bytes data_body = 1000. */
  final case class FlightData(descriptor: Option[FlightDescriptor] = None,
      dataHeader: Array[Byte] = Empty, appMetadata: Array[Byte] = Empty,
      dataBody: Array[Byte] = Empty) {
    def encode: Array[Byte] = {
      val w = new PWriter
      descriptor.foreach(d => w.message(1, d.encode))
      w.bytes(2, dataHeader); w.bytes(3, appMetadata); w.bytes(1000, dataBody)
      w.toBytes
    }
  }
  object FlightData {
    def decode(b: Array[Byte]): FlightData = {
      val r = new PReader(b)
      var d: Option[FlightDescriptor] = None
      var h = Empty; var m = Empty; var body = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2)    => d = Some(FlightDescriptor.decode(r.readBytes()))
        case (2, 2)    => h = r.readBytes()
        case (3, 2)    => m = r.readBytes()
        case (1000, 2) => body = r.readBytes()
        case (_, w)    => r.skip(w)
      }
      FlightData(d, h, m, body)
    }
  }

  /** PutResult: bytes app_metadata = 1. */
  final case class PutResult(appMetadata: Array[Byte] = Empty) {
    def encode: Array[Byte] = { val w = new PWriter; w.bytes(1, appMetadata); w.toBytes }
    def utf8: String = new String(appMetadata, UTF_8)
  }
  object PutResult {
    def of(s: String): PutResult = PutResult(s.getBytes(UTF_8))
    def decode(b: Array[Byte]): PutResult = {
      val r = new PReader(b); var m = Empty
      while (r.hasNext) r.readTag() match {
        case (1, 2) => m = r.readBytes()
        case (_, w) => r.skip(w)
      }
      PutResult(m)
    }
  }

  /** google.protobuf.Empty / Flight's own empty request shells. */
  final case class EmptyMsg() {
    def encode: Array[Byte] = Empty
  }
  object EmptyMsg {
    def decode(@annotation.unused b: Array[Byte]): EmptyMsg = EmptyMsg()
  }
}
