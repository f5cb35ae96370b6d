package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.FlightLite

/** Wire-protocol round trips for the Flight-style socket endpoint
  * (reference `format/Flight.proto:38-105`). */
class FlightLiteSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("i", IntegerType),
    StructField("d", DoubleType), StructField("f", FloatType),
    StructField("s", StringType), StructField("b", BooleanType),
    StructField("bin", BinaryType), StructField("dt", DateType),
    StructField("ts", TimestampType)))
  private val rows = Seq(
    Row(1L, 7, 1.5, 2.5f, "alpha", true, Array[Byte](1, 2),
      Date.valueOf("2024-01-02"), Timestamp.valueOf("2024-01-02 03:04:05")),
    Row(2L, null, null, null, null, null, null, null, null),
    Row(3L, -7, -0.25, 0.5f, "βeta", false, Array[Byte](),
      Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59")))

  test("DoPut registers a view; DoGet by name returns it bit-identical " +
      "across all nine wire types") {
    val server = new FlightLite.Server(spark).start()
    try {
      val n = FlightLite.doPut("127.0.0.1", server.boundPort, "fl_types",
        rows, schema)
      assert(n === 3)
      val (got, gotSchema) =
        FlightLite.doGet("127.0.0.1", server.boundPort, "fl_types")
      assert(gotSchema.map(f => (f.name, f.dataType)) ===
        schema.map(f => (f.name, f.dataType)))
      val key = (r: Row) => r.getLong(0)
      val exp = rows.sortBy(key)
      val act = got.sortBy(key)
      // binary columns need content equality, not array reference eq
      (exp zip act).foreach { case (e, a) =>
        (0 until schema.length).foreach { c =>
          (e.get(c), a.get(c)) match {
            case (x: Array[Byte], y: Array[Byte]) => assert(x.sameElements(y))
            case (x, y) => assert(x === y, s"col ${schema(c).name}")
          }
        }
      }
    } finally server.close()
  }

  test("DoGet with a SQL ticket executes the query; GetSchema resolves " +
      "without executing; ListFlights names the uploaded view") {
    val server = new FlightLite.Server(spark).start()
    try {
      FlightLite.doPut("127.0.0.1", server.boundPort, "fl_sql", rows, schema)
      assert(FlightLite.listFlights("127.0.0.1", server.boundPort)
        .contains("fl_sql"))
      val st = FlightLite.getSchema("127.0.0.1", server.boundPort,
        "SELECT id, s FROM fl_sql WHERE b = true")
      assert(st.fieldNames.toSeq === Seq("id", "s"))
      val (got, _) = FlightLite.doGet("127.0.0.1", server.boundPort,
        "SELECT id, s FROM fl_sql WHERE id <= 2 ORDER BY id")
      assert(got.map(r => (r.getLong(0), r.getString(1))) ===
        Seq((1L, "alpha"), (2L, null)))
    } finally server.close()
  }

  test("a bad ticket surfaces as a client-side error, and the server " +
      "keeps serving afterwards") {
    val server = new FlightLite.Server(spark).start()
    try {
      val e = intercept[RuntimeException] {
        FlightLite.doGet("127.0.0.1", server.boundPort, "SELECT FROM nope(")
      }
      assert(e.getMessage.contains("flight-lite"))
      FlightLite.doPut("127.0.0.1", server.boundPort, "fl_after", rows, schema)
      val (got, _) =
        FlightLite.doGet("127.0.0.1", server.boundPort, "fl_after")
      assert(got.size === 3)
    } finally server.close()
  }

  test("DoGet streams a multi-batch result (> one codec batch) intact") {
    val server = new FlightLite.Server(spark).start()
    try {
      import org.apache.spark.sql.functions.col
      val n = 10000 // > 2 × Ipc.BatchRows(4096) — exercises re-batching
      spark.range(n.toLong).select(col("id"), (col("id") % 97).as("m"))
        .createOrReplaceTempView("fl_big")
      val (got, _) =
        FlightLite.doGet("127.0.0.1", server.boundPort, "fl_big")
      assert(got.size === n)
      assert(got.map(_.getLong(0)).sum === (n.toLong * (n - 1) / 2))
    } finally server.close()
  }

  test("multi-endpoint parallel tickets: GetFlightInfo exposes one " +
      "endpoint per partition and the parallel union equals single DoGet") {
    val server = new FlightLite.Server(spark).start()
    try {
      import org.apache.spark.sql.functions.col
      val n = 9000
      spark.range(n.toLong).repartition(7)
        .select(col("id"), (col("id") % 13).as("m"))
        .createOrReplaceTempView("fl_par")
      val (schema, parts) =
        FlightLite.getFlightInfo("127.0.0.1", server.boundPort, "fl_par")
      assert(parts === 7, s"one endpoint per partition, got $parts")
      assert(schema.fieldNames.toSeq === Seq("id", "m"))
      // drain all endpoints concurrently; single-ticket DoGet is truth
      val (par, parSchema) =
        FlightLite.doGetParallel("127.0.0.1", server.boundPort, "fl_par",
          maxParallel = 4)
      val (single, _) =
        FlightLite.doGet("127.0.0.1", server.boundPort, "fl_par")
      assert(parSchema === schema)
      assert(par.size === n)
      assert(par === single,
        "parallel endpoint union must equal the single-ticket stream, in order")
      // one endpoint alone returns a strict subset
      val (p0, _) = FlightLite.doGetPartition(
        "127.0.0.1", server.boundPort, "fl_par", 0)
      assert(p0.nonEmpty && p0.size < n)
      // SQL (CMD) tickets get endpoints too
      val (_, sqlParts) = FlightLite.getFlightInfo("127.0.0.1",
        server.boundPort, "SELECT m, COUNT(*) AS c FROM fl_par GROUP BY m")
      assert(sqlParts >= 1)
    } finally server.close()
  }

  test("GetFlightInfo pins one plan generation: endpoint DoGets see " +
      "the info-time dataset even after the view is replaced") {
    val sp = spark; import sp.implicits._
    val server = new FlightLite.Server(spark).start()
    try {
      Seq(1L, 2L, 3L).toDF("v").repartition(2)
        .createOrReplaceTempView("fl_pin")
      val (_, parts, pin) = FlightLite.getFlightInfoPinned(
        "127.0.0.1", server.boundPort, "fl_pin")
      // a concurrent writer replaces the view BETWEEN GetFlightInfo
      // and the endpoint pulls — the classic parallel-consumer race
      Seq(100L, 200L).toDF("v").createOrReplaceTempView("fl_pin")
      val got = (0 until parts).flatMap(p => FlightLite.doGetPartition(
        "127.0.0.1", server.boundPort, pin, p)._1).map(_.getLong(0)).sorted
      assert(got == Seq(1L, 2L, 3L),
        s"endpoints mixed plan generations: $got")
      // an un-pinned ticket resolves the NEW view (by-name semantics)
      val (fresh, _) = FlightLite.doGet(
        "127.0.0.1", server.boundPort, "fl_pin")
      assert(fresh.map(_.getLong(0)).sorted == Seq(100L, 200L))
    } finally server.close()
  }

  test("a query failing MID-STREAM poisons the wire: the client throws " +
      "instead of accepting partial rows as a complete result") {
    import org.apache.spark.sql.functions.{col, udf}
    val server = new FlightLite.Server(spark).start()
    try {
      // partition 0 (ids 0..4999) streams at least one full 4096-row
      // batch; partition 1 throws — the failure lands AFTER the 'O'
      // status byte and after real Arrow bytes are on the wire,
      // exactly the window where a bare socket close would parse as a
      // clean end-of-stream at a batch boundary
      val boom = udf((id: Long) =>
        if (id >= 5000) throw new RuntimeException("mid-stream boom")
        else id)
      spark.range(0, 10000, 1, 2).select(boom(col("id")).as("v"))
        .createOrReplaceTempView("fl_boom")
      val e = intercept[Exception] {
        FlightLite.doGet("127.0.0.1", server.boundPort, "fl_boom")
      }
      assert(e.isInstanceOf[java.io.IOException] ||
        e.getMessage != null, s"unexpected failure shape: $e")
    } finally server.close()
  }

  test("DoPut refuses a payload above the single-put ceiling with a " +
      "framed error, not a truncated parse") {
    val server = new FlightLite.Server(spark).start()
    try {
      // exercise the length gate directly on the wire: a declared
      // size above Int.MaxValue must come back as a framed 'E'
      val conn = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        val out = new java.io.DataOutputStream(conn.getOutputStream)
        out.writeByte('P')
        out.writeInt(0) // empty token
        val name = "fl_big".getBytes("UTF-8")
        out.writeInt(name.length); out.write(name)
        out.writeLong(Long.MaxValue) // declared payload size
        out.flush()
        // half-close: the server's drain hits EOF instead of blocking
        // on payload bytes this test never sends
        conn.shutdownOutput()
        val in = new java.io.DataInputStream(conn.getInputStream)
        assert(in.readByte().toChar == 'E')
        val mlen = in.readInt(); val msg = new Array[Byte](mlen)
        in.readFully(msg)
        assert(new String(msg, "UTF-8").contains("too large"),
          s"unexpected refusal text: ${new String(msg, "UTF-8")}")
      } finally conn.close()
    } finally server.close()
  }

  test("golden frames: the wire format is a pinned spec — byte-exact " +
      "request layout, byte-exact response framing, both directions") {
    // Wire spec v1 (FlightLite scaladoc): request = verb byte,
    // int32-BE-prefixed UTF-8 token, int32-BE-prefixed UTF-8 name.
    // Response = status byte; 'O'/'E' carry an int32-BE-prefixed
    // UTF-8 string for non-stream verbs. Any change to these bytes is
    // a protocol break and must fail this test.
    val golden: Array[Byte] =
      Array[Byte]('S'.toByte, 0, 0, 0, 0, 0, 0, 0, 4) ++
        "fl_w".getBytes("UTF-8")

    // 1) the SERVER honors the golden request bytes verbatim
    val sp = spark; import sp.implicits._
    Seq((1L, "a")).toDF("id", "s").createOrReplaceTempView("fl_w")
    val server = new FlightLite.Server(spark).start()
    try {
      val conn = new java.net.Socket("127.0.0.1", server.boundPort)
      try {
        conn.getOutputStream.write(golden); conn.getOutputStream.flush()
        val in = new java.io.DataInputStream(conn.getInputStream)
        assert(in.readByte().toChar == 'O', "status byte")
        val len = in.readInt()
        val body = new Array[Byte](len); in.readFully(body)
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(new String(body, "UTF-8")).asInstanceOf[StructType]
        assert(schema.fieldNames.toSeq == Seq("id", "s"))
        assert(in.read() == -1, "response must end after the framed body")
      } finally conn.close()
    } finally server.close()

    // 2) the CLIENT emits the golden request bytes verbatim
    val probe = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val got = new java.util.concurrent.atomic.AtomicReference[Array[Byte]]()
    val acceptor = new Thread(() => {
      val s = probe.accept()
      try {
        val in = new java.io.DataInputStream(s.getInputStream)
        val buf = new Array[Byte](golden.length)
        in.readFully(buf); got.set(buf)
        // reply with a framed 'O' + schema JSON so the client returns
        val out = new java.io.DataOutputStream(s.getOutputStream)
        val json = StructType(Seq(StructField("id", LongType)))
          .json.getBytes("UTF-8")
        out.writeByte('O'); out.writeInt(json.length); out.write(json)
        out.flush()
      } finally s.close()
    })
    acceptor.start()
    try {
      val st = FlightLite.getSchema("127.0.0.1", probe.getLocalPort, "fl_w")
      acceptor.join(30000)
      assert(java.util.Arrays.equals(got.get, golden),
        s"client frame drifted from the golden bytes: " +
          s"${got.get.map(b => f"$b%02x").mkString(" ")}")
      assert(st.fieldNames.toSeq == Seq("id"))
    } finally probe.close()

    // 3) the mid-stream poison frame is pinned too: continuation
    // marker 0xFFFFFFFF (endian-neutral) then declared length 1024 as
    // int32-LE — Arrow's message-length byte order, so a stock Arrow
    // reader parses exactly the 1 KiB the spec documents
    val poison = java.nio.ByteBuffer.allocate(8).putInt(-1)
      .putInt(java.lang.Integer.reverseBytes(1024)).array()
    assert(poison.map(_ & 0xff).toSeq ==
      Seq(0xff, 0xff, 0xff, 0xff, 0, 4, 0, 0),
      "poison-frame layout drifted")
  }

  test("ListActions names the verbs; DoAction runs them; unknown rejects") {
    val server = new FlightLite.Server(spark).start()
    try {
      val actions = FlightLite.listActions("127.0.0.1", server.boundPort)
      assert(actions.exists(_.startsWith("drop_view:")))
      assert(actions.exists(_.startsWith("row_count:")))
      FlightLite.doPut("127.0.0.1", server.boundPort, "fl_act", rows, schema)
      assert(FlightLite.doAction("127.0.0.1", server.boundPort,
        "row_count", "fl_act") == "3")
      assert(FlightLite.doAction("127.0.0.1", server.boundPort,
        "drop_view", "fl_act") == "true")
      assert(!FlightLite.listFlights("127.0.0.1", server.boundPort)
        .contains("fl_act"), "dropped view still listed")
      val e = intercept[RuntimeException] {
        FlightLite.doAction("127.0.0.1", server.boundPort, "nope", "x")
      }
      assert(e.getMessage.contains("unknown action"))
    } finally server.close()
  }

  test("Handshake: open server accepts any credential with a stable " +
      "token; authed server rejects a bad one and accepts the secret") {
    val open = new FlightLite.Server(spark).start()
    try {
      val t1 = FlightLite.handshake("127.0.0.1", open.boundPort, "anything")
      val t2 = FlightLite.handshake("127.0.0.1", open.boundPort, "anything")
      assert(t1.nonEmpty && t1 == t2, "token must be deterministic")
      assert(t1.matches("[0-9a-f]{32}"), s"unexpected token shape: $t1")
      // different credential -> different identity
      assert(FlightLite.handshake("127.0.0.1", open.boundPort, "other") != t1)
    } finally open.close()
    val authed =
      new FlightLite.Server(spark, authSecret = Some("sesame")).start()
    try {
      val e = intercept[RuntimeException] {
        FlightLite.handshake("127.0.0.1", authed.boundPort, "wrong")
      }
      assert(e.getMessage.contains("handshake rejected"))
      val tok = FlightLite.handshake("127.0.0.1", authed.boundPort, "sesame")
      assert(tok.matches("[0-9a-f]{32}"))
    } finally authed.close()
  }

  test("per-call auth enforcement: an authSecret server rejects " +
      "token-less and wrong-token verbs, serves token-bearing ones") {
    val sp = spark; import sp.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("flight_auth_t")
    val srv = new FlightLite.Server(spark, authSecret = Some("sesame")).start()
    try {
      val port = srv.boundPort
      // no token: every data/control verb refused before any work
      val e1 = intercept[RuntimeException] {
        FlightLite.doGet("127.0.0.1", port, "flight_auth_t")
      }
      assert(e1.getMessage.contains("unauthenticated"))
      val e2 = intercept[RuntimeException] {
        FlightLite.listFlights("127.0.0.1", port)
      }
      assert(e2.getMessage.contains("unauthenticated"))
      val e3 = intercept[RuntimeException] {
        FlightLite.doAction("127.0.0.1", port, "row_count", "flight_auth_t")
      }
      assert(e3.getMessage.contains("unauthenticated"))
      // a forged/stale token (the digest of the WRONG credential) is
      // rejected the same way
      val forged = intercept[RuntimeException] {
        FlightLite.doGet("127.0.0.1", port, "flight_auth_t",
          token = "0" * 32)
      }
      assert(forged.getMessage.contains("unauthenticated"))
      // handshake -> bearer token -> the same verbs succeed
      val tok = FlightLite.handshake("127.0.0.1", port, "sesame")
      val (rows, _) =
        FlightLite.doGet("127.0.0.1", port, "flight_auth_t", token = tok)
      assert(rows.map(_.getLong(0)).sorted == Seq(1L, 2L))
      assert(FlightLite.listFlights("127.0.0.1", port, token = tok)
        .contains("flight_auth_t"))
      assert(FlightLite.doAction("127.0.0.1", port, "row_count",
        "flight_auth_t", token = tok) == "2")
      // open servers keep working token-less (back-compat surface)
      val open = new FlightLite.Server(spark).start()
      try assert(FlightLite.doGet("127.0.0.1", open.boundPort,
        "flight_auth_t")._1.size == 2)
      finally open.close()
      // the composite client helper (the documented bulk-consumption
      // path) must carry the token through BOTH of its verbs
      // (GetFlightInfo + per-endpoint DoGet)
      val noTok = intercept[RuntimeException] {
        FlightLite.doGetParallel("127.0.0.1", port, "flight_auth_t")
      }
      assert(noTok.getMessage.contains("unauthenticated"))
      val (prows, _) = FlightLite.doGetParallel("127.0.0.1", port,
        "flight_auth_t", token = tok)
      assert(prows.map(_.getLong(0)).sorted == Seq(1L, 2L))
      // an unauthenticated DoPut whose payload exceeds the socket
      // buffers must still surface the auth error (the server drains
      // the length-prefixed body before replying — without the drain
      // the client dies on a connection reset mid-write)
      val sp2 = spark; import sp2.implicits._
      val bigSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType)))
      val bigRows = (0 until 4096).map(i =>
        org.apache.spark.sql.Row("x" * 512 + i.toString))
      val putErr = intercept[RuntimeException] {
        FlightLite.doPut("127.0.0.1", port, "flight_auth_big",
          bigRows, bigSchema, token = "forged")
      }
      assert(putErr.getMessage.contains("unauthenticated"),
        s"expected the auth error, got: ${putErr.getMessage}")
    } finally srv.close()
  }
}
