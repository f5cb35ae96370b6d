package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal Flight-style RPC transport — the socket analogue of the
  * reference's FlightService (`format/Flight.proto:38-160`): the verbs
  * a reference user actually exercises, served over a plain TCP
  * socket with the engine's own Arrow IPC STREAM codec
  * ([[Ipc.writeIpcStreamTo]] / [[Ipc.readIpcStreamFrom]]) as the data
  * plane.
  *
  * Verbs (one request per connection, HTTP/1.0-style):
  *  - ListFlights (`Flight.proto:48`) — names of the session's temp
  *    views, newline-joined.
  *  - GetSchema (`Flight.proto:71`) — the DataType JSON of a ticket's
  *    schema, resolved without executing the query.
  *  - DoGet (`Flight.proto:78`) — ticket is a view name or any SQL
  *    string (the FlightDescriptor PATH vs CMD split,
  *    `Flight.proto:152-165`); the result streams back as Arrow
  *    stream-format batches.
  *  - DoPut (`Flight.proto:89`) — client uploads an Arrow stream;
  *    the server registers it as a temp view under the descriptor
  *    name and replies with the row count.
  *  - ListActions / DoAction (`Flight.proto:92-105`) — the
  *    server-side command surface: drop_view, row_count, clear_cache
  *    ('T' lists "type: description" lines; 'A' runs "type body").
  *  - Handshake (`Flight.proto:38-47`) — one credential/token
  *    exchange: the client's payload is its credential, the server
  *    answers with a deterministic bearer token or rejects. On a
  *    server built with an `authSecret`, EVERY other verb must then
  *    present that bearer token (the per-call auth-header slot in
  *    the framing below — the gRPC call-metadata analogue);
  *    token-less or wrong-token calls get 'E' "unauthenticated"
  *    before any work runs. An open server ignores the slot.
  *  - GetFlightInfo + endpoint DoGet (`Flight.proto:138-160`,
  *    `FlightInfo.endpoint`) — 'F' returns the ticket's schema and
  *    its endpoint count (one per partition of the server-side
  *    plan); 'g' streams ONE partition, so a consumer drains all
  *    endpoints on parallel sockets ([[doGetParallel]]) instead of
  *    serializing the result through a single DoGet.
  *
  * Wire framing — **pinned spec, version 1** (FlightLiteSpec's
  * golden-frame test asserts these bytes verbatim; changing any of
  * them is a protocol break and requires a version bump there and
  * here): request = 1 verb byte ('L'/'S'/'G'/'P'), bearer
  * token (int32-BE length prefix; empty on open servers and for
  * Handshake itself), UTF-8 name (int32-BE length prefix), payload
  * (int64-BE length prefix; only DoPut sends one). Response = 1
  * status byte, then 'E' carries an int32-BE
  * length-prefixed UTF-8 error; 'O' carries the verb's payload — raw
  * Arrow stream bytes for DoGet (self-delimiting via the Arrow EOS
  * marker), an int32-BE-prefixed UTF-8 string for the other verbs.
  * A query failing AFTER stream bytes are on the wire appends the
  * POISON frame (int32 -1 continuation marker, then 1024 as an
  * int32 LITTLE-endian declared length — Arrow's message-length byte
  * order — then socket close): Arrow readers treat EOF at a batch
  * boundary as a clean end, so the poison is what guarantees every
  * reader fails loudly instead of accepting partial rows.
  *
  * Scale note: this is a control/egress surface, not a distributed
  * operator. Single-ticket DoGet pulls the result through the driver
  * via `toLocalIterator` — one partition resident at a time, so
  * serving a large result is bounded-memory but single-socket; the
  * endpoint tickets lift that to one socket PER PARTITION (each
  * endpoint computes only its own partition via `runJob`), and the
  * cluster-scale path for bulk data remains the partition-parallel
  * file/DSv2 IPC sources. That matches the reference, where Flight serves
  * result-sets while bulk interchange is dataset files. DoPut
  * materializes the uploaded rows on the driver (dimension-table
  * sized, like the reference's DoPut-into-MemTable use).
  */
object FlightLite {

  private def readName(in: DataInputStream): String = {
    val n = in.readInt()
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
  private def writeStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); out.writeInt(b.length); out.write(b)
  }

  /** The bearer token Handshake exchanges `credential` for — a
    * deterministic digest, so reconnecting clients keep a stable
    * identity and the server can re-derive (never store) the
    * expected token for per-call enforcement. */
  private def bearerToken(credential: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(("graft-flight:" + credential).getBytes(UTF_8))
      .map("%02x".format(_)).mkString.take(32)

  /** One-session Flight endpoint. `start()` binds loopback:port (0 =
    * ephemeral) and serves on a daemon thread until `close()`. */
  final class Server(spark: SparkSession, port: Int = 0,
      authSecret: Option[String] = None)
      extends AutoCloseable {
    private val sock = new ServerSocket(port, 16,
      InetAddress.getLoopbackAddress)
    @volatile private var running = false
    // GetFlightInfo-pinned plans (insertion-ordered, bounded at 64):
    // one plan generation serves every endpoint DoGet of an info call
    private val pinned =
      new java.util.LinkedHashMap[String, DataFrame]()

    def boundPort: Int = sock.getLocalPort

    def start(): this.type = {
      running = true
      val t = new Thread(() => {
        while (running) {
          try {
            val conn = sock.accept()
            // one daemon thread per connection: parallel endpoint
            // tickets (DoGet of different partitions) must stream
            // CONCURRENTLY, not queue behind one accept loop —
            // SparkSession job submission is thread-safe
            val worker = new Thread(() => {
              try handle(conn)
              catch {
                case e: Throwable =>
                  System.err.println(s"[flight-lite] request failed: $e")
              } finally {
                try conn.close() catch { case _: Throwable => () }
              }
            }, "flight-lite-conn")
            worker.setDaemon(true)
            worker.start()
          } catch {
            case _: java.net.SocketException => () // closed in close()
            case e: Throwable if running =>
              System.err.println(s"[flight-lite] accept failed: $e")
          }
        }
      }, "flight-lite-server")
      t.setDaemon(true)
      t.start()
      this
    }

    /** Ticket → DataFrame: a temp-view name serves the view (PATH
      * descriptor), anything else is parsed as SQL (CMD descriptor). */
    private def resolve(ticket: String): DataFrame = {
      // tableExists throws on a ticket that isn't a legal identifier
      // (i.e. a SQL ticket) — treat that as "not a view name".
      val isView =
        try spark.catalog.tableExists(ticket)
        catch { case _: Throwable => false }
      if (isView) spark.table(ticket) else spark.sql(ticket)
    }

    private def handle(conn: Socket): Unit = {
      val in = new DataInputStream(new BufferedInputStream(conn.getInputStream))
      val out = new DataOutputStream(
        new BufferedOutputStream(conn.getOutputStream))
      // once Arrow stream bytes are on the wire, an error can no
      // longer be framed — see the catch block
      var streamStarted = false
      try {
        val verb = in.readByte().toChar
        val token = readName(in)
        val name = readName(in)
        // per-call auth (the gRPC metadata analogue): an authSecret
        // server serves nothing but Handshake without the bearer
        // token Handshake issued — checked BEFORE resolving tickets,
        // so unauthenticated callers cannot even probe view names
        if (verb != 'H' && authSecret.exists(s => token != bearerToken(s))) {
          // DoPut clients are still WRITING their length-prefixed
          // payload — drain it before replying, or a payload larger
          // than the socket buffers dies on a connection reset and
          // the client never sees the "unauthenticated" message
          if (verb == 'P') {
            var left = in.readLong()
            val sink = new Array[Byte](64 * 1024)
            while (left > 0) {
              val n = in.read(sink, 0, math.min(left, sink.length.toLong).toInt)
              if (n < 0) left = 0 else left -= n
            }
          }
          out.writeByte('E')
          writeStr(out, "unauthenticated: handshake required")
          return
        }
        verb match {
          case 'L' =>
            val names = spark.catalog.listTables()
              .collect().map(_.name).sorted
            out.writeByte('O'); writeStr(out, names.mkString("\n"))
          case 'S' =>
            out.writeByte('O'); writeStr(out, resolve(name).schema.json)
          case 'G' =>
            val df = resolve(name)
            // status byte first so the client distinguishes a planning
            // error from a clean stream; execution errors after the
            // first batch surface as a truncated stream (socket close).
            out.writeByte('O')
            streamStarted = true
            Ipc.writeIpcStreamTo(df.toLocalIterator().asScala, df.schema, out)
          case 'P' =>
            val len = in.readLong()
            // int64 on the wire, JVM arrays are int-bounded: refuse a
            // >2 GiB payload with the error surfaced (drain first, as
            // in the auth path) instead of len.toInt silently
            // truncating into a desynced parse or a negative alloc
            if (len < 0 || len > Int.MaxValue - 8) {
              var left = math.max(len, 0L)
              val sink = new Array[Byte](64 * 1024)
              while (left > 0) {
                val n = in.read(sink, 0,
                  math.min(left, sink.length.toLong).toInt)
                if (n < 0) left = 0 else left -= n
              }
              out.writeByte('E')
              writeStr(out, s"DoPut payload too large for one put: " +
                s"$len bytes (max ${Int.MaxValue - 8}); split the stream")
            } else {
              val bytes = new Array[Byte](len.toInt); in.readFully(bytes)
              val (rows, schema) = Ipc.readIpcStream(bytes)
              spark.createDataFrame(
                spark.sparkContext.parallelize(rows,
                  math.max(1, rows.size / Ipc.BatchRows)),
                schema).createOrReplaceTempView(name)
              out.writeByte('O'); writeStr(out, rows.size.toString)
            }
          case 'F' =>
            // GetFlightInfo (Flight.proto:138-160): schema + how many
            // endpoint tickets exist — one per RDD partition of the
            // resolved plan — plus a PIN ticket naming the resolved
            // plan itself: endpoint DoGets against the pin all read
            // ONE plan generation, so a concurrent DoPut replacing the
            // view (or a re-planned SQL ticket) can never hand a
            // parallel consumer a mix of datasets
            val df = resolve(name)
            val parts = df.rdd.getNumPartitions
            val pin = s"pin-${UUID.randomUUID()}"
            pinned.synchronized {
              pinned.put(pin, df)
              // bounded: oldest pins fall out; a consumer that waited
              // past 64 newer GetFlightInfos re-resolves by ticket
              while (pinned.size() > 64) {
                val it = pinned.keySet().iterator(); it.next(); it.remove()
              }
            }
            out.writeByte('O'); writeStr(out, df.schema.json)
            out.writeInt(parts)
            writeStr(out, pin)
          case 'H' =>
            // Handshake (Flight.proto:38-47): name = the client's
            // credential. A server built with an authSecret rejects a
            // mismatch; an open server accepts anything. The returned
            // token is a deterministic digest so reconnecting clients
            // get a stable identity (no Random — see file scaladoc).
            authSecret match {
              case Some(secret) if name != secret =>
                out.writeByte('E')
                writeStr(out, "handshake rejected: invalid credentials")
              case _ =>
                out.writeByte('O'); writeStr(out, bearerToken(name))
            }
          case 'T' =>
            // ListActions (Flight.proto:99-105): the action verbs this
            // server understands, newline-joined "type: description"
            out.writeByte('O')
            writeStr(out, Seq(
              "drop_view: unregister the named temp view",
              "row_count: rows in the named view/SQL ticket",
              "clear_cache: uncache all cached tables").mkString("\n"))
          case 'A' =>
            // DoAction (Flight.proto:92-98): name = "type body"
            val sep = name.indexOf(' ')
            val (action, body) =
              if (sep < 0) (name, "") else (name.take(sep), name.drop(sep + 1))
            action match {
              case "drop_view" =>
                val dropped = spark.catalog.dropTempView(body)
                out.writeByte('O'); writeStr(out, dropped.toString)
              case "row_count" =>
                out.writeByte('O')
                writeStr(out, resolve(body).count().toString)
              case "clear_cache" =>
                spark.catalog.clearCache()
                out.writeByte('O'); writeStr(out, "ok")
              case other =>
                out.writeByte('E'); writeStr(out, s"unknown action: $other")
            }
          case 'g' =>
            // endpoint DoGet: stream ONE partition of the ticket's
            // result. runJob(Seq(p)) computes exactly that partition —
            // for a file-backed plan that is that endpoint's file
            // splits, the real parallel-consumer shape. A pin ticket
            // (issued by GetFlightInfo) reads the PINNED plan, so all
            // endpoints of one info call see one generation.
            val p = in.readInt()
            val df = Option(pinned.synchronized(pinned.get(name)))
              .getOrElse(resolve(name))
            val rows = spark.sparkContext.runJob(
              df.rdd, (it: Iterator[Row]) => it.toArray, Seq(p)).head
            out.writeByte('O')
            streamStarted = true
            Ipc.writeIpcStreamTo(rows.iterator, df.schema, out)
          case other =>
            out.writeByte('E'); writeStr(out, s"unknown verb: $other")
        }
      } catch {
        case e: EOFException => throw e
        case e: Throwable =>
          // never append an 'E' frame into a STARTED Arrow stream —
          // the client's codec would parse it as a garbage message
          // length. And a bare socket close is NOT a reliable failure
          // signal either: Arrow stream readers treat EOF at a message
          // boundary as a clean end (the writer fails between batches,
          // exactly at a boundary), so partial rows would read as
          // success. Instead poison the stream: a continuation marker
          // declaring a 1 KiB metadata frame we never send — the
          // client's readFully hits EOF MID-message and throws, on
          // every reader, regardless of where the stream broke.
          if (!streamStarted)
            try { out.writeByte('E'); writeStr(out, String.valueOf(e.getMessage)) }
            catch { case _: Throwable => () }
          else
            // Arrow IPC message lengths are LITTLE-endian on the wire
            // (the continuation marker 0xFFFFFFFF is endian-neutral);
            // reverseBytes so a real Arrow reader parses the declared
            // length as exactly 1024 — the value the wire spec pins
            try {
              out.writeInt(-1)
              out.writeInt(java.lang.Integer.reverseBytes(1024))
            } catch { case _: Throwable => () }
      } finally out.flush()
    }

    override def close(): Unit = { running = false; sock.close() }
  }

  // ---- client ------------------------------------------------------------

  private def request[A](host: String, port: Int)(
      send: DataOutputStream => Unit)(recv: DataInputStream => A): A = {
    val conn = new Socket(host, port)
    try {
      val out = new DataOutputStream(
        new BufferedOutputStream(conn.getOutputStream))
      send(out); out.flush()
      val in = new DataInputStream(new BufferedInputStream(conn.getInputStream))
      in.readByte().toChar match {
        case 'O' => recv(in)
        case _   => throw new RuntimeException(s"flight-lite: ${readName(in)}")
      }
    } finally conn.close()
  }

  /** Verb + auth-token + name header — every request starts with
    * this triple (token empty on open servers; Handshake carries the
    * CREDENTIAL in the name slot and ignores the token slot). */
  private def header(out: DataOutputStream, verb: Char, token: String,
      name: String): Unit = {
    out.writeByte(verb); writeStr(out, token); writeStr(out, name)
  }

  def listFlights(host: String, port: Int,
      token: String = ""): Seq[String] =
    request(host, port) { out => header(out, 'L', token, "") } {
      in => readName(in).split("\n").toSeq.filter(_.nonEmpty)
    }

  def getSchema(host: String, port: Int, ticket: String,
      token: String = ""): StructType =
    request(host, port) { out => header(out, 'S', token, ticket) } {
      in => org.apache.spark.sql.types.DataType.fromJson(readName(in))
        .asInstanceOf[StructType]
    }

  def doGet(host: String, port: Int, ticket: String,
      token: String = ""): (Seq[Row], StructType) =
    request(host, port) { out => header(out, 'G', token, ticket) } {
      in => Ipc.readIpcStreamFrom(in)
    }

  def doPut(host: String, port: Int, name: String,
      rows: Seq[Row], schema: StructType, token: String = ""): Long =
    request(host, port) { out =>
      header(out, 'P', token, name)
      val bytes = Ipc.writeIpcStream(rows, schema)
      out.writeLong(bytes.length.toLong); out.write(bytes)
    } { in => readName(in).toLong }

  /** Handshake (Flight.proto:38-47): exchange `credential` for the
    * server's bearer token; throws on rejection. */
  def handshake(host: String, port: Int, credential: String = ""): String =
    request(host, port) { out =>
      header(out, 'H', "", credential)
    } { in => readName(in) }

  /** ListActions (Flight.proto:99-105): "type: description" lines. */
  def listActions(host: String, port: Int,
      token: String = ""): Seq[String] =
    request(host, port) { out => header(out, 'T', token, "") } {
      in => readName(in).split("\n").toSeq.filter(_.nonEmpty)
    }

  /** DoAction (Flight.proto:92-98): run `action` with `body`, returns
    * the result string. Actions: drop_view, row_count, clear_cache. */
  def doAction(host: String, port: Int, action: String,
      body: String = "", token: String = ""): String =
    request(host, port) { out =>
      header(out, 'A', token,
        if (body.isEmpty) action else s"$action $body")
    } { in => readName(in) }

  /** GetFlightInfo: the ticket's schema and its endpoint count — one
    * endpoint per partition of the server-side plan
    * (`FlightInfo.endpoint`, Flight.proto:138-160). */
  def getFlightInfo(host: String, port: Int,
      ticket: String, token: String = ""): (StructType, Int) = {
    val (schema, parts, _) = getFlightInfoPinned(host, port, ticket, token)
    (schema, parts)
  }

  /** [[getFlightInfo]] plus the server's PIN ticket: endpoint DoGets
    * against the pin all read the plan generation this call resolved
    * — a concurrent DoPut replacing the view can't mix datasets into
    * a parallel consumer's result. */
  def getFlightInfoPinned(host: String, port: Int,
      ticket: String, token: String = ""): (StructType, Int, String) =
    request(host, port) { out => header(out, 'F', token, ticket) } {
      in =>
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(readName(in)).asInstanceOf[StructType]
        (schema, in.readInt(), readName(in))
    }

  /** DoGet of ONE endpoint ticket (partition `p` of the ticket's
    * result). */
  def doGetPartition(host: String, port: Int, ticket: String,
      p: Int, token: String = ""): (Seq[Row], StructType) =
    request(host, port) { out =>
      header(out, 'g', token, ticket); out.writeInt(p)
    } { in => Ipc.readIpcStreamFrom(in) }

  /** Parallel DoGet: resolve the ticket's endpoints via
    * [[getFlightInfo]], pull every endpoint on its own socket
    * concurrently, and concatenate in endpoint order — the
    * multi-endpoint consumption pattern of Flight's
    * `FlightInfo.endpoint` list, where a bulk consumer drains
    * partitions in parallel instead of serializing the whole result
    * through one DoGet stream. Row order equals the single-ticket
    * DoGet (both walk partitions in index order). */
  def doGetParallel(host: String, port: Int, ticket: String,
      maxParallel: Int = 8, token: String = ""): (Seq[Row], StructType) = {
    // endpoints pull against the PIN, not the raw ticket: every
    // partition reads the one plan generation GetFlightInfo resolved
    val (schema, parts, pin) = getFlightInfoPinned(host, port, ticket, token)
    if (parts == 0) return (Seq.empty, schema)
    val out = new Array[Seq[Row]](parts)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[Integer]
    (0 until parts).foreach(p => queue.add(p))
    val workers = (0 until math.min(maxParallel, parts)).map { _ =>
      val t = new Thread(() => {
        var p = queue.poll()
        while (p != null && err.get() == null) {
          try out(p) = doGetPartition(host, port, pin, p, token)._1
          catch { case e: Throwable => err.compareAndSet(null, e) }
          p = queue.poll()
        }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
    if (err.get() != null) throw err.get()
    (out.toSeq.flatten, schema)
  }

  // ---- oracle-checked query ----------------------------------------------

  /** Full wire round-trip as a correctness row: upload `nation` over
    * DoPut, aggregate it back over DoGet with a SQL ticket (exercising
    * the CMD descriptor path), and return the result as a DataFrame —
    * every value crosses the socket twice, so the oracle hash over the
    * ORIGINAL parquet proves both codec directions and the framing. */
  def qFlightRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val server = new Server(s).start()
    try {
      val nation = graft.sources.Tables(s, dir, "nation")
      doPut("127.0.0.1", server.boundPort, "flight_nation",
        nation.collect().toSeq, nation.schema)
      require(listFlights("127.0.0.1", server.boundPort)
        .contains("flight_nation"), "flight-lite: uploaded view not listed")
      val (rows, schema) = doGet("127.0.0.1", server.boundPort,
        """SELECT n_regionkey, COUNT(*) AS n,
           MIN(n_name) AS first_name, MAX(n_nationkey) AS max_key
           FROM flight_nation GROUP BY n_regionkey ORDER BY n_regionkey""")
      // re-sort after the wire hop: the driver hash-compare (and the
      // plan lint) want the ordering ON the returned frame, not an
      // artifact of the server's stream order
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("n_regionkey")
    } finally server.close()
  }

  val qFlightRoundtripSql: String = """
    SELECT n_regionkey, COUNT(*) AS n,
      MIN(n_name) AS first_name, MAX(n_nationkey) AS max_key
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
  """.trim
}
