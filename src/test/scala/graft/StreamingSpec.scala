package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Drives the streaming transforms through MemoryStream with
  * out-of-order and late input — watermark close/drop semantics and
  * keyed-state evolution across triggers.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private def tsUs(s: String): Long = ts(s).getTime * 1000L

  test("windowed agg with watermark: closed windows emit, late rows drop") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedCounts(df).writeStream
      .format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      // trigger 1: two in-order events in the 10:00 window
      in.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0))
      q.processAllAvailable()
      // nothing closed yet — watermark is still inside the 10:00 window
      assert(spark.table("win_counts").count() == 0)
      // trigger 2: event at 12:00 pushes the watermark past 10:00+10min
      in.addData((ts("2024-01-01 12:00:00"), "view", 5.0))
      q.processAllAvailable()
      // trigger 3: a LATE event for the closed 10:00 window — dropped
      in.addData((ts("2024-01-01 10:10:00"), "click", 99.0))
      q.processAllAvailable()
      val closed = spark.table("win_counts")
        .select("win_start", "event_type", "n", "total_value").collect()
      assert(closed.length == 1)
      val r = closed(0)
      assert(r.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      assert(r.getString(1) == "click" && r.getLong(2) == 2 && r.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("stream-static enrichment joins a broadcast dim and closes windows by watermark") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val dim = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val q = Streaming.enrichJoin(events, dim).writeStream
      .format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:05:00"), 1L, 1.0),
        (ts("2024-01-01 10:10:00"), 2L, 2.0),
        (ts("2024-01-01 10:20:00"), 1L, 4.0),
        (ts("2024-01-01 10:25:00"), 9L, 8.0)) // 9 has no dim row -> dropped
      q.processAllAvailable()
      assert(spark.table("enriched").count() == 0) // window still open
      in.addData((ts("2024-01-01 12:00:00"), 1L, 0.5)) // advances watermark
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("win_start", "segment", "n", "total_value")
        .orderBy("segment").collect()
      assert(rows.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
        Seq(("AUTOMOBILE", 2L, 5.0), ("BUILDING", 1L, 2.0)),
        s"wrong enrichment result: ${rows.mkString(",")}")
      assert(rows.forall(_.getTimestamp(0) == ts("2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("native session_window closes a session after the watermark passes the gap") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, Long, Double)]
    val df = in.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val q = df.writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    try {
      // two events 5 min apart: one session; nothing closes yet
      in.addData((ts("2024-01-01 10:00:00"), 1L, 1.0),
        (ts("2024-01-01 10:05:00"), 1L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sw_sessions").count() == 0)
      // an event far past the gap closes the first session and opens a new one
      in.addData((ts("2024-01-01 11:00:00"), 1L, 3.0))
      q.processAllAvailable()
      val closed = spark.table("sw_sessions").collect()
      assert(closed.length == 1, s"expected one closed session, got ${closed.length}")
      val sess = closed(0)
      val sw = sess.getStruct(1)
      assert(sw.getTimestamp(0) == ts("2024-01-01 10:00:00"))
      // session end = last event + gap
      assert(sw.getTimestamp(1) == ts("2024-01-01 10:15:00"))
      assert(sess.getLong(2) == 2)
    } finally q.stop()
  }

  test("mapGroupsWithState: keyed state accumulates across triggers") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[Streaming.Event]
    val q = Streaming.runningUserStats(in.toDS()).writeStream
      .format("memory").queryName("user_stats")
      .outputMode(Streaming.runningOutputMode).start()
    try {
      in.addData(Streaming.Event(1, ts("2024-01-01 00:00:01"), 10.0),
        Streaming.Event(2, ts("2024-01-01 00:00:02"), 5.0))
      q.processAllAvailable()
      in.addData(Streaming.Event(1, ts("2024-01-01 00:01:00"), 7.0))
      q.processAllAvailable()
      // update mode: last emitted row per user carries the running total
      val last = spark.table("user_stats")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(last == Set((1L, 2L, 17.0), (2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap close + timeout close") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[Streaming.Event]
    val q = Streaming.sessionizeStream(in.toDS()).writeStream
      .format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: two events 5 min apart
      in.addData(Streaming.Event(1, ts("2024-01-01 10:00:00"), 1.0),
        Streaming.Event(1, ts("2024-01-01 10:05:00"), 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // an event 2 hours later: closes session 1 by gap, opens session 2
      in.addData(Streaming.Event(1, ts("2024-01-01 12:05:00"), 1.0))
      q.processAllAvailable()
      // another user far in the future pushes the watermark past
      // session 2's timeout → session 2 closes by TIMEOUT
      in.addData(Streaming.Event(2, ts("2024-01-01 23:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(Streaming.Event(2, ts("2024-01-01 23:30:00"), 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .orderBy("start_us").collect()
        .map(r => (r.getLong(0), r.getLong(3)))
      assert(sessions.length >= 2)
      assert(sessions(0) == (1L, 2L)) // session 1: user 1, 2 events (gap close)
      assert(sessions(1) == (1L, 1L)) // session 2: user 1, 1 event (timeout)
    } finally q.stop()
  }

  test("sessionization: a late-but-in-watermark event never moves the " +
      "session end backward") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[Streaming.Event]
    val q = Streaming.sessionizeStream(in.toDS()).writeStream
      .format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      in.addData(Streaming.Event(1, ts("2024-01-01 10:00:00"), 1.0),
        Streaming.Event(1, ts("2024-01-01 10:20:00"), 1.0))
      q.processAllAvailable()
      // watermark is now 10:10 — a 10:15 event is LATE but accepted;
      // it must merge without shortening the session (end stays 10:20)
      in.addData(Streaming.Event(1, ts("2024-01-01 10:15:00"), 1.0))
      q.processAllAvailable()
      // push the watermark far past the timeout to close the session
      in.addData(Streaming.Event(2, ts("2024-01-01 23:00:00"), 1.0))
      q.processAllAvailable()
      in.addData(Streaming.Event(2, ts("2024-01-01 23:30:00"), 1.0))
      q.processAllAvailable()
      val s = spark.table("sessions_late")
        .filter(col("user_id") === 1L).collect()
      assert(s.length == 1, s"expected one closed session, got ${s.length}")
      val (start, end, n) = (s(0).getLong(1), s(0).getLong(2), s(0).getLong(3))
      assert(end == tsUs("2024-01-01 10:20:00"),
        s"late event moved the session end backward: $end")
      assert(start == tsUs("2024-01-01 10:00:00") && n == 3,
        s"session start/count wrong: ($start, $n)")
    } finally q.stop()
  }

  test("upsertBatch recovers the state a crash stranded under _old " +
      "instead of deleting it") {
    val sp = spark; import sp.implicits._
    val stateDir = java.nio.file.Files
      .createTempDirectory("cdc_crash").toString + "/state"
    val up = Streaming.upsertBatch(stateDir, "key", "ver") _
    up(Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("key", "payload", "ver"), 0L)
    // simulate a crash between rename(dir, _old) and rename(tmp, dir):
    // the only live state sits under _old
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + "_old")))
    // the epoch replay must RESTORE _old first — not rebuild from the
    // batch alone and then delete the backup
    up(Seq((3L, "c", 2L)).toDF("key", "payload", "ver"), 1L)
    val state = spark.read.parquet(stateDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a", 2L -> "b", 3L -> "c"),
      s"crash recovery lost state: $state")
  }

  test("transformWithState changelog is last-EVENT-TIME-wins: a late " +
      "row neither overwrites a newer value nor pulls the timer earlier") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    // transformWithState requires the RocksDB state store provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streaming.Change]
    val q = Streaming.latestStateStream(in.toDS(),
        retentionMs = 3600 * 1000L, lateness = "1 hour")
      .writeStream.format("memory").queryName("changelog_late")
      .outputMode("append").start()
    def rows(): Seq[(Long, Option[String])] =
      spark.table("changelog_late").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    try {
      in.addData(Streaming.Change(1, ts("2024-01-01 10:20:00"), "B"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some("B"))))
      // a LATE row (10:15 < applied frontier 10:20, above watermark):
      // must be skipped, not applied as a change
      in.addData(Streaming.Change(1, ts("2024-01-01 10:15:00"), "A"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some("B"))),
        s"late row overwrote a newer value: ${rows()}")
      // and the state still holds B: a fresh row with the SAME value
      // is suppressed as unchanged (it would emit if A had applied)
      in.addData(Streaming.Change(1, ts("2024-01-01 10:30:00"), "B"))
      q.processAllAvailable()
      assert(rows() == Seq((1L, Some("B"))),
        s"state lost the newest value: ${rows()}")
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("streaming dedup drops within-watermark duplicate fingerprints") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Long, Timestamp, String)]
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = Streaming.dedupStream(df).writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:00:01"), "beta"),
        (3L, ts("2024-01-01 10:00:02"), "alpha")) // dup in same batch
      q.processAllAvailable()
      in.addData((4L, ts("2024-01-01 10:01:00"), "alpha")) // dup next batch
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L))
    } finally q.stop()
  }

  test("left-outer stream-stream join: null-padded click only after the watermark certifies no match") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Streaming.attributionJoinLeftOuter(cdf, pdf).writeStream
      .format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    def rows(): Set[(Long, Option[Long])] =
      spark.table("attrib_outer").select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L), // will convert
        (2L, ts("2024-01-01 10:05:00"), 101L))              // never converts
      purchases.addData((1L, ts("2024-01-01 10:30:00"), 200L, 9.99))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched click must NOT
      // null-emit yet — a purchase in its window could still arrive
      assert(rows() == Set((100L, Some(200L))),
        s"premature outer emission: ${rows()}")
      // both watermarks advance past click 101's window end + delay
      // (11:05 + 10 min); next trigger finalizes the null row
      clicks.addData((9L, ts("2024-01-01 12:00:00"), 999L))
      purchases.addData((9L, ts("2024-01-01 23:00:00"), 998L, 0.0))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 23:30:00"), 997L))
      q.processAllAvailable()
      assert(rows().contains((101L, None)),
        s"watermark-expired click must emit null-padded: ${rows()}")
      assert(!rows().exists { case (c, p) => c == 100L && p.isEmpty },
        "a matched click must never also null-emit")
    } finally q.stop()
  }

  test("right-outer stream-stream join: organic purchase null-emits only " +
      "after the click watermark passes its lookback hour") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Streaming.attributionJoinRightOuter(cdf, pdf).writeStream
      .format("memory").queryName("attrib_right")
      .outputMode("append").start()
    def rows(): Set[(Option[Long], Long)] =
      spark.table("attrib_right").select("click_id", "purchase_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getLong(1))).toSet
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L))
      purchases.addData((1L, ts("2024-01-01 10:30:00"), 200L, 9.99),
        (3L, ts("2024-01-01 10:10:00"), 201L, 5.00)) // organic: no click
      q.processAllAvailable()
      // the matched pair emits; the organic purchase must NOT
      // null-emit yet — a late click inside its lookback hour could
      // still arrive
      assert(rows() == Set((Some(100L), 200L)),
        s"premature right-outer emission: ${rows()}")
      // advance the click watermark far past the lookback horizon
      clicks.addData((9L, ts("2024-01-01 23:00:00"), 999L))
      purchases.addData((9L, ts("2024-01-01 23:00:00"), 998L, 0.0))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 23:30:00"), 997L))
      purchases.addData((9L, ts("2024-01-01 23:30:00"), 996L, 0.0))
      q.processAllAvailable()
      assert(rows().contains((None, 201L)),
        s"expired organic purchase must null-emit: ${rows()}")
      assert(!rows().exists { case (c, p) => c.isEmpty && p == 200L },
        "a matched purchase must never also null-emit")
      // the preserved side is purchases: no click-only rows exist
      assert(rows().forall { case (_, p) => p != 0L })
    } finally q.stop()
  }

  test("full-outer stream-stream join: watermark-certified null emission " +
      "on BOTH sides") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Streaming.attributionJoinFullOuter(cdf, pdf).writeStream
      .format("memory").queryName("attrib_full")
      .outputMode("append").start()
    def rows(): Set[(Option[Long], Option[Long])] =
      spark.table("attrib_full").select("click_id", "purchase_id").collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L), // will convert
        (2L, ts("2024-01-01 10:05:00"), 101L))              // never converts
      purchases.addData((1L, ts("2024-01-01 10:30:00"), 200L, 9.99),
        (3L, ts("2024-01-01 10:10:00"), 201L, 5.00))        // organic: no click
      q.processAllAvailable()
      // only the matched pair may emit now: the unmatched click's
      // window is still open, and the orphan purchase could still be
      // preceded by a late click within ITS lookback hour
      assert(rows() == Set((Some(100L), Some(200L))),
        s"premature outer emission: ${rows()}")
      // advance both watermarks far past every horizon
      clicks.addData((9L, ts("2024-01-01 23:00:00"), 999L))
      purchases.addData((9L, ts("2024-01-01 23:00:00"), 998L, 0.0))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-01 23:30:00"), 997L))
      purchases.addData((9L, ts("2024-01-01 23:30:00"), 996L, 0.0))
      q.processAllAvailable()
      assert(rows().contains((Some(101L), None)),
        s"expired click must null-emit: ${rows()}")
      assert(rows().contains((None, Some(201L))),
        s"expired orphan purchase must null-emit: ${rows()}")
      assert(!rows().exists { case (c, p) => c == Some(100L) && p.isEmpty },
        "a matched click must never also null-emit")
      assert(!rows().exists { case (c, p) => c.isEmpty && p == Some(200L) },
        "a matched purchase must never also null-emit")
    } finally q.stop()
  }

  test("left-semi stream-stream join: a click emits at most once " +
      "however many purchases match, and never without a match") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Streaming.attributionJoinSemi(cdf, pdf).writeStream
      .format("memory").queryName("attrib_semi")
      .outputMode("append").start()
    def clickIds(): Seq[Long] =
      spark.table("attrib_semi").select("click_id").collect()
        .map(_.getLong(0)).toSeq
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L), // 2 purchases
        (2L, ts("2024-01-01 10:05:00"), 101L))              // none
      purchases.addData((1L, ts("2024-01-01 10:20:00"), 200L, 1.0),
        (1L, ts("2024-01-01 10:40:00"), 201L, 2.0))
      q.processAllAvailable()
      assert(clickIds().sorted == Seq(100L),
        s"semi must emit the converted click exactly once: ${clickIds()}")
      // a third matching purchase must NOT re-emit the click
      purchases.addData((1L, ts("2024-01-01 10:50:00"), 202L, 3.0))
      q.processAllAvailable()
      assert(clickIds() == Seq(100L),
        s"late extra purchase re-emitted a semi row: ${clickIds()}")
      // watermarks past every horizon: the unmatched click still never emits
      clicks.addData((9L, ts("2024-01-01 23:00:00"), 999L))
      purchases.addData((9L, ts("2024-01-01 23:30:00"), 998L, 0.0))
      q.processAllAvailable()
      clicks.addData((9L, ts("2024-01-02 01:00:00"), 997L))
      purchases.addData((9L, ts("2024-01-02 01:00:00"), 996L, 0.0))
      q.processAllAvailable()
      assert(!clickIds().contains(101L),
        "unconverted click must never appear in a semi join")
    } finally q.stop()
  }

  test("transformWithState changelog: emits only changes, event-time timer expires idle keys") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    // transformWithState requires the RocksDB state store provider
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Streaming.Change]
    val q = Streaming.latestStateStream(in.toDS(), retentionMs = 3600 * 1000L)
      .writeStream.format("memory").queryName("changelog")
      .outputMode("append").start()
    def rows(): Set[(Long, Option[String])] =
      spark.table("changelog").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    try {
      in.addData(Streaming.Change(1, ts("2024-01-01 10:00:00"), "a"))
      q.processAllAvailable()
      assert(rows() == Set((1L, Some("a"))))
      // duplicate value: suppressed; new key: emitted
      in.addData(Streaming.Change(1, ts("2024-01-01 10:05:00"), "a"),
        Streaming.Change(2, ts("2024-01-01 10:06:00"), "x"))
      q.processAllAvailable()
      assert(rows() == Set((1L, Some("a")), (2L, Some("x"))))
      // real change: emitted
      in.addData(Streaming.Change(1, ts("2024-01-01 10:10:00"), "b"))
      q.processAllAvailable()
      assert(rows() == Set((1L, Some("a")), (2L, Some("x")), (1L, Some("b"))))
      // watermark far past both keys' retention (11:10 / 11:06):
      // timers fire, keys tombstone (key 9 stays live)
      in.addData(Streaming.Change(9, ts("2024-01-01 13:00:00"), "z"))
      q.processAllAvailable()
      in.addData(Streaming.Change(9, ts("2024-01-01 13:30:00"), "z2"))
      q.processAllAvailable()
      assert(rows().contains((1L, None)) && rows().contains((2L, None)),
        s"expired keys must tombstone: ${rows()}")
      // post-expiry re-arrival of the SAME value re-emits (state was dropped)
      in.addData(Streaming.Change(1, ts("2024-01-01 14:00:00"), "b"))
      q.processAllAvailable()
      assert(rows().count { case (k, v) => k == 1L && v.contains("b") } >= 1)
      val emitted = spark.table("changelog")
        .filter(col("key") === 1 && col("value") === "b").count()
      assert(emitted == 2, s"re-arrival after expiry must re-emit, got $emitted")
    } finally {
      q.stop()
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("stream-stream interval join pairs purchases with in-window clicks") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val cdf = clicks.toDF().toDF("user_id", "ts", "event_id")
    val pdf = purchases.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Streaming.attributionJoin(cdf, pdf).writeStream
      .format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (2L, ts("2024-01-01 10:05:00"), 101L))
      purchases.addData(
        (1L, ts("2024-01-01 10:30:00"), 200L, 9.99), // in window of click 100
        (1L, ts("2024-01-01 12:30:00"), 201L, 1.0),  // > 1h after any click
        (3L, ts("2024-01-01 10:10:00"), 202L, 2.0))  // user with no clicks
      q.processAllAvailable()
      val pairs = spark.table("attrib")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((100L, 200L)))
    } finally q.stop()
  }

  test("batch and stream share the transform: batch run matches manual agg") {
    val batch = Streaming.qStreamWindow(spark, sfDir)
    val manual = graft.sources.Tables(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .count()
    assert(batch.count() == manual.count())
  }

  test("streaming grouped top-k: O(k) keyed state, leaderboard updates per trigger") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[Streaming.Scored]
    val q = Streaming.topKStream(2)(in.toDS()).writeStream
      .format("memory").queryName("topk_out")
      .outputMode("update").start()
    // update-mode memory sink accumulates one row per (trigger, group)
    def boards(): Map[String, Set[Seq[Long]]] =
      spark.table("topk_out").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1))
        .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).toSet }
    try {
      in.addData(Streaming.Scored("a", 1, 10.0), Streaming.Scored("a", 2, 20.0),
        Streaming.Scored("b", 3, 5.0))
      q.processAllAvailable()
      assert(boards() == Map("a" -> Set(Seq(2L, 1L)), "b" -> Set(Seq(3L))))
      // next trigger: 30-point arrival displaces id=1; id=5 fills b's slack
      in.addData(Streaming.Scored("a", 4, 30.0), Streaming.Scored("b", 5, 1.0))
      q.processAllAvailable()
      assert(boards()("a") == Set(Seq(2L, 1L), Seq(4L, 2L)), s"got ${boards()}")
      assert(boards()("b") == Set(Seq(3L), Seq(3L, 5L)))
      // re-score: id=2 jumps to 40 — it must MOVE to first place, not
      // occupy two slots (one slot per id on the board)
      in.addData(Streaming.Scored("a", 2, 40.0))
      q.processAllAvailable()
      assert(boards()("a").contains(Seq(2L, 4L)), s"got ${boards()("a")}")
    } finally q.stop()
  }

  test("curation transforms run unchanged on a stream: redact + quality gate") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Long, String, Double, String)]
    val df = in.toDF().toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val q = graft.ops.Privacy.redact(df).writeStream
      .format("memory").queryName("redact_out").outputMode("append").start()
    val docs = MemoryStream[(Long, String)]
    val gate = graft.ops.TextAnalysis
      .repetitionScores(docs.toDF().toDF("doc_id", "text"))
      .filter(col("dup_gram_frac") <= 0.5)
    val q2 = gate.writeStream
      .format("memory").queryName("gate_out").outputMode("append").start()
    try {
      in.addData((7L, "Customer#000000007", 1234.5, "BUILDING"))
      q.processAllAvailable()
      val r = spark.table("redact_out").collect().head
      assert(r.getAs[String]("redacted_name") == "Customer#XXXXXXXXX")
      assert(r.getAs[Long]("acctbal_bucket") == 1000L)
      docs.addData((1L, "a b c d e f g h"), (2L, "x y x y x y x y x y"))
      q2.processAllAvailable()
      val kept = spark.table("gate_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L), s"repetitive doc 2 should be gated out, kept=$kept")
    } finally { q.stop(); q2.stop() }
  }

  test("foreachBatch CDC-apply sink: upserts accumulate, epoch replay is idempotent") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("cdc_state").toString + "/state"
    val in = MemoryStream[(Long, String, Long)]
    val q = in.toDF().toDF("key", "payload", "ver").writeStream
      .foreachBatch(Streaming.upsertBatch(stateDir, "key", "ver") _)
      .outputMode("update").start()
    try {
      in.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      in.addData((2L, "b2", 2L), (3L, "c", 2L), (3L, "c2", 3L)) // key 3 twice: keep-last
      q.processAllAvailable()
      def state() = spark.read.parquet(stateDir)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
        .toMap
      val s1 = state()
      assert(s1 == Map(1L -> ("a", 1L), 2L -> ("b2", 2L), 3L -> ("c2", 3L)), s"state=$s1")
      // epoch REPLAY (what streaming does after a crash before offset
      // commit): applying the same batch again must not change state
      val replay = Seq((2L, "b2", 2L), (3L, "c", 2L), (3L, "c2", 3L))
        .toDF("key", "payload", "ver")
      Streaming.upsertBatch(stateDir, "key", "ver")(replay, 99L)
      assert(state() == s1, "replayed epoch changed the state")
    } finally q.stop()
  }

  test("graft-ipc streaming sink: per-epoch atomic file sets, exactly-once read-back") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val out = "/tmp/graft_egress/ipc_stream_sink"
    val ckpt = out + "_ckpt"
    for (d <- Seq(out, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("k", "s", "v").writeStream
      .format("graft-ipc").option("checkpointLocation", ckpt)
      .outputMode("append").start(out)
    try {
      in.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      in.addData((3L, "c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val files = new java.io.File(out).listFiles((_, n) => n.endsWith(".arrow"))
    // two committed epochs, no uncommitted temps
    assert(files.map(_.getName).count(_.startsWith("part-e0-")) > 0)
    assert(files.map(_.getName).count(_.startsWith("part-e1-")) > 0)
    assert(new java.io.File(out).listFiles((_, n) => n.endsWith(".tmp")).isEmpty)
    val back = spark.read.format("graft-ipc").load(out)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
  }

  test("graft-ipc streaming sink complete mode: each epoch replaces the snapshot") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val out = "/tmp/graft_egress/ipc_stream_complete"
    val ckpt = out + "_ckpt"
    for (d <- Seq(out, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v").groupBy("k")
      .agg(sum("v").as("total")).writeStream
      .format("graft-ipc").option("checkpointLocation", ckpt)
      .outputMode("complete").start(out)
    try {
      in.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      in.addData(("a", 10L))
      q.processAllAvailable()
    } finally q.stop()
    // only the LATEST epoch's snapshot remains on disk — Complete mode
    // truncates, it must not accumulate a union of stale aggregates
    val names = new java.io.File(out)
      .listFiles((_, n) => n.endsWith(".arrow")).map(_.getName)
    assert(names.forall(_.startsWith("part-e1-")), names.mkString(","))
    val back = spark.read.format("graft-ipc").load(out)
    assert(back.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 11L), ("b", 2L)))
  }

  test("end-to-end streaming pipeline: ipc file-drop -> dedup -> ipc sink") {
    val sp = spark
    import sp.implicits._
    val in = "/tmp/graft_egress/ipc_pipe_in"
    val outD = "/tmp/graft_egress/ipc_pipe_out"
    val ckpt = "/tmp/graft_egress/ipc_pipe_ckpt"
    for (d <- Seq(in, outD, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    def drop(rows: Seq[(java.sql.Timestamp, Long, String)], mode: String): Unit =
      rows.toDF("ts", "doc_id", "text").repartition(1)
        .write.format("graft-ipc").mode(mode).save(in)
    drop(Seq((ts("2024-01-01 10:00:00"), 1L, "alpha"),
      (ts("2024-01-01 10:00:01"), 2L, "alpha"), // dup fp within watermark
      (ts("2024-01-01 10:00:02"), 3L, "beta")), "overwrite")
    val q = Streaming.dedupStream(
        spark.readStream.format("graft-ipc").load(in))
      .select(col("doc_id"), col("text"))
      .writeStream.format("graft-ipc")
      .option("checkpointLocation", ckpt).outputMode("append").start(outD)
    try {
      q.processAllAvailable()
      // second file-drop: one more dup of "alpha", one new doc
      drop(Seq((ts("2024-01-01 10:01:00"), 4L, "alpha"),
        (ts("2024-01-01 10:01:30"), 5L, "gamma")), "append")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.format("graft-ipc").load(outD)
      .select("text").as[String].collect().sorted
    assert(out.toSeq == Seq("alpha", "beta", "gamma"),
      s"dedup across the streamed pipeline, got ${out.toSeq}")
  }

  test("graft-ipc maxFilesPerTrigger: admission control bounds each micro-batch") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_stream_rate"
    val ckpt = dir + "_ckpt"
    for (d <- Seq(dir, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    // five 2-row files up front
    (1 to 5).foreach { i =>
      Seq((i.toLong, s"a$i"), (i + 100L, s"b$i")).toDF("k", "s").repartition(1)
        .write.format("graft-ipc").mode(if (i == 1) "overwrite" else "append").save(dir)
    }
    val epochs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-ipc")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) epochs.add(n): Unit
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      val sizes = epochs.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      assert(sizes.sum == 10, s"all rows must arrive exactly once: $sizes")
      assert(sizes.forall(_ <= 4), s"a micro-batch exceeded 2 files x 2 rows: $sizes")
      assert(sizes.length >= 3, s"5 files at 2/trigger needs >= 3 batches: $sizes")
    } finally q.stop()
  }

  test("observed metrics surface per micro-batch via StreamingQueryProgress") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Long, String)]
    val df = graft.ops.Observe.docMetricsStream(
      in.toDF().toDF("doc_id", "text"), "stage_metrics")
    val q = df.writeStream.format("memory").queryName("obs_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "hello"), (2L, "worlds!"))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("stage_metrics")))
      assert(metrics.nonEmpty, "no observedMetrics in any progress event")
      val m = metrics.last
      assert(m.getAs[Long]("rows") == 2 && m.getAs[Long]("chars") == 12 &&
        m.getAs[Int]("min_chars") == 5 && m.getAs[Int]("max_chars") == 7,
        s"unexpected metric row: $m")
    } finally q.stop()
  }

  test("graft-ipc Trigger.AvailableNow: drains the start-time snapshot in bounded batches, then stops") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_available_now"
    val ckpt = dir + "_ckpt"
    for (d <- Seq(dir, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (1 to 5).foreach { i =>
      Seq((i.toLong, s"a$i"), (i + 100L, s"b$i")).toDF("k", "s").repartition(1)
        .write.format("graft-ipc").mode(if (i == 1) "overwrite" else "append").save(dir)
    }
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-ipc")
      .option("maxFilesPerTrigger", "2").load(dir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        if (n > 0) sizes.add(n): Unit
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    // AvailableNow must TERMINATE by itself once the snapshot drains
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val got = sizes.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(got.sum == 10, s"all seeded rows exactly once: $got")
    assert(got.forall(_ <= 4), s"admission control must bound batches: $got")
    assert(got.length >= 3, s"5 files at 2/trigger needs >= 3 batches: $got")
  }

  test("graft-ipc micro-batch source: new files picked up exactly once") {
    val sp = spark
    import sp.implicits._
    val dir = "/tmp/graft_egress/ipc_stream_src"
    val ckpt = dir + "_ckpt"
    for (d <- Seq(dir, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    // seed the directory (also provides the inferred schema)
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(1)
      .write.format("graft-ipc").mode("overwrite").save(dir)
    val q = spark.readStream.format("graft-ipc").load(dir)
      .writeStream.format("memory").queryName("ipc_src")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("ipc_src").count() == 2)
      // drop two more whole files (mode append: job-unique final names)
      Seq((3L, "c")).toDF("k", "s").repartition(1)
        .write.format("graft-ipc").mode("append").save(dir)
      Seq((4L, "d")).toDF("k", "s").repartition(1)
        .write.format("graft-ipc").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("ipc_src").as[(Long, String)].collect().toSeq
      assert(got.size == 4, s"each file read exactly once, got $got")
      assert(got.toSet == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }

  test("checkpoint restart: ipc source -> ipc sink resumes exactly-once across a stop") {
    val sp = spark
    import sp.implicits._
    val src = "/tmp/graft_egress/ipc_restart_src"
    val dst = "/tmp/graft_egress/ipc_restart_dst"
    val ckpt = src + "_ckpt"
    for (d <- Seq(src, dst, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(1)
      .write.format("graft-ipc").mode("overwrite").save(src)
    def start() = spark.readStream.format("graft-ipc").load(src)
      .writeStream.format("graft-ipc")
      .option("path", dst).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // first incarnation consumes the seed files, then STOPS
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.format("graft-ipc").load(dst).count() == 2)
    // new files land while no query is running
    Seq((3L, "c")).toDF("k", "s").repartition(1)
      .write.format("graft-ipc").mode("append").save(src)
    Seq((4L, "d")).toDF("k", "s").repartition(1)
      .write.format("graft-ipc").mode("append").save(src)
    // second incarnation resumes from the CHECKPOINTED offset: the
    // already-delivered seed files must not replay, the offline
    // arrivals must all appear — exactly-once across the restart
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.format("graft-ipc").load(dst)
      .as[(Long, String)].collect().toSeq
    assert(got.size == 4, s"restart must neither drop nor duplicate: $got")
    assert(got.toSet == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("sinkToTableLog: streaming appends commit through the log " +
      "exactly-once, even across a FULL checkpoint loss") {
    val sp = spark
    import sp.implicits._
    val src = "/tmp/graft_egress/tlog_sink_src"
    val ckpt = src + "_ckpt"
    val root = src + "_table"
    for (d <- Seq(src, ckpt, root))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"row$i"), (i + 10L, s"row${i + 10}")).toDF("k", "s")
        .repartition(1).write.format("graft-ipc")
        .mode(if (i == 1) "overwrite" else "append").save(src)
    }
    def run(): Unit = {
      val q = graft.streaming.Streaming.sinkToTableLog(
        spark.readStream.format("graft-ipc")
          .option("maxFilesPerTrigger", "1").load(src),
        root, app = "ipc-loader", checkpoint = ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val afterFirst = graft.sources.TableLog.snapshot(spark, root)
      .as[(Long, String)].collect().toSet
    assert(afterFirst.size == 6, s"expected 6 ingested rows: $afterFirst")
    // catastrophic restart: checkpoint GONE, epochs replay from 0 —
    // the log's txn watermark (not the checkpoint) must dedupe them
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    run()
    val afterReplay = graft.sources.TableLog.snapshot(spark, root)
      .as[(Long, String)].collect().toSeq
    assert(afterReplay.size == 6,
      s"checkpoint-loss replay duplicated rows: ${afterReplay.size}")
    assert(afterReplay.toSet == afterFirst)
    // the ingested stream is incrementally consumable from the log
    assert(graft.sources.TableLog.changesSince(spark, root, -1)
      .count() == 6)
  }

  // ---- TableLog streaming SOURCE -----------------------------------------

  private def freshLogDirs(name: String): (String, String) = {
    val root = s"/tmp/graft_egress/$name"
    val ckpt = root + "_ckpt"
    for (d <- Seq(root, ckpt))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    (root, ckpt)
  }

  test("log stream source: resumes exactly-once across restart; reorganizations never re-emit") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src")
    val TL = graft.sources.TableLog
    TL.append(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    TL.append(spark, root, Seq((3L, "c")).toDF("k", "s"))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-log-stream")
        .option("path", root).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[(Long, String)].collect().foreach(out.add): Unit
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(out.asScala.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // offline: one more append AND a compaction (dataChange=false
    // rewrite of every live file) — the restart must emit ONLY the
    // append; the compaction's re-added files are a reorganization
    TL.append(spark, root, Seq((4L, "d")).toDF("k", "s"))
    TL.compact(spark, root, 1)
    out.clear()
    drain()
    assert(out.asScala.toSeq == Seq((4L, "d")),
      s"restart re-emitted or dropped rows: ${out.asScala.toSeq}")
  }

  test("log stream source: startingVersion=latest pins at FIRST start — " +
      "a restart emits the commits landed while the stream was down") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_latest")
    val TL = graft.sources.TableLog
    TL.append(spark, root, Seq((1L, "a")).toDF("k", "s")) // v0, pre-start
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-log-stream")
        .option("path", root).option("startingVersion", "latest").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[(Long, String)].collect().foreach(out.add): Unit
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    drain()
    assert(out.isEmpty, s"latest must skip pre-start commits: ${out.asScala}")
    // commits land WHILE THE STREAM IS DOWN — a restart that
    // re-resolved "latest" would skip them forever (permanent loss)
    TL.append(spark, root, Seq((2L, "b")).toDF("k", "s"))
    TL.append(spark, root, Seq((3L, "c")).toDF("k", "s"))
    drain()
    assert(out.asScala.toSet == Set((2L, "b"), (3L, "c")),
      s"restart re-resolved startingVersion=latest and skipped " +
        s"offline commits: ${out.asScala.toSeq}")
  }

  test("log stream source: a mid-stream RENAME refuses loudly instead " +
      "of reading new files as silent nulls") {
    // the hazard is a rename while a source INSTANCE is live (its
    // declared schema was captured at creation; a restart legitimately
    // adopts the evolved schema and maps old files via the name
    // mapping) — so drive the Source API directly on one instance
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_ren")
    val TL = graft.sources.TableLog
    TL.append(spark, root, Seq((1L, "a")).toDF("k", "s"))
    val src = new graft.sources.TableLogStreamProvider().createSource(
      spark.sqlContext, ckpt + "/sources/0", None, "graft-log-stream",
      Map("path" -> root))
    try {
      // declared schema (k, s) is now pinned in this instance
      TL.renameColumn(spark, root, "s", "label")
      TL.append(spark, root, Seq((2L, "b")).toDF("k", "label"))
      val end = src.getOffset.get
      val e = intercept[IllegalStateException] { src.getBatch(None, end) }
      assert(e.getMessage.contains("renamed or dropped"),
        s"wrong refusal: ${e.getMessage}")
    } finally src.stop()
  }

  test("log stream source: change commits refuse loudly, skipChangeCommits skips them") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_chg")
    val TL = graft.sources.TableLog
    TL.append(spark, root, Seq((1L, "a"), (2L, "b"), (9L, "z")).toDF("k", "s"),
      statsCols = Seq("k"))
    TL.deleteRange(spark, root, "k", 9L, 9L)
    TL.append(spark, root, Seq((3L, "c")).toDF("k", "s"))
    def run(skip: Boolean): Seq[(Long, String)] = {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(ckpt + skip))
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
      val q = spark.readStream.format("graft-log-stream")
        .option("path", root).option("skipChangeCommits", skip.toString)
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.as[(Long, String)].collect().foreach(out.add): Unit
        }
        .option("checkpointLocation", ckpt + skip).outputMode("append").start()
      try { q.processAllAvailable(); out.asScala.toSeq }
      finally q.stop()
    }
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(skip = false)
    }
    assert(err.getMessage.contains("skipChangeCommits") ||
      Option(err.getCause).exists(_.getMessage.contains("skipChangeCommits")),
      s"refusal must name the escape hatch: ${err.getMessage}")
    // skipChangeCommits: the delete commit vanishes from the feed —
    // append-only rows flow, the deleted row STAYS (append semantics)
    assert(run(skip = true).toSet ==
      Set((1L, "a"), (2L, "b"), (9L, "z"), (3L, "c")))
  }

  test("log stream source: admission control and startingVersion bound each batch") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_adm")
    val TL = graft.sources.TableLog
    (1 to 4).foreach(i => TL.append(spark, root, Seq((i.toLong, s"v$i")).toDF("k", "s")))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val q = spark.readStream.format("graft-log-stream")
      .option("path", root)
      .option("startingVersion", "1")      // skip the version-0 commit
      .option("maxCommitsPerTrigger", "1") // one commit per micro-batch
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.count().toInt): Unit
      }
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val sizes = batches.asScala.toSeq.filter(_ > 0)
    assert(sizes == Seq(1, 1, 1),
      s"expected 3 one-commit batches (versions 1..3), got $sizes")
  }

  test("log stream readChangeFeed: the full CDC feed streams, change commits included, exactly-once") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_cdf")
    val TL = graft.sources.TableLog
    val prev = spark.conf.getOption("spark.graft.tablelog.cdf")
    spark.conf.set("spark.graft.tablelog.cdf", "true")
    try {
      TL.append(spark, root, Seq((1L, 10.0), (2L, 20.0), (9L, 90.0))
        .toDF("k", "x"), statsCols = Seq("k"))
      TL.deleteRange(spark, root, "k", 9L, 9L)
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, String, Int)]
      def drain(): Unit = {
        val q = spark.readStream.format("graft-log-stream")
          .option("path", root).option("readChangeFeed", "true").load()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.as[(Long, Double, String, Int)].collect().foreach(out.add): Unit
          }
          .option("checkpointLocation", ckpt).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      drain()
      assert(out.asScala.toSet == Set(
        (1L, 10.0, "insert", 0), (2L, 20.0, "insert", 0),
        (9L, 90.0, "insert", 0), (9L, 90.0, "delete", 1)),
        s"CDF stream diverged from the feed: ${out.asScala.toSet}")
      // restart after a merge lands offline: only version 2's feed flows
      TL.merge(spark, root, Seq((1L, 11.0)).toDF("k", "x"), "k",
        statsCols = Seq("k"))
      out.clear()
      drain()
      assert(out.asScala.toSet ==
        TL.tableChanges(spark, root, 1).as[(Long, Double, String, Int)]
          .collect().toSet,
        "restarted CDF stream must equal the batch feed for the new range")
      assert(out.asScala.forall(_._4 == 2), "old versions re-emitted")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.tablelog.cdf", v)
      case None => spark.conf.unset("spark.graft.tablelog.cdf")
    }
  }

  test("log stream source: Trigger.AvailableNow drains present commits and terminates") {
    val sp = spark
    import sp.implicits._
    val (root, ckpt) = freshLogDirs("tlog_src_anow")
    val TL = graft.sources.TableLog
    TL.append(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    TL.append(spark, root, Seq((3L, "c")).toDF("k", "s"))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]
    val q = spark.readStream.format("graft-log-stream")
      .option("path", root).option("maxCommitsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.as[(Long, String)].collect().foreach(out.add): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // AvailableNow must drain BOTH commits (respecting the one-commit
    // admission cap per batch) and then terminate on its own
    assert(q.awaitTermination(60000), "AvailableNow query did not terminate")
    assert(out.asScala.toSet == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("log stream CDC loop: log -> stream transform -> log, exactly-once across incarnations") {
    val sp = spark
    import sp.implicits._
    val (src, ckpt) = freshLogDirs("tlog_loop_src")
    val (dst, _) = freshLogDirs("tlog_loop_dst")
    val TL = graft.sources.TableLog
    TL.append(spark, src, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"))
    def pump(): Unit = {
      val q = graft.streaming.Streaming.sinkToTableLog(
        spark.readStream.format("graft-log-stream").option("path", src).load()
          .withColumn("x2", col("x") * 2),
        dst, "loop", ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    pump()
    TL.append(spark, src, Seq((3L, 30.0)).toDF("k", "x"))
    pump() // second incarnation: only the new commit flows
    val got = TL.snapshot(spark, dst).as[(Long, Double, Double)]
      .collect().toSet
    assert(got == Set((1L, 10.0, 20.0), (2L, 20.0, 40.0), (3L, 30.0, 60.0)),
      s"CDC loop lost or duplicated rows: $got")
  }

  test("streaming drift: closed-window distributions fold to TVD, " +
      "skew flagged, balanced window clean") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val events = in.toDF().toDF("ts", "event_type")
    val q = Streaming.windowedTypeCounts(events).writeStream
      .format("memory").queryName("drift_counts")
      .outputMode("append").start()
    // reference profile: 50/50 click/view
    val ref = Map("click" -> 50L, "view" -> 50L)
    try {
      // 10:00 window mirrors the reference; 11:00 window is all-click
      val balanced = (0 until 4).map(i =>
        (ts(f"2024-01-01 10:${i * 10}%02d:00"),
          if (i % 2 == 0) "click" else "view"))
      val skewed = (0 until 4).map(i =>
        (ts(f"2024-01-01 11:${i * 10}%02d:00"), "click"))
      in.addData(balanced ++ skewed: _*)
      q.processAllAvailable()
      // the skewed events advance the watermark to 11:20, which closes
      // the 10:00 window — but the 11:00 window (closes at 12:10) must
      // NOT have emitted yet
      assert(sp.table("drift_counts")
        .filter(col("win_start") === ts("2024-01-01 11:00:00")).count() == 0,
        "open window emitted early")
      in.addData((ts("2024-01-01 13:00:00"), "view")) // advance watermark
      q.processAllAvailable()
      val closed = sp.table("drift_counts")
        .filter(col("win_start") < ts("2024-01-01 12:00:00"))
      val drift = Streaming.driftFold(closed, ref)
        .collect().map(r => r.getAs[java.sql.Timestamp]("win_start") ->
          (r.getAs[Double]("tvd"), r.getAs[Boolean]("drifted"))).toMap
      val (tvdBal, flagBal) = drift(ts("2024-01-01 10:00:00"))
      val (tvdSkew, flagSkew) = drift(ts("2024-01-01 11:00:00"))
      assert(tvdBal == 0.0 && !flagBal,
        s"reference-shaped window should read zero drift, got $tvdBal")
      assert(tvdSkew == 0.5 && flagSkew,
        s"all-click vs 50/50 is TVD 0.5, got $tvdSkew")
      // stream fold == batch fold over the identical rows
      val batch = Streaming.driftFold(Streaming.windowedTypeCounts(
        (balanced ++ skewed).toDF("ts", "event_type")), ref)
        .collect().map(r => r.getAs[java.sql.Timestamp]("win_start") ->
          (r.getAs[Double]("tvd"), r.getAs[Boolean]("drifted"))).toMap
      assert(batch == drift)
    } finally q.stop()
  }

  test("windowed top-k: streamed closed-window counts rank to the batch answer") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = Streaming.windowedUserCounts(events).writeStream
      .format("memory").queryName("topk_counts")
      .outputMode("append").start()
    try {
      // 10:00 window: user 1 ×3, user 2 ×2, users 3..5 ×1 — top-3 is
      // (1,3),(2,2),(3,1) with the id tie-break killing 4 and 5
      val base = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 5L).zipWithIndex.map {
        case (u, i) => (ts(f"2024-01-01 10:${i * 5}%02d:00"), u)
      }
      in.addData(base: _*)
      q.processAllAvailable()
      assert(sp.table("topk_counts").count() == 0, "window emitted early")
      in.addData((ts("2024-01-01 12:00:00"), 9L)) // advance the watermark
      q.processAllAvailable()
      val closed = sp.table("topk_counts")
        .filter(col("win_start") === ts("2024-01-01 10:00:00"))
      val ranked = graft.plans.TopKPerGroup(closed, Seq("win_start"),
        Seq("n" -> false, "user_id" -> true), 3)
        .select("user_id", "n").as[(Long, Long)].collect().toSet
      assert(ranked == Set((1L, 3L), (2L, 2L), (3L, 1L)),
        s"streamed top-3 diverged: $ranked")
      // batch twin over the identical rows gives the identical answer
      val batch = Streaming.windowedUserCounts(
        base.toDF("ts", "user_id"))
        .filter(col("win_start") === ts("2024-01-01 10:00:00"))
      val batchRanked = graft.plans.TopKPerGroup(batch, Seq("win_start"),
        Seq("n" -> false, "user_id" -> true), 3)
        .select("user_id", "n").as[(Long, Long)].collect().toSet
      assert(batchRanked == ranked)
    } finally q.stop()
  }

  test("streaming anomaly: closed-window means z-score against the " +
      "profile, shifted window flagged, in-profile window clean") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowedTypeStats(events).writeStream
      .format("memory").queryName("anomaly_stats")
      .outputMode("append").start()
    // reference profile: click ~ mean 10, sd 1 (values 9/11 alternating)
    val refEvents = Seq.tabulate(8)(i =>
      (ts(f"2024-01-01 01:${i * 5}%02d:00"), "click",
        if (i % 2 == 0) 9.0 else 11.0)).toDF("ts", "event_type", "value")
    val ref = Streaming.typeProfile(refEvents)
    try {
      // 10:00 window sits on the profile mean; 11:00 is shifted +10
      val calm = Seq.tabulate(4)(i =>
        (ts(f"2024-01-01 10:${i * 10}%02d:00"), "click", 10.0))
      val shifted = Seq.tabulate(4)(i =>
        (ts(f"2024-01-01 11:${i * 10}%02d:00"), "click", 20.0))
      in.addData(calm ++ shifted: _*)
      in.addData((ts("2024-01-01 13:00:00"), "click", 10.0)) // close 11:00
      q.processAllAvailable()
      val closed = sp.table("anomaly_stats")
        .filter(col("win_start") < ts("2024-01-01 12:00:00"))
      val out = Streaming.anomalyFold(closed, ref).collect()
        .map(r => r.getAs[Timestamp]("win_start") ->
          (r.getAs[Double]("z"), r.getAs[Boolean]("anomaly"))).toMap
      val (zCalm, aCalm) = out(ts("2024-01-01 10:00:00"))
      val (zShift, aShift) = out(ts("2024-01-01 11:00:00"))
      assert(math.abs(zCalm) < 1e-9 && !aCalm,
        s"on-profile window must read z=0, got $zCalm")
      // (20-10)/(1/sqrt(4)) = 20 standard errors
      assert(zShift > 3.0 && aShift, s"shifted window must flag, got $zShift")
      // stream fold == batch fold over the identical rows
      val batch = Streaming.anomalyFold(Streaming.windowedTypeStats(
        (calm ++ shifted).toDF("ts", "event_type", "value")), ref)
        .collect().map(r => r.getAs[Timestamp]("win_start") ->
          (r.getAs[Double]("z"), r.getAs[Boolean]("anomaly"))).toMap
      assert(batch == out)
    } finally q.stop()
  }

  test("csv drop-directory ingest is exactly-once across a stop/restart: " +
      "files dropped while the stream is down arrive once, committed " +
      "files never re-emit, malformed lines vanish under DROPMALFORMED") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("graft_csv_drop")
    val drop = base.resolve("drop"); val sink = base.resolve("sink")
    val ckpt = base.resolve("ckpt")
    java.nio.file.Files.createDirectories(drop)
    def dropFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(drop.resolve(name),
        lines.mkString("", "\n", "\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = sp.readStream.schema(schema)
        .option("mode", "DROPMALFORMED")
        .csv(drop.toString)
        .writeStream.format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    dropFile("a.csv", (0 until 50).map(i => s"$i,row$i"))
    run()
    assert(sp.read.parquet(sink.toString).count() == 50)
    // while the stream is DOWN: a new clean file + a junk file
    dropFile("b.csv", (50 until 100).map(i => s"$i,row$i"))
    dropFile("junk.csv", Seq("garbage,x", "###", "1,2,3,4,5"))
    run()
    val rows = sp.read.parquet(sink.toString).collect()
      .map(r => r.getLong(0)).sorted
    assert(rows.length == 100,
      s"exactly-once violated: ${rows.length} rows (dupes or losses)")
    assert(rows.toSeq == (0L until 100L),
      "restart re-emitted or dropped a committed file's rows")
  }

  test("json drop-directory ingest quarantines corrupt lines under " +
      "PERMISSIVE + columnNameOfCorruptRecord — counted, never silently " +
      "dropped, never polluting parsed rows") {
    val sp = spark
    val base = java.nio.file.Files.createTempDirectory("graft_json_drop")
    val drop = base.resolve("drop"); val sink = base.resolve("sink")
    val ckpt = base.resolve("ckpt")
    java.nio.file.Files.createDirectories(drop)
    java.nio.file.Files.writeString(drop.resolve("a.json"),
      (0 until 20).map(i => s"""{"id": $i, "s": "row$i"}""")
        .mkString("", "\n", "\n"))
    java.nio.file.Files.writeString(drop.resolve("junk.json"),
      "{\"id\": oops}\nnot json at all\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val q = sp.readStream.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(drop.toString)
      .writeStream.format("parquet")
      .option("path", sink.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = sp.read.parquet(sink.toString)
    assert(out.filter(col("_corrupt_record").isNotNull).count() == 2,
      "both junk lines must be quarantined with their raw text")
    val clean = out.filter(col("_corrupt_record").isNull)
    assert(clean.count() == 20)
    assert(clean.filter(col("id").isNull || col("s").isNull).count() == 0,
      "a corrupt line leaked nulls into the parsed rows")
  }
}
