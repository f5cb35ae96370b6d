package graft

import org.apache.spark.sql.functions._

/** The analogue of the reference's `assert_same_plan`
  * (`rust/datafusion/src/execution/table_impl.rs:196`): SQL and the
  * DataFrame/Table API lower to the same optimized logical plan, so
  * neither surface can drift from the other.
  */
class SessionSpec extends SparkSpec {

  private lazy val session: Session = {
    val s = Session(spark)
    s.registerFixtures(sfDir)
    s
  }

  private def normalized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString
      .replaceAll("#\\d+L?", "#?") // strip expression ids

  test("select/filter: SQL == Table API plan") {
    val sql = session.sql(
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 1000")
    val api = session.table("orders")
      .filter(col("o_totalprice") > 1000)
      .select(col("o_orderkey"), col("o_totalprice"))
    assert(normalized(sql) == normalized(api))
  }

  test("aggregate: SQL == Table API plan") {
    val sql = session.sql(
      "SELECT o_orderpriority, COUNT(1) AS n FROM orders GROUP BY o_orderpriority")
    val api = session.table("orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(normalized(sql) == normalized(api))
  }

  test("registration surfaces agree: registerTable vs registerParquet") {
    session.registerParquet("orders_p", s"$sfDir/orders.parquet")
    val a = session.table("orders_p").count()
    val b = session.table("orders").count()
    assert(a == b)
  }

  test("registerIpc/writeIpc round-trip through the connector surface") {
    val src = session.table("orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    session.writeIpc(src, "/tmp/graft_egress/session_ipc")
    session.registerIpc("orders_ipc", "/tmp/graft_egress/session_ipc")
    assert(session.sql("SELECT COUNT(*) FROM orders_ipc").head.getLong(0) ==
      src.count())
  }

  test("registerAvro/writeAvro round-trip through the session surface") {
    val src = session.table("orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    session.writeAvro(src, "/tmp/graft_egress/session_avro")
    session.registerAvro("orders_avro", "/tmp/graft_egress/session_avro")
    assert(session.sql(
      "SELECT COUNT(*) c, COUNT(DISTINCT o_orderstatus) s FROM orders_avro")
      .head.toSeq == Seq(src.count(), 3L))
  }

  test("extension-type metadata survives projection and parquet round-trip") {
    val e = graft.ops.Arrays.annotateVector(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding", 64)
    def meta(df: org.apache.spark.sql.DataFrame) =
      df.schema("embedding").metadata
    val projected = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    assert(meta(projected).getString("graft.ext_type") == "vector.float32")
    assert(meta(projected).getLong("graft.dim") == 64L)
    val out = "/tmp/graft_egress/ext_type_roundtrip"
    projected.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(meta(back).getString("graft.ext_type") == "vector.float32")
    assert(meta(back).getLong("graft.dim") == 64L)
  }

  test("lakehouse SQL: CREATE/MERGE/SELECT over graft_log equals the " +
      "programmatic TableLog path; non-log SQL falls through") {
    // the SQL-driven scenario is log_merge3 verbatim -> identical rows
    val viaSql = graft.ops.Sql.qSqlMergeLog(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.ops.Egress.qLogMerge3(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaApi, "SQL merge diverged from TableLog.mergeFull")
    // MERGE is one atomic commit on top of the CREATE: version 1
    val root = graft.ops.Egress.outRoot(sfDir) + "/tlog_sql_merge"
    val commits = graft.sources.TableLog.history(spark, root).count()
    assert(commits == 2, s"expected 2 commits, got $commits")
    // dispatch structure: plain SQL is untouched (None -> spark.sql)
    assert(graft.ops.LogSql.dispatch(spark, "SELECT 1 AS x").isEmpty)
    assert(graft.ops.LogSql.dispatch(spark,
      "CREATE TABLE t (x INT) USING parquet").isEmpty)
    // malformed merge clause fails loudly, not silently
    val e = intercept[IllegalArgumentException] {
      graft.ops.LogSql.dispatch(spark,
        s"MERGE INTO graft_log('$root') AS t USING (SELECT 1 AS k) AS s " +
        "ON t.k = s.k WHEN MATCHED THEN DELETE")
    }
    assert(e.getMessage.contains("unsupported MERGE clause") ||
      e.getMessage.contains("UPDATE"))
  }

  test("lakehouse SQL: WITH-CTE queries over graft_log dispatch like " +
      "bare SELECTs") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_cte").toString + "/t"
    graft.sources.TableLog.append(spark, root,
      (0 until 7).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    val session = Session(spark)
    val n = session.sql(
      s"WITH x AS (SELECT * FROM graft_log('$root') WHERE id >= 2) " +
        "SELECT COUNT(*) AS n FROM x").head.getLong(0)
    assert(n == 5, s"CTE over graft_log returned $n")
  }

  test("lakehouse SQL: DESCRIBE HISTORY / RESTORE / VACUUM statement " +
      "forms drive the lifecycle verbs") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_lifecycle").toString + "/t"
    val session = Session(spark)
    graft.sources.TableLog.append(spark, root,
      (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .repartition(2))                                           // v0
    graft.sources.TableLog.append(spark, root,
      (10 until 15).map(i => (i.toLong, s"r$i")).toDF("id", "s")
        .repartition(1))                                           // v1
    // DESCRIBE HISTORY: one row per commit, file accounting pinned
    val hist = session.sql(s"DESCRIBE HISTORY graft_log('$root')")
      .select("version", "n_add", "n_remove", "data_change")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getBoolean(3))).toSeq
    assert(hist == Seq((0, 2, 0, true), (1, 1, 0, true)), s"history: $hist")
    // RESTORE TABLE … TO VERSION AS OF: v1's rows gone, new commit
    val rv = session.sql(
      s"RESTORE TABLE graft_log('$root') TO VERSION AS OF 0")
      .head.getInt(0)
    assert(rv == 2, s"restore must commit a new version, got $rv")
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 10)
    // VACUUM … RETAIN FROM VERSION: v1's file reclaimed (no retained
    // version reaches it), time travel to it refuses, live unaffected
    val reclaimed = session.sql(
      s"VACUUM graft_log('$root') RETAIN FROM VERSION 2")
      .head.getInt(0)
    assert(reclaimed == 1, s"expected 1 reclaimed file, got $reclaimed")
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 10)
    // statements that aren't lifecycle forms still fall through
    assert(graft.ops.LogSql.dispatch(spark, "DESCRIBE HISTORY t").isEmpty)
  }

  test("lakehouse SQL: INSERT INTO, ALTER TABLE column/constraint " +
      "verbs, OPTIMIZE, and SHALLOW CLONE all dispatch") {
    val sp = spark; import sp.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_ddl").toString
    val root = base + "/t"
    val session = Session(spark)
    session.sql(s"CREATE TABLE graft_log('$root') AS " +
      "SELECT * FROM (VALUES (1, 10.0), (2, 20.0)) AS t(id, price)")
    // INSERT INTO appends one commit
    session.sql(s"INSERT INTO graft_log('$root') " +
      "SELECT * FROM (VALUES (3, 30.0)) AS t(id, price)")
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 3)
    // ADD COLUMN declares a nullable column without touching files
    session.sql(s"ALTER TABLE graft_log('$root') ADD COLUMN note STRING")
    assert(graft.sources.TableLog.snapshot(spark, root)
      .filter(col("note").isNull).count() == 3)
    // RENAME + DROP round out the evolution verbs
    session.sql(s"ALTER TABLE graft_log('$root') RENAME COLUMN note TO memo")
    session.sql(s"ALTER TABLE graft_log('$root') DROP COLUMN memo")
    assert(!graft.sources.TableLog.snapshot(spark, root)
      .columns.contains("memo"))
    // CHECK constraints: violating insert refuses, drop lifts the gate
    session.sql(s"ALTER TABLE graft_log('$root') " +
      "ADD CONSTRAINT pos CHECK (price > 0)")
    intercept[Exception] {
      session.sql(s"INSERT INTO graft_log('$root') " +
        "SELECT * FROM (VALUES (4, -1.0)) AS t(id, price)")
    }
    session.sql(s"ALTER TABLE graft_log('$root') DROP CONSTRAINT pos")
    session.sql(s"INSERT INTO graft_log('$root') " +
      "SELECT * FROM (VALUES (4, -1.0)) AS t(id, price)")
    // OPTIMIZE compacts to one file, answers unchanged
    session.sql(s"OPTIMIZE graft_log('$root')")
    val snap = graft.sources.TableLog.snapshot(spark, root)
    assert(snap.count() == 4 && snap.inputFiles.length == 1)
    // SHALLOW CLONE branches with zero data copies and diverges
    val dst = base + "/clone"
    session.sql(s"CREATE TABLE graft_log('$dst') " +
      s"SHALLOW CLONE graft_log('$root')")
    session.sql(s"INSERT INTO graft_log('$dst') " +
      "SELECT * FROM (VALUES (99, 9.0)) AS t(id, price)")
    assert(graft.sources.TableLog.snapshot(spark, dst).count() == 5)
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 4,
      "clone divergence leaked into the source")
  }

  test("SQL-vs-programmatic equivalence fuzz: 25 random DML/layout/" +
      "restore steps drive twin tables to identical snapshots") {
    val sp = spark; import sp.implicits._
    import graft.sources.TableLog
    val base = java.nio.file.Files
      .createTempDirectory("graft_sqlfuzz").toString
    val rootA = base + "/sql"     // driven by statement text
    val rootB = base + "/api"     // driven by the programmatic verbs
    val session = Session(spark)
    val rnd = new scala.util.Random(20260815L)
    def freshRows(n: Int, keyBase: Long): Seq[(Long, Long)] =
      (0 until n).map(i => (keyBase + i, rnd.nextInt(1000).toLong))
    def valuesSql(rows: Seq[(Long, Long)]): String =
      rows.map { case (k, v) => s"($k, $v)" }.mkString(
        "SELECT * FROM (VALUES ", ", ", ") AS t(k, v)")
    val init = freshRows(20, 0)
    session.sql(s"CREATE TABLE graft_log('$rootA') AS ${valuesSql(init)}")
    TableLog.append(spark, rootB, init.toDF("k", "v"))
    var nextKey = 1000L
    for (step <- 1 to 25) {
      rnd.nextInt(6) match {
        case 0 => // INSERT vs append
          val rows = freshRows(1 + rnd.nextInt(5), nextKey)
          nextKey += 100
          session.sql(s"INSERT INTO graft_log('$rootA') ${valuesSql(rows)}")
          TableLog.append(spark, rootB, rows.toDF("k", "v"))
        case 1 => // UPDATE vs update (zero-match no-ops included)
          val m = 2 + rnd.nextInt(6); val r = rnd.nextInt(m)
          val d = rnd.nextInt(50)
          session.sql(s"UPDATE graft_log('$rootA') SET v = v + $d " +
            s"WHERE k % $m = $r")
          TableLog.update(spark, rootB, col("k") % m === r,
            Map("v" -> (col("v") + d)))
        case 2 => // DELETE vs deleteVector
          val m = 3 + rnd.nextInt(7); val r = rnd.nextInt(m)
          session.sql(s"DELETE FROM graft_log('$rootA') WHERE k % $m = $r " +
            s"AND v < 500")
          TableLog.deleteVector(spark, rootB,
            col("k") % m === r && col("v") < 500)
        case 3 => // three-clause MERGE vs mergeFull
          val src = freshRows(3, nextKey) ++
            Seq((rnd.nextInt(20).toLong, 777L)) // one likely-matching key
          nextKey += 100
          session.sql(s"MERGE INTO graft_log('$rootA') AS t " +
            s"USING (${valuesSql(src)}) AS s ON t.k = s.k " +
            "WHEN MATCHED THEN UPDATE SET v = s.v " +
            "WHEN NOT MATCHED THEN INSERT *")
          TableLog.mergeFull(spark, rootB, src.toDF("k", "v"), "k",
            lit(true), Map("v" -> col("src_v")), lit(false),
            insertUnmatched = true)
        case 4 => // OPTIMIZE vs compact (layout only, answers invariant)
          val n = 1 + rnd.nextInt(3)
          session.sql(s"OPTIMIZE graft_log('$rootA') INTO $n FILES")
          TableLog.compact(spark, rootB, n)
        case 5 => // RESTORE vs restore — identical op sequences keep
          // the twin version lines in lockstep, so one random target
          // version is valid for both
          val vs = TableLog.versions(spark, rootA)
          assert(vs == TableLog.versions(spark, rootB),
            s"step $step: version lines diverged — sql=$vs " +
              s"api=${TableLog.versions(spark, rootB)}")
          val tgt = vs(rnd.nextInt(vs.size))
          session.sql(
            s"RESTORE TABLE graft_log('$rootA') TO VERSION AS OF $tgt")
          TableLog.restore(spark, rootB, tgt)
      }
      val a = TableLog.snapshot(spark, rootA)
        .as[(Long, Long)].collect().sorted.toSeq
      val b = TableLog.snapshot(spark, rootB)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(a == b, s"step $step: SQL and programmatic tables " +
        s"diverged — |sql|=${a.size} |api|=${b.size}")
    }
  }

  test("lakehouse SQL: MERGE SET accepts alias-qualified targets, " +
      "refuses unknown/source columns, and literals survive alias " +
      "mapping") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_mergeset").toString + "/t"
    graft.sources.TableLog.append(spark, root,
      Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "price", "note"))
    val session = Session(spark)
    // t.price (Delta's qualified form) maps to the bare target column;
    // the literal 'per s. smith' contains "<srcAlias>. " and must
    // reach the table VERBATIM, never as 'per src_smith'
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 99.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET t.price = s.price, " +
        "note = 'per s. smith'")
    val got = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(got == ((99.0, "per s. smith")), s"got $got")
    // a misspelled SET column refuses loudly instead of no-oping
    val bad = intercept[IllegalArgumentException] {
      session.sql(
        s"MERGE INTO graft_log('$root') AS t " +
          "USING (SELECT 1 AS k, 5.0 AS price) AS s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET pricee = s.price")
    }
    assert(bad.getMessage.contains("unknown target column"))
    // assigning INTO the source is rejected at parse time
    val srcLhs = intercept[IllegalArgumentException] {
      session.sql(
        s"MERGE INTO graft_log('$root') AS t " +
          "USING (SELECT 1 AS k, 5.0 AS price) AS s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET s.price = 5.0")
    }
    assert(srcLhs.getMessage.contains("assigns target columns"))
    // ESCAPED quotes inside literals must not desync the alias
    // scanner: backslash ('it\'s s. x') and doubling ('it''s s. y')
    // both keep the scanner in-literal, so the "s. " inside stays
    // verbatim AND the s.price AFTER the literal still maps
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 77.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET note = 'it\\'s s. smith', " +
        "t.price = s.price")
    val esc = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(esc == ((77.0, "it's s. smith")), s"got $esc")
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 88.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET note = 'it''s s. jones', " +
        "t.price = s.price")
    val dbl = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(dbl == ((88.0, "it's s. jones")), s"got $dbl")
    // comments are opaque to the alias scanner (codeMask): an `s.`
    // inside a bracketed comment stays verbatim for Catalyst — only
    // the code-segment s.price maps to the src_ frame name
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 66.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET note = 'c', " +
        "t.price = /* not s.price here */ s.price")
    val cmt = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(cmt == ((66.0, "c")), s"got $cmt")
  }

  test("lakehouse SQL: clause keywords inside literals and CASE arms " +
      "do not split MERGE/UPDATE — boundaries come from the masked scan") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_kwlit").toString + "/t"
    graft.sources.TableLog.append(spark, root,
      Seq((1L, 10.0, "x"), (2L, 20.0, "y")).toDF("k", "price", "note"))
    val session = Session(spark)
    // a SET literal containing " WHEN " must not start a new clause,
    // and one containing " WHERE " must not end an UPDATE's SET list
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 42.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET t.price = s.price, " +
        "note = 'use WHERE wisely WHEN in doubt'")
    val m1 = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(m1 == ((42.0, "use WHERE wisely WHEN in doubt")), s"got $m1")
    // a CASE expression in the SET value: its WHEN/THEN belong to the
    // expression, not the clause structure
    session.sql(
      s"MERGE INTO graft_log('$root') AS t " +
        "USING (SELECT 1 AS k, 80.0 AS price) AS s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET t.price = " +
        "CASE WHEN s.price > 50 THEN s.price ELSE 0.0 END, note = 'case'")
    val m2 = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 1L).select("price", "note")
      .as[(Double, String)].head()
    assert(m2 == ((80.0, "case")), s"got $m2")
    // UPDATE: SET literal with " WHERE " — the real WHERE still found
    session.sql(
      s"UPDATE graft_log('$root') " +
        "SET note = 'see WHERE it lands' WHERE k = 2")
    val u = graft.sources.TableLog.snapshot(spark, root)
      .filter(col("k") === 2L).select("note").as[String].head()
    assert(u == "see WHERE it lands", s"got $u")
    // the other rows are untouched
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 2)
  }

  test("lakehouse SQL: INSERT INTO and CREATE TABLE AS can read " +
      "OTHER graft_log tables in their source query") {
    val sp = spark; import sp.implicits._
    val srcRoot = java.nio.file.Files
      .createTempDirectory("graft_ins_src").toString + "/t"
    val dstRoot = java.nio.file.Files
      .createTempDirectory("graft_ins_dst").toString + "/t"
    graft.sources.TableLog.append(spark, srcRoot,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val session = Session(spark)
    session.sql(s"CREATE TABLE graft_log('$dstRoot') AS " +
      s"SELECT id, s FROM graft_log('$srcRoot') WHERE id = 1")
    assert(graft.sources.TableLog.snapshot(spark, dstRoot).count() == 1)
    session.sql(s"INSERT INTO graft_log('$dstRoot') " +
      s"SELECT id, s FROM graft_log('$srcRoot') WHERE id = 2")
    val ids = graft.sources.TableLog.snapshot(spark, dstRoot)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L), s"got $ids")
  }

  test("lakehouse SQL: a graft_log reference inside a literal or " +
      "comment stays verbatim — only code references resolve") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_ref_mask").toString + "/t"
    graft.sources.TableLog.append(spark, root,
      Seq((1L, "a")).toDF("id", "s"))
    val session = Session(spark)
    // the literal mentions a NONEXISTENT root: resolving it would
    // throw from TableLog.snapshot, so passing proves it stayed text
    val got = session.sql(
      "SELECT id, 'see graft_log(''/nonexistent'') docs' AS note " +
        s"FROM graft_log('$root') -- graft_log('/alsonot')\n" +
        "WHERE id = 1").collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "see graft_log('/nonexistent') docs")
  }

  test("lakehouse SQL: a comment header/trailer does not stop a " +
      "statement head from dispatching") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_hdr").toString + "/t"
    val session = Session(spark)
    session.sql(s"-- pipeline: nightly\nCREATE TABLE graft_log('$root') " +
      "AS SELECT 1 AS k, CAST(10.0 AS DOUBLE) AS v -- initial load")
    session.sql(s"/* step 2 */ UPDATE graft_log('$root') " +
      "SET v = CAST(20.0 AS DOUBLE) WHERE k = 1 -- bump")
    val got = graft.sources.TableLog.snapshot(spark, root)
      .select("v").as[Double].head()
    assert(got == 20.0, s"got $got")
  }

  test("lakehouse SQL: CREATE refuses an existing table; CREATE OR " +
      "REPLACE overwrites in one commit") {
    val sp = spark; import sp.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_create").toString + "/t"
    val session = Session(spark)
    session.sql(
      s"CREATE TABLE graft_log('$root') AS SELECT 1 AS id, 'a' AS s")
    // a retried CREATE must fail loudly, not silently double the rows
    val e = intercept[IllegalArgumentException] {
      session.sql(
        s"CREATE TABLE graft_log('$root') AS SELECT 1 AS id, 'a' AS s")
    }
    assert(e.getMessage.contains("already exists"))
    assert(graft.sources.TableLog.snapshot(spark, root).count() == 1)
    session.sql(s"CREATE OR REPLACE TABLE graft_log('$root') AS " +
      "SELECT * FROM (VALUES (10, 'r'), (11, 'r')) AS t(id, s)")
    val snap = graft.sources.TableLog.snapshot(spark, root)
      .orderBy("id").as[(Int, String)].collect().toSeq
    assert(snap == Seq((10, "r"), (11, "r")), s"got $snap")
  }
}
