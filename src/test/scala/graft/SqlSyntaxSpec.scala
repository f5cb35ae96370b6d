package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.SqlSyntax

/** QUALIFY / DISTINCT ON rewrites (ops/SqlSyntax): result parity with
  * the hand-written window forms, scanner literal/subquery safety, and
  * the refusal contracts. */
class SqlSyntaxSpec extends SparkSpec {

  private def sess = Session(spark)
  private def orders = graft.sources.Tables(spark, sfDir, "orders")
  private def customer = graft.sources.Tables(spark, sfDir, "customer")

  test("QUALIFY equals the hand-written window-subquery form") {
    sess.registerTable("orders", orders)
    val got = sess.sql(graft.ops.Sql.qualifySql).collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders
      .filter(col("o_custkey") % 25 === 3)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
    assert(!got.head.schema.fieldNames.contains("__qualify__"))
  }

  test("DISTINCT ON equals the row_number()=1 window form") {
    sess.registerTable("customer", customer)
    val got = sess.sql(graft.ops.Sql.distinctOnSql).collect()
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = customer
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
      .collect()
    assert(got.toSeq == want.toSeq)
  }

  test("QUALIFY inside a string literal or subquery does not trigger") {
    assert(SqlSyntax.findTopLevel(
      "SELECT 'no QUALIFY here' AS s FROM t", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT * FROM (SELECT a FROM t QUALIFY rn <= 2) q", "QUALIFY").isEmpty)
    // and word boundaries: DISQUALIFY / QUALIFYING are not the keyword
    assert(SqlSyntax.findTopLevel(
      "SELECT disqualify, qualifying FROM t", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t QUALIFY rn = 1", "QUALIFY").isDefined)
  }

  test("DISTINCT ON without ORDER BY is refused") {
    val e = intercept[IllegalArgumentException] {
      SqlSyntax.rewriteDistinctOn(
        "SELECT DISTINCT ON (a) a, b FROM t")
    }
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("ORDER BY ALL equals the explicit ordinal ordering, nulls last") {
    val lineitem = graft.sources.Tables(spark, sfDir, "lineitem")
    sess.registerTable("lineitem", lineitem)
    val got = sess.sql(graft.ops.Sql.orderByAllSql).collect()
    val want = spark.sql(
      """SELECT l_returnflag, l_linestatus, l_linenumber, COUNT(*) AS n
         FROM lineitem WHERE l_quantity >= 30
         GROUP BY ALL ORDER BY 1, 2, 3, 4""").collect()
    assert(got.toSeq == want.toSeq)
    // DESC direction propagates to every ordinal
    val desc = SqlSyntax.rewriteOrderByAll(
      "SELECT a, b FROM t ORDER BY ALL DESC LIMIT 5").get
    assert(desc.contains("ORDER BY 1 DESC NULLS LAST, 2 DESC NULLS LAST"))
    assert(desc.endsWith("LIMIT 5"))
    // a CTE body's ORDER BY ALL (inside parens) is not this query's
    assert(SqlSyntax.findTopLevel(
      "WITH c AS (SELECT a FROM t ORDER BY ALL) SELECT a FROM c",
      "ORDER BY ALL").isEmpty)
  }

  test("ks_drift: identical halves accept; disjoint halves reject exactly") {
    val sp = spark; import sp.implicits._
    // the fixture rows: D should be small and both features present
    val rows = graft.ops.Quality.qKsDrift(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("hour", "val"))
    rows.foreach { r =>
      val d = r.getDouble(4)
      assert(d >= 0.0 && d <= 1.0)
      assert(!r.getBoolean(6), s"balanced halves must not reject: $r")
    }
    // synthetic check of the exact integer rejection: two fully
    // disjoint halves (even ids in bucket 0, odd in bucket 1) have
    // D = 1, which any critical value rejects
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) 0.0 else 9.9))
      .toDF("event_id", "value")
    // reuse the operator's arithmetic inline on the synthetic frame
    val cum = df.select(col("event_id"),
      (col("value") * 10).cast("bigint").as("bucket"))
      .groupBy("bucket").agg(
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L)).as("cb"))
      .collect().sortBy(_.getLong(0))
    val (na, nb) = (cum.map(_.getLong(1)).sum, cum.map(_.getLong(2)).sum)
    var (cuma, cumb, num) = (0L, 0L, 0L)
    cum.foreach { r =>
      cuma += r.getLong(1); cumb += r.getLong(2)
      num = math.max(num, math.abs(cuma * nb - cumb * na))
    }
    assert(num == na * nb) // D = 1 at the first bucket boundary
    assert(BigInt(num) * num * 10000 >
      BigInt(18496) * na * nb * (na + nb)) // the exact reject fires
  }

  test("SELECT * EXCLUDE drops the columns and prunes them from the scan") {
    val documents = graft.sources.Tables(spark, sfDir, "documents")
    sess.registerTable("documents", documents)
    val df = sess.sql(graft.ops.Sql.selectExcludeSql)
    assert(df.columns.toSeq == Seq("doc_id", "lang", "source", "n_chars"))
    // the excluded payload column must not be read: column pruning
    // reaches through the post-sort drop to the parquet scan
    val scan = df.queryExecution.executedPlan.toString
    assert(!scan.contains("text"), s"text survived into the scan:\n$scan")
    val want = documents.filter(col("n_chars") >= 200)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")).limit(25).collect()
    assert(df.collect().toSeq == want.toSeq)
  }

  test("SELECT * REPLACE swaps in place: name, position, and ORDER BY") {
    val documents = graft.sources.Tables(spark, sfDir, "documents")
    sess.registerTable("documents", documents)
    val df = sess.sql(graft.ops.Sql.selectReplaceSql)
    // position and names preserved — only the values changed
    assert(df.columns.toSeq == documents.columns.toSeq)
    val want = documents
      .withColumn("n_chars", col("n_chars") / 100)
      .withColumn("lang", upper(col("lang")))
      .filter(col("doc_id") % 40 === 7)
      .orderBy(col("n_chars"), col("doc_id")).limit(30).collect()
    assert(df.collect().toSeq == want.toSeq)
    // unknown replaced column refuses loudly
    val e = intercept[IllegalArgumentException] {
      graft.ops.SqlSyntax.rewriteReplace(spark,
        "SELECT * REPLACE (1 AS nope) FROM documents")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("asof_nearest: past wins ties, forward used only when closer") {
    val sp = spark; import sp.implicits._
    // purchases at t=100; clicks at 90 (d=10), 105 (d=5), 120 (d=20)
    val events = Seq(
      (1L, 100L, 7L, "purchase"),
      (2L, 90L, 7L, "click"), (3L, 105L, 7L, "click"),
      (4L, 120L, 7L, "click"),
      // user 8: equidistant clicks (95, 105) — backward wins
      (5L, 100L, 8L, "purchase"),
      (6L, 95L, 8L, "click"), (7L, 105L, 8L, "click"),
      // user 9: no clicks at all
      (8L, 50L, 9L, "purchase")
    ).toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("asof_nearest").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.ops.Temporal.qAsofNearest(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Long.MinValue else r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 3L, -5L),          // forward click at 105 beats backward 90
      (5L, 6L, 5L),           // tie at d=5: the PAST click wins
      (8L, -1L, Long.MinValue) // no clicks: null match, null gap
    ))
  }

  test("LIMIT WITH TIES keeps the full tie group of the n-th row") {
    val lineitem = graft.sources.Tables(spark, sfDir, "lineitem")
    sess.registerTable("lineitem", lineitem)
    val got = sess.sql(graft.ops.Sql.limitTiesSql)
    assert(got.columns.toSeq == Seq("qty"))
    val rows = got.collect().map(_.getInt(0))
    assert(rows.length >= 100, "WITH TIES can only extend past the limit")
    // every kept qty's ENTIRE tie group is present: the max kept qty's
    // full count in the base table equals its count in the result
    val maxQty = rows.max
    val fullCount = lineitem
      .filter(col("l_quantity").cast("int") === maxQty).count()
    assert(rows.count(_ == maxQty).toLong == fullCount,
      s"tie group of qty=$maxQty was cut")
    // refusal: no ORDER BY → no tie definition
    val e = intercept[IllegalArgumentException] {
      graft.ops.SqlSyntax.rewriteLimitTies(spark,
        "SELECT a FROM t LIMIT 5 WITH TIES")
    }
    assert(e.getMessage.contains("ORDER BY"))
  }

  test("SQL PIVOT and UNPIVOT clauses match their classic renditions") {
    sess.registerTable("orders", orders)
    sess.registerTable("customer", customer)
    val pivot = sess.sql(graft.ops.Sql.pivotClauseSql).collect()
    val pivotWant = spark.sql(graft.ops.Sql.qSqlPivotOracleSql).collect()
    assert(pivot.length == pivotWant.length)
    assert(pivot.toSeq == pivotWant.toSeq)
    val unpivot = sess.sql(graft.ops.Sql.unpivotClauseSql).collect()
    val unpivotWant = spark.sql(graft.ops.Sql.qSqlUnpivotOracleSql).collect()
    assert(unpivot.toSeq == unpivotWant.toSeq)
  }

  test("keyword collisions do not hijack valid SQL") {
    val sp = spark; import sp.implicits._
    Seq((1L, 2L), (3L, 4L)).toDF("qualify", "ties")
      .createOrReplaceTempView("kwtab")
    // a CTE named `ties` + LIMIT: not a WITH TIES clause
    assert(sess.sql(
      "WITH ties AS (SELECT qualify FROM kwtab) SELECT qualify FROM ties LIMIT 5")
      .count() == 2)
    // a column literally named qualify, before and after FROM
    assert(sess.sql("SELECT qualify FROM kwtab ORDER BY qualify")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(sess.sql("SELECT ties FROM kwtab WHERE qualify = 1")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("QUALIFY predicate may reference columns the select list drops") {
    sess.registerTable("orders", orders)
    val got = sess.sql("""
      SELECT o_orderkey FROM orders
      WHERE o_custkey % 50 = 3
      QUALIFY row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey) = 1
      ORDER BY o_orderkey""")
    assert(got.columns.toSeq == Seq("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.filter(col("o_custkey") % 50 === 3)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_orderkey")).orderBy(col("o_orderkey")).collect()
    assert(got.collect().toSeq == want.toSeq)
  }

  test("extension clauses compose: EXCLUDE + WITH TIES in one statement") {
    val documents = graft.sources.Tables(spark, sfDir, "documents")
    sess.registerTable("documents", documents)
    val got = sess.sql("""
      SELECT * EXCLUDE (text, doc_id) FROM documents
      ORDER BY n_chars LIMIT 10 WITH TIES""")
    assert(got.columns.toSeq == Seq("lang", "source", "n_chars"))
    val kept = got.collect().map(_.getLong(2))
    assert(kept.length >= 10)
    // the 10th value's full tie group survives
    val nth = kept.sorted.apply(9)
    assert(kept.count(_ == nth).toLong ==
      documents.filter(col("n_chars") === nth).count())
  }

  test("DISTINCT ON allows arithmetic asterisks, refuses star items") {
    val r = SqlSyntax.rewriteDistinctOn(
      "SELECT DISTINCT ON (a) a, b * 2 AS b2 FROM t ORDER BY a, b2").get
    assert(r.contains("b * 2 AS b2"))
    val e = intercept[IllegalArgumentException] {
      SqlSyntax.rewriteDistinctOn(
        "SELECT DISTINCT ON (a) * FROM t ORDER BY a")
    }
    assert(e.getMessage.contains("explicit"))
  }

  test("WITH TIES refuses ordinal sort keys (constants inside the window)") {
    sess.registerTable("orders", orders)
    val e = intercept[IllegalArgumentException] {
      sess.sql("SELECT o_orderkey FROM orders ORDER BY 1 LIMIT 5 WITH TIES")
    }
    assert(e.getMessage.contains("ordinal"))
  }

  test("psi/ks drift order NULL buckets last, matching DuckDB's default") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nullbkt").toString
    // one null value → one NULL 'val' bucket on the even side
    (0L until 100L).map(i => (i, if (i == 0) None else Some(i.toDouble)))
      .toDF("event_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("event_id") * 1000000L))
      .withColumn("event_type", org.apache.spark.sql.functions.lit("click"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val psi = graft.ops.Quality.qPsiDrift(spark, dir)
      .filter(col("feature") === "val").collect()
    assert(psi.last.isNullAt(1), "NULL bucket must sort LAST (DuckDB default)")
    assert(psi.init.forall(!_.isNullAt(1)))
    val ks = graft.ops.Quality.qKsDrift(spark, dir).collect()
    ks.foreach(r => assert(!r.isNullAt(6), "rejected must never be NULL"))
  }

  test("named WINDOW clause and VALUES inline tables run natively") {
    sess.registerTable("orders", orders)
    sess.registerTable("customer", customer)
    val win = sess.sql(graft.ops.Sql.namedWindowSql).collect()
    assert(win.nonEmpty)
    // rn restarts per customer and the running total is monotone in it
    win.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getDouble(3)).toSeq ==
        sorted.map(_.getDouble(3)).sorted.toSeq)
    }
    val v = sess.sql(graft.ops.Sql.valuesSql).collect()
    assert(v.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((0, "alpha"), (1, "beta"), (2, "gamma")))
    assert(v.map(_.getLong(2)).sum ==
      customer.count()) // every customer lands in exactly one band
  }

  test("psi_drift: smoothed buckets, finite values, integer row identity") {
    val rows = graft.ops.Quality.qPsiDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val feats = rows.map(_.getString(0)).distinct.sorted
    assert(feats.toSeq == Seq("type", "val"))
    rows.foreach { r =>
      val psi = r.getDouble(4)
      assert(!psi.isNaN && !psi.isInfinite, s"non-finite PSI in $r")
      // identical halves give PSI 0; a bucket with ca=cb must be ~0
      if (r.getLong(2) == r.getLong(3)) assert(math.abs(psi) < 1e-3)
    }
  }

  // ---- ASOF JOIN -----------------------------------------------------------

  test("ASOF JOIN clause equals the Temporal.asofJoin API on events") {
    val e = graft.sources.Tables(spark, sfDir, "events")
      .withColumn("t_us", unix_micros(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("t_us"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("t_us").as("click_us"))
      .agg(max(col("event_id")).as("click_id"))
    sess.registerTable("asof_p", purchases)
    sess.registerTable("asof_c", clicks)
    val got = sess.sql("""
      SELECT p.purchase_id, p.user_id, c.click_id, c.click_us
      FROM asof_p p ASOF LEFT JOIN asof_c c
        ON p.user_id = c.user_id AND p.t_us >= c.click_us
      ORDER BY p.purchase_id""").collect()
    val want = graft.ops.Temporal.asofJoin(purchases, clicks, "user_id",
      "t_us", "click_us", payload = Seq("click_id", "click_us"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("click_us"))
      .orderBy("purchase_id").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.length == purchases.count()) // LEFT keeps unmatched
  }

  test("ASOF JOIN: strictness and direction tie semantics on a " +
      "coincident-time fixture") {
    val l = spark.sql("SELECT * FROM VALUES (1, 10L), (2, 20L) AS t(id, t)")
    val r = spark.sql(
      "SELECT * FROM VALUES (10L, 'at10'), (15L, 'at15'), (25L, 'at25') AS t(rt, tag)")
    sess.registerTable("asof_l", l)
    sess.registerTable("asof_r", r)
    def q(op: String, left: Boolean = true): Seq[(Int, Any)] =
      sess.sql(s"""SELECT a.id, b.tag FROM asof_l a ASOF ${if (left) "LEFT " else ""}JOIN asof_r b
        ON a.t $op b.rt ORDER BY a.id""").collect()
        .map(x => (x.getInt(0), x.get(1))).toSeq
    // backward inclusive: id1 matches the coincident at10
    assert(q(">=") == Seq((1, "at10"), (2, "at15")))
    // backward strict: the coincident row is excluded -> id1 unmatched
    assert(q(">") == Seq((1, null), (2, "at15")))
    // forward inclusive: id1 takes at10, id2 the next-ahead at25
    assert(q("<=") == Seq((1, "at10"), (2, "at25")))
    // forward strict: id1 skips the coincident row
    assert(q("<") == Seq((1, "at15"), (2, "at25")))
    // INNER drops the unmatched row instead of nulling it
    assert(q(">", left = false) == Seq((2, "at15")))
  }

  test("ASOF JOIN plans hash joins + one window - no nested-loop join") {
    val plan = sess.sql("""
      SELECT a.id, b.tag FROM asof_l a ASOF JOIN asof_r b
        ON a.t >= b.rt""").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("ASOF JOIN replicates key-local WHERE conjuncts into both " +
      "pairs legs; non-key conjuncts are left alone") {
    // rewrite-level: the key filter appears in BOTH union legs (mapped
    // to each side's key expression), the non-key conjunct in neither
    val sql = "SELECT a.id, b.tag FROM asof_l a ASOF JOIN asof_r b " +
      "ON a.k = b.k AND a.t >= b.rt WHERE a.k IN (1, 2) AND b.tag <> 'x'"
    val rw = graft.ops.SqlSyntax.rewriteAsofJoin(sql).get
    assert(rw.contains("asof_l a WHERE (\n(a.k IN (1, 2))\n)"), rw)
    assert(rw.contains("asof_r b WHERE (\n(b.k IN (1, 2))\n)"), rw)
    // the tag conjunct is NOT replicated: it appears exactly twice —
    // the select list and the outer WHERE — never in a leg
    assert("b\\.tag".r.findAllIn(rw).size == 2, rw)
    assert(rw.toLowerCase.contains("where a.k in (1, 2) and b.tag"), rw)
    // a left-side conjunct over the TIME expression filters the left
    // leg only (left rows influence no other row's match)
    val rwT = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_l a ASOF JOIN asof_r b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.t > 10").get
    assert(rwT.contains("asof_l a WHERE (\n(a.t > 10)\n)"), rwT)
    assert(!rwT.contains("asof_r b WHERE"), rwT)
    // BETWEEN parses to >=/<= conjuncts at the And root — the AST
    // split can never cut mid-construct, so BOTH halves replicate
    val rwB = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_l a ASOF JOIN asof_r b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k BETWEEN 1 AND 2").get
    assert(rwB.contains(
      "asof_l a WHERE (\n(a.k >= 1)\n) AND (\n(a.k <= 2)\n)"), rwB)
    assert(rwB.contains(
      "asof_r b WHERE (\n(b.k >= 1)\n) AND (\n(b.k <= 2)\n)"), rwB)
    // execution: replicated and CTE-prefiltered forms agree exactly
    val sp = spark; import sp.implicits._
    val l = Seq((1, 10L, 5), (1, 20L, 6), (2, 12L, 7), (3, 30L, 8))
      .toDF("k", "t", "id")
    val r = Seq((1, 9L, "a"), (1, 15L, "b"), (2, 11L, "c"), (3, 29L, "d"))
      .toDF("k", "rt", "tag")
    sess.registerTable("asof_kl", l)
    sess.registerTable("asof_kr", r)
    val got = sess.sql(
      "SELECT a.id, b.tag FROM asof_kl a ASOF LEFT JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k IN (1, 2) " +
        "ORDER BY a.id").collect().toSeq
    val want = sess.sql(
      "WITH fl AS (SELECT * FROM asof_kl WHERE k IN (1, 2)), " +
        "fr AS (SELECT * FROM asof_kr WHERE k IN (1, 2)) " +
        "SELECT a.id, b.tag FROM fl a ASOF LEFT JOIN fr b " +
        "ON a.k = b.k AND a.t >= b.rt ORDER BY a.id").collect().toSeq
    assert(got == want && got.size == 3, s"got $got")
    // plan: with parquet operands, the key filter is PUSHED into all
    // four scans (two probe sides + two pairs legs)
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    sess.registerTable("orders_asof", orders)
    val plan = sess.sql(
      "SELECT a.o_orderkey, b.o_orderkey AS prev_key " +
        "FROM orders_asof a ASOF JOIN orders_asof b " +
        "ON a.o_custkey = b.o_custkey AND a.o_orderdate > b.o_orderdate " +
        "WHERE a.o_custkey IN (7, 13)").queryExecution.executedPlan.toString
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.size == 4, s"expected 4 scans:\n$plan")
    scans.foreach { s =>
      assert(s.contains("o_custkey") && s.toLowerCase.contains("in(7,13)")
        || s.replace(" ", "").toLowerCase.contains("in(7,13)"),
        s"scan without the pushed key filter: $s")
    }
  }

  test("ASOF JOIN refusal contracts and scanner safety") {
    // no inequality
    val e1 = intercept[IllegalArgumentException](sess.sql(
      "SELECT a.id FROM asof_l a ASOF JOIN asof_r b ON a.id = b.rt"))
    assert(e1.getMessage.contains("inequality"))
    // two inequalities
    val e2 = intercept[IllegalArgumentException](sess.sql(
      "SELECT a.id FROM asof_l a ASOF JOIN asof_r b ON a.t >= b.rt AND a.id < b.rt"))
    assert(e2.getMessage.contains("ONE inequality"))
    // subquery operand
    val e3 = intercept[IllegalArgumentException](sess.sql(
      "SELECT a.id FROM asof_l a ASOF JOIN (SELECT * FROM asof_r) b ON a.t >= b.rt"))
    assert(e3.getMessage.contains("named table"))
    // bare * would leak the synthetic pair columns
    val e4 = intercept[IllegalArgumentException](sess.sql(
      "SELECT * FROM asof_l a ASOF JOIN asof_r b ON a.t >= b.rt"))
    assert(e4.getMessage.contains("bare *"))
    // unqualified operand
    val e5 = intercept[IllegalArgumentException](sess.sql(
      "SELECT a.id FROM asof_l a ASOF JOIN asof_r b ON a.t >= rt"))
    assert(e5.getMessage.contains("alias"))
    // the keyword inside a string literal does not trigger
    assert(graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT 'no ASOF JOIN here' AS s FROM t").isEmpty)
    assert(graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT x FROM (SELECT a FROM l ASOF JOIN r ON l.a >= r.b) q").isEmpty)
  }

  test("ASOF leg replication soundness: IS-NULL anti-join, OR roots, " +
      "trailing semicolons, keyword-named columns") {
    val sp = spark; import sp.implicits._
    sess.registerTable("asof_nl", Seq((1, 10L, 5)).toDF("k", "t", "id"))
    sess.registerTable("asof_nr", Seq((1, 20L, "a")).toDF("k", "rt", "tag"))
    // self-contained fixtures (also registered by the replication test,
    // which may not have run)
    sess.registerTable("asof_kl",
      Seq((1, 10L, 5), (1, 20L, 6), (2, 12L, 7), (3, 30L, 8))
        .toDF("k", "t", "id"))
    sess.registerTable("asof_kr",
      Seq((1, 9L, "a"), (1, 15L, "b"), (2, 11L, "c"), (3, 29L, "d"))
        .toDF("k", "rt", "tag"))
    // the classic IS NULL anti-join: t=10 < rt=20 means no match, the
    // LEFT join preserves the row with b.* NULL and the WHERE keeps it.
    // A null-satisfied right-side conjunct must NOT be replicated (it
    // would either drop the preserved row or invent matches).
    val anti = "SELECT a.id, b.tag FROM asof_nl a ASOF LEFT JOIN asof_nr b " +
      "ON a.k = b.k AND a.t >= b.rt WHERE b.k IS NULL"
    val rwA = graft.ops.SqlSyntax.rewriteAsofJoin(anti).get
    assert(!rwA.contains("asof_nl a WHERE") && !rwA.contains("asof_nr b WHERE"), rwA)
    assert(sess.sql(anti).collect().map(r => (r.getInt(0), r.get(1))).toSeq
      == Seq((5, null)))
    // same for <=> (null-safe equal is TRUE on the preserved row's NULLs)
    val rwS = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id FROM asof_nl a ASOF LEFT JOIN asof_nr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE NOT (b.k <=> 5)").get
    assert(!rwS.contains("asof_nl a WHERE") && !rwS.contains("asof_nr b WHERE"), rwS)
    // a null-REJECTING right conjunct still replicates under LEFT
    val rwN = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_nl a ASOF LEFT JOIN asof_nr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE b.k = 1").get
    assert(rwN.contains("asof_nl a WHERE (\n(a.k = 1)\n)"), rwN)
    assert(rwN.contains("asof_nr b WHERE (\n(b.k = 1)\n)"), rwN)
    // under INNER, IS-NULL forms stay replicable (keys join null-safely,
    // so the predicate agrees across every matched pair)
    val rwI = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id FROM asof_nl a ASOF JOIN asof_nr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k IS NOT NULL").get
    assert(rwI.contains("asof_nl a WHERE (\n(a.k IS NOT NULL)\n)"), rwI)
    // a top-level OR makes the body's root an OR: `X OR p AND q` must
    // not surrender q as a conjunct (it is not implied by the WHERE)
    val or1 = "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
      "ON a.k = b.k AND a.t >= b.rt WHERE b.tag = 'x' OR a.t > 5 AND a.k = 1"
    val rwO = graft.ops.SqlSyntax.rewriteAsofJoin(or1).get
    assert(!rwO.contains("asof_kl a WHERE") && !rwO.contains("asof_kr b WHERE"), rwO)
    val gotO = sess.sql(or1 + " ORDER BY a.id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(gotO == Seq((5, "a"), (6, "b")), gotO) // k=2/k=3 rows fail the OR
    // a top-level CASE carries ANDs inside its WHEN condition at paren
    // depth 0 (CASE…END is unparenthesized) — splitting there would
    // surrender a non-implied fragment (`a.k = 2` below, from a WHERE
    // that is always TRUE) and drop every k≠2 row
    val caseQ = "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
      "ON a.k = b.k AND a.t >= b.rt " +
      "WHERE CASE WHEN b.tag = 'x' AND a.k = 2 AND b.tag = 'y' " +
      "THEN 0 ELSE 1 END = 1"
    val rwCase = graft.ops.SqlSyntax.rewriteAsofJoin(caseQ).get
    assert(!rwCase.contains("asof_kl a WHERE") &&
      !rwCase.contains("asof_kr b WHERE"), rwCase)
    val gotCase = sess.sql(caseQ + " ORDER BY a.id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(gotCase == Seq((5, "a"), (6, "b"), (7, "c"), (8, "d")), gotCase)
    // …but a key-local OR body replicates as ONE parenthesized unit
    val rwU = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k = 1 OR a.k = 2").get
    assert(rwU.contains(
      "asof_kl a WHERE (\n((a.k = 1) OR (a.k = 2))\n)"), rwU)
    assert(rwU.contains(
      "asof_kr b WHERE (\n((b.k = 1) OR (b.k = 2))\n)"), rwU)
    // a statement-terminating semicolon is not part of the predicate
    val rwSemi = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k IN (1, 2);").get
    assert(rwSemi.contains("asof_kl a WHERE (\n(a.k IN (1, 2))\n)"), rwSemi)
    assert(sess.sql(
      "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k IN (1, 2);").count() == 3)
    // a bare `date`/`timestamp` word is a COLUMN reference unless it
    // heads a quoted literal — swapping it across sides would resolve
    // against the wrong table, so the conjunct must not replicate
    val rwD = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k = date").get
    assert(!rwD.contains("asof_kl a WHERE") && !rwD.contains("asof_kr b WHERE"), rwD)
    val rwDL = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k > date '2020-01-01'").get
    assert(rwDL.contains("asof_kl a WHERE"), rwDL) // typed literal: fine
    // a COMMENT after a bare `date` column masks to the same filler a
    // literal does — the probe must read the original text's quote
    val rwDC = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id FROM asof_kl a ASOF JOIN asof_kr b " +
        "ON a.k = b.k AND a.t >= b.rt WHERE a.k = date /* cutoff */").get
    assert(!rwDC.contains("asof_kl a WHERE") &&
      !rwDC.contains("asof_kr b WHERE"), rwDC)
    // under LEFT, the null-rejection argument needs NULL-STRICT key
    // expressions: a conjunct over coalesce(b.k, 0) can be TRUE on the
    // preserved row's NULLs even though its residue looks clean
    val rwCo = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_nl a ASOF LEFT JOIN asof_nr b " +
        "ON a.k = coalesce(b.k, 0) AND a.t >= b.rt " +
        "WHERE coalesce(b.k, 0) = 0").get
    assert(!rwCo.contains("asof_nl a WHERE") &&
      !rwCo.contains("asof_nr b WHERE"), rwCo)
    // …and the unreplicated form still evaluates correctly end to end:
    // t=10 < rt=20 leaves the left row preserved with b.k NULL, so
    // coalesce(NULL, 0) = 0 keeps it
    assert(sess.sql(
      "SELECT a.id, b.tag FROM asof_nl a ASOF LEFT JOIN asof_nr b " +
        "ON a.k = coalesce(b.k, 0) AND a.t >= b.rt " +
        "WHERE coalesce(b.k, 0) = 0").collect()
      .map(r => (r.getInt(0), r.get(1))).toSeq == Seq((5, null)))
    // the same non-bare key expression replicates under INNER (keys
    // join null-safely, so the predicate agrees across matched pairs)
    val rwCi = graft.ops.SqlSyntax.rewriteAsofJoin(
      "SELECT a.id, b.tag FROM asof_nl a ASOF JOIN asof_nr b " +
        "ON a.k = coalesce(b.k, 0) AND a.t >= b.rt " +
        "WHERE coalesce(b.k, 0) = 1").get
    assert(rwCi.contains("asof_nr b WHERE (\n(coalesce(b.k, 0) = 1)\n)"), rwCi)
    // an ON key operand carrying a trailing line comment: the swapped
    // leg is RENDERED from the AST, so the comment cannot reach (let
    // alone swallow) the replicated predicate at all
    val cmQ = "SELECT a.id, b.tag FROM asof_kl a ASOF JOIN asof_kr b " +
      "ON a.k = b.k -- key\nAND a.t >= b.rt WHERE a.k = 1"
    val rwCm = graft.ops.SqlSyntax.rewriteAsofJoin(cmQ).get
    assert(rwCm.contains("asof_kr b WHERE (\n(b.k = 1)\n)"), rwCm)
    assert(!rwCm.contains("-- key\n = 1"), rwCm)
    val gotCm = sess.sql(cmQ).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    graft.ops.SqlSyntax.replicateLegFilters = false
    val wantCm = try sess.sql(cmQ).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
    finally graft.ops.SqlSyntax.replicateLegFilters = true
    assert(gotCm == wantCm && gotCm == Seq((5, "a"), (6, "b")), gotCm)
    // keyword-lookalike qualified columns never terminate a clause scan
    assert(SqlSyntax.findTopLevel("SET note = t.where WHERE k = 2", "WHERE")
      .exists(_._1 == 19))
    assert(SqlSyntax.findTopLevel("SELECT a FROM t.limit", "LIMIT").isEmpty)
  }

  test("ASOF WHERE replication differential fuzz: 30 seeded rounds of " +
      "random predicates over NULL-laden keys agree with replication OFF") {
    // replication is a pure optimization: turning it off yields the
    // plain pairs-union rewrite, which is the soundness oracle here.
    // Fixtures deliberately include NULL keys (null-safe pair matching)
    // and NULL-producing predicates (IS NULL, <=>, NOT) under both
    // INNER and LEFT joins — the exact space the guards police.
    val sp = spark; import sp.implicits._
    def tag(i: Int) = ('a' + i % 26).toChar.toString + i
    var replicated = 0
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(20260816 + seed)
      def key(): Integer =
        if (rnd.nextInt(5) == 0) null else Integer.valueOf(rnd.nextInt(4))
      val l = (0 until 8 + rnd.nextInt(10)).map(i =>
        (key(), rnd.nextInt(20).toLong, i))
      val r = (0 until 8 + rnd.nextInt(10)).map(i =>
        (key(), rnd.nextInt(20).toLong, tag(i)))
      sess.registerTable("asof_fz_l", l.toDF("k", "t", "id"))
      sess.registerTable("asof_fz_r", r.toDF("k", "rt", "tag"))
      def atom(): String = {
        val s = if (rnd.nextBoolean()) "a" else "b"
        rnd.nextInt(10) match {
          case 0 => s"$s.k = ${rnd.nextInt(4)}"
          case 1 => s"$s.k > ${rnd.nextInt(3)}"
          case 2 => s"$s.k IN (${rnd.nextInt(4)}, ${rnd.nextInt(4)})"
          case 3 => s"$s.k IS NULL"
          case 4 => s"$s.k IS NOT NULL"
          case 5 => s"NOT ($s.k <=> ${rnd.nextInt(4)})"
          // unparenthesized CASE whose WHEN condition carries ANDs at
          // paren depth 0 — the exact shape a naive AND-splitter cuts
          case 6 => s"CASE WHEN $s.k = ${rnd.nextInt(4)} AND " +
            s"a.t > ${rnd.nextInt(15)} THEN ${rnd.nextInt(2)} " +
            s"ELSE ${rnd.nextInt(2)} END = ${rnd.nextInt(2)}"
          // BETWEEN expands to >=/<= conjuncts in the AST proof —
          // both NOT and plain forms must replicate soundly
          case 7 => s"$s.k ${if (rnd.nextBoolean()) "NOT " else ""}" +
            s"BETWEEN ${rnd.nextInt(3)} AND ${rnd.nextInt(4)}"
          // arithmetic over the key stays in the null-strict whitelist
          case 8 => s"$s.k + ${rnd.nextInt(3)} > ${rnd.nextInt(5)}"
          case _ => s"a.t > ${rnd.nextInt(15)}"
        }
      }
      val pred = (0 until 1 + rnd.nextInt(3)).map(_ => atom())
        .mkString(if (rnd.nextBoolean()) " AND " else " OR ")
      val jt = if (rnd.nextBoolean()) "LEFT " else ""
      val op = Seq(">=", ">", "<=", "<")(rnd.nextInt(4))
      // a quarter of draws comment-suffix the right key operand — the
      // splice-pad territory
      val rKey = if (rnd.nextInt(4) == 0) "b.k -- key\n" else "b.k"
      val q = s"SELECT a.id, b.tag FROM asof_fz_l a ASOF ${jt}JOIN " +
        s"asof_fz_r b ON a.k = $rKey AND a.t $op b.rt WHERE $pred"
      if (SqlSyntax.rewriteAsofJoin(q).get.contains("asof_fz_l a WHERE") ||
        SqlSyntax.rewriteAsofJoin(q).get.contains("asof_fz_r b WHERE"))
        replicated += 1
      def rows(): Seq[(Int, Any)] = sess.sql(q).collect()
        .map(x => (x.getInt(0), x.get(1))).toSeq.sortBy(_.toString)
      val got = rows()
      SqlSyntax.replicateLegFilters = false
      val want = try rows() finally SqlSyntax.replicateLegFilters = true
      assert(got == want, s"seed $seed diverged on: $q\non:  $got\noff: $want")
    }
    // the fuzz must not be vacuous: a fair share of draws replicate
    assert(replicated >= 5, s"only $replicated/30 rounds replicated")
  }

  test("ASOF WHERE replication differential fuzz over STRING keys: " +
      "literal rendering and leg swaps survive quotes and non-ASCII") {
    // the AST renderer re-emits string literals through Literal.sql —
    // embedded single/double quotes and non-ASCII must survive the
    // swap into the opposite leg bit-for-bit
    val sp = spark; import sp.implicits._
    var replicated = 0
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(77000 + seed)
      def key(): String =
        if (rnd.nextInt(5) == 0) null
        else Seq("x", "y'z", "w\"q", "héß")(rnd.nextInt(4))
      val l = (0 until 8 + rnd.nextInt(8)).map(i =>
        (key(), rnd.nextInt(20).toLong, i))
      val r = (0 until 8 + rnd.nextInt(8)).map(i =>
        (key(), rnd.nextInt(20).toLong, s"t$i"))
      sess.registerTable("asof_fzs_l", l.toDF("k", "t", "id"))
      sess.registerTable("asof_fzs_r", r.toDF("k", "rt", "tag"))
      def atom(): String = {
        val s = if (rnd.nextBoolean()) "a" else "b"
        rnd.nextInt(6) match {
          case 0 => s"$s.k = 'y''z'" // embedded single quote
          case 1 => s"$s.k IN ('x', 'w\"q')"
          case 2 => s"$s.k LIKE 'h%'"
          case 3 => s"$s.k IS NOT NULL"
          case 4 => s"$s.k = 'héß'"
          case _ => s"a.t > ${rnd.nextInt(15)}"
        }
      }
      val pred = (0 until 1 + rnd.nextInt(3)).map(_ => atom())
        .mkString(if (rnd.nextBoolean()) " AND " else " OR ")
      val jt = if (rnd.nextBoolean()) "LEFT " else ""
      val q = s"SELECT a.id, b.tag FROM asof_fzs_l a ASOF ${jt}JOIN " +
        s"asof_fzs_r b ON a.k = b.k AND a.t >= b.rt WHERE $pred"
      val rw = SqlSyntax.rewriteAsofJoin(q).get
      if (rw.contains("asof_fzs_l a WHERE") ||
        rw.contains("asof_fzs_r b WHERE")) replicated += 1
      def rows(): Seq[(Int, Any)] = sess.sql(q).collect()
        .map(x => (x.getInt(0), x.get(1))).toSeq.sortBy(_.toString)
      val got = rows()
      SqlSyntax.replicateLegFilters = false
      val want = try rows() finally SqlSyntax.replicateLegFilters = true
      assert(got == want, s"seed $seed diverged on: $q\non:  $got\noff: $want")
    }
    assert(replicated >= 3, s"only $replicated/10 rounds replicated")
  }

  test("scanners are comment- and backtick-aware (codeMask): keywords " +
      "inside either never trigger; a keyword split by a comment still lexes") {
    // keyword inside a line comment / bracketed comment / backticks
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t -- QUALIFY rn = 1\n WHERE a = 1", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT a /* QUALIFY rn = 1 */ FROM t", "QUALIFY").isEmpty)
    assert(SqlSyntax.findTopLevel(
      "SELECT `order by all` FROM t", "ORDER BY ALL").isEmpty)
    // nested bracketed comments (Spark 3+/DuckDB both nest)
    assert(SqlSyntax.findTopLevel(
      "SELECT a /* outer /* LIMIT 1 */ still comment */ FROM t",
      "LIMIT").isEmpty)
    // double-quoted literal (Spark) / identifier (DuckDB): opaque either way
    assert(SqlSyntax.findTopLevel(
      "SELECT \"no LIMIT here\" FROM t", "LIMIT").isEmpty)
    // a comment BETWEEN keyword words is a token separator, as SQL lexes it
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t ORDER /* c */ BY a", "ORDER BY").isDefined)
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t ORDER--c\nBY a", "ORDER BY").isDefined)
    // a LITERAL between keyword words is NOT a separator
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t ORDER 'x' BY a", "ORDER BY").isEmpty)
    // parens inside comments/backticks do not desync depth tracking:
    // the ')' in the comment must not close the DISTINCT ON key list
    val r = SqlSyntax.rewriteDistinctOn(
      "SELECT DISTINCT ON (k1 /* ) */, k2) a, b FROM t ORDER BY k1, k2, a")
    assert(r.isDefined && r.get.contains("k1 /* ) */, k2\n"), r)
    // an unterminated literal masks to end-of-text without desyncing
    assert(SqlSyntax.findTopLevel("SELECT 'oops FROM t", "FROM").isEmpty)
  }

  test("codeMask property fuzz: 300 random compositions of code and " +
      "literal/backtick/comment fragments label exactly the generated regions") {
    val rnd = new scala.util.Random(42)
    val codeChars = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz" +
      "0123456789 =(),.<>"
    val bodyChars = // safe inside any quoted/comment body (no delimiters)
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 =()<>,."
    def frag(chars: String, n: Int): String =
      Seq.fill(n)(chars(rnd.nextInt(chars.length))).mkString
    // each generator returns (text, perCharIsCode)
    def codeFrag(): (String, Seq[Boolean]) = {
      val t = frag(codeChars, 1 + rnd.nextInt(12))
      (t, Seq.fill(t.length)(true))
    }
    def kwInBody(): String = // plant a keyword where it must NOT match
      if (rnd.nextInt(3) == 0) " QUALIFY ORDER BY LIMIT " else ""
    def quoted(q: Char): (String, Seq[Boolean]) = {
      val esc = if (q == '`') s"$q$q"
        else if (rnd.nextBoolean()) s"\\$q" else s"$q$q"
      val body = frag(bodyChars, rnd.nextInt(8)) + kwInBody() +
        (if (rnd.nextBoolean()) esc else "") + frag(bodyChars, rnd.nextInt(8))
      val t = s"$q$body$q"
      (t, Seq.fill(t.length)(false))
    }
    def lineComment(): (String, Seq[Boolean]) = {
      val body = frag(bodyChars, rnd.nextInt(10)) + kwInBody()
      val t = s"--$body\n"
      (t, Seq.fill(t.length - 1)(false) :+ true) // the newline is code
    }
    def blockComment(): (String, Seq[Boolean]) = {
      val inner = if (rnd.nextBoolean()) "/*" + frag(bodyChars, 5) + "*/" else ""
      val t = "/*" + frag(bodyChars, rnd.nextInt(8)) + kwInBody() + inner + "*/"
      (t, Seq.fill(t.length)(false))
    }
    def unterminated(): (String, Seq[Boolean]) = {
      val t = rnd.nextInt(3) match {
        case 0 => "'" + frag(bodyChars, 5)
        case 1 => "/*" + frag(bodyChars, 5)
        case _ => "--" + frag(bodyChars, 5)
      }
      (t, Seq.fill(t.length)(false))
    }
    for (round <- 0 until 300) {
      val n = 1 + rnd.nextInt(10)
      val parts = Seq.fill(n)(rnd.nextInt(6) match {
        case 0 => codeFrag()
        case 1 => quoted('\'')
        case 2 => quoted('"')
        case 3 => quoted('`')
        case 4 => lineComment()
        case 5 => blockComment()
      }) ++ (if (rnd.nextInt(5) == 0) Seq(unterminated()) else Nil)
      // a single space (code) between fragments keeps expectations
      // composable without relying on the doubling coincidence
      val text = parts.map(_._1).mkString(" ")
      val expected = parts.map(_._2).reduceLeft((a, b) => a ++ Seq(true) ++ b)
      val got = graft.ops.LogSql.codeMask(text).toSeq
      assert(got == expected,
        s"round $round: mask mismatch on <$text>\n got  $got\n want $expected")
      val masked = graft.ops.LogSql.maskNonCode(text)
      assert(masked.length == text.length)
      expected.indices.foreach { i =>
        if (expected(i)) assert(masked(i) == text(i))
        else assert(masked(i) == '\u0001')
      }
      // keywords planted inside noncode bodies never surface: if the
      // masked text carries no code QUALIFY, findTopLevel must not
      // find one (the planted occurrences are all in noncode bodies)
      val hasCodeQualify =
        "\\bQUALIFY\\b".r.findFirstIn(masked.toUpperCase).isDefined
      if (!hasCodeQualify)
        assert(SqlSyntax.findTopLevel(text, "QUALIFY").isEmpty,
          s"round $round: QUALIFY misfired on <$text>")
    }
  }

  test("QUALIFY under comments end-to-end: a commented statement " +
      "rewrites identically to the bare one") {
    sess.registerTable("orders", orders)
    val bare = sess.sql(
      "SELECT o_custkey, o_orderkey FROM orders WHERE o_custkey % 25 = 3 " +
        "QUALIFY row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) = 1 " +
        "ORDER BY o_custkey, o_orderkey").collect()
    val commented = sess.sql(
      "SELECT o_custkey, o_orderkey -- projected pair\n" +
        "FROM orders WHERE o_custkey % 25 = 3 /* filter */ " +
        "QUALIFY row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey) = 1 " +
        "ORDER /* split keyword */ BY o_custkey, o_orderkey").collect()
    assert(bare.nonEmpty && bare.toSeq == commented.toSeq)
  }

  test("boundary comments strip: anchored clause heads and statement " +
      "tails survive a provenance header and a trailing comment") {
    import graft.ops.LogSql
    assert(LogSql.stripBoundaryComments(
      "-- provenance: job 42\n/* hdr */ SELECT a FROM t -- done") ==
      "SELECT a FROM t")
    // literals and backticks at the boundary are NEVER stripped
    assert(LogSql.stripBoundaryComments("'lit' FROM x") == "'lit' FROM x")
    assert(LogSql.stripBoundaryComments("SELECT `a`") == "SELECT `a`")
    // an unterminated literal tail stays (the parser must report it)
    assert(LogSql.stripBoundaryComments("SELECT 'oops") == "SELECT 'oops")
    // end-to-end: a header must not stop SELECT * EXCLUDE from
    // triggering (its anchor is a ^SELECT regex)
    val documents = graft.sources.Tables(spark, sfDir, "documents")
    sess.registerTable("documents", documents)
    val df = sess.sql(
      "-- reader prelude\nSELECT * EXCLUDE (text) FROM documents " +
        "WHERE doc_id % 100 = 3 ORDER BY doc_id LIMIT 5 -- trailing note")
    assert(!df.columns.contains("text"))
    assert(df.count() > 0)
  }

  test("comment spans are exact: a comment abutting a literal strips " +
      "or lexes as the comment alone, never swallowing the literal") {
    import graft.ops.LogSql
    // leading: block comment directly abutting a quoted literal — it
    // survives (the old run-based pass consumed the whole noncode run)
    assert(LogSql.stripBoundaryComments("/*h*/'x' AS s FROM t") ==
      "'x' AS s FROM t")
    assert(LogSql.stripBoundaryComments("/*a*//*b*/ 'y'") == "'y'")
    // trailing: comment after a literal strips; literal stays
    assert(LogSql.stripBoundaryComments("SELECT 'a' /*tail*/") ==
      "SELECT 'a'")
    // a quote character INSIDE a comment is part of the comment
    assert(LogSql.stripBoundaryComments("/*don't*/ SELECT 1 /*won't*/") ==
      "SELECT 1")
    // keyword-separator consumption: a literal between ORDER and BY
    // means there is NO ORDER BY keyword there
    assert(SqlSyntax.findTopLevel("ORDER/*c*/'x'/*d*/BY a", "ORDER BY").isEmpty)
    // while comments alone (even chained) do separate the words
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t ORDER/*c*//*d*/ BY a", "ORDER BY").isDefined)
    assert(SqlSyntax.findTopLevel(
      "SELECT a FROM t ORDER/*don't*/BY a", "ORDER BY").isDefined)
  }

  test("ASOF JOIN: an alias-lookalike inside a literal is not a side " +
      "reference — the conjunct is refused loudly, not mis-keyed") {
    val e = intercept[IllegalArgumentException] {
      SqlSyntax.rewriteAsofJoin(
        "SELECT a.id FROM asof_l a ASOF JOIN asof_r b " +
          "ON a.k = b.k AND a.t >= b.rt AND a.tag = 'b.x'")
    }
    assert(e.getMessage.contains("exactly one side's alias"), e.getMessage)
  }

  test("sql_asof_join oracle row: strict-backward self as-of over orders") {
    val rows = graft.ops.Sql.qSqlAsofJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // prev_date is strictly earlier whenever matched; first-day rows null
    rows.foreach { r =>
      if (!r.isNullAt(4)) // fixture date type varies (DATE vs NTZ) — both Comparable
        assert(r.get(4).asInstanceOf[Comparable[Any]].compareTo(r.get(2)) < 0,
          r.toString)
    }
    assert(rows.exists(_.isNullAt(4)), "expected at least one first-order row")
  }
}
