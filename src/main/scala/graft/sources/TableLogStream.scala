package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[TableLog]] table — the read
  * half of the lakehouse CDC loop whose write half is
  * `Streaming.sinkToTableLog`: `readStream.format("graft-log-stream")`
  * tails the commit log and emits each data commit's appended rows
  * exactly once (Delta streaming-source parity).
  *
  * Offsets are commit VERSIONS — a single long riding the engine's
  * offset checkpoint, so restart resumes at the first unprocessed
  * commit with no source-side state. Visibility is log publish, never
  * file listing: a data file that exists but whose commit hasn't
  * published is invisible, the same snapshot-isolation contract every
  * batch read path honors (a plain file-stream over the data dir
  * would break it).
  *
  * Commit semantics:
  *  - dataChange=false commits (compaction, OPTIMIZE ZORDER, metadata,
  *    checkpoints) are reorganizations — skipped, never re-emitted.
  *  - data commits that REMOVE rows (delete, merge rewrites, restore,
  *    deletion vectors) cannot be represented in an append stream:
  *    the source REFUSES loudly, or skips the whole commit when
  *    `skipChangeCommits=true` (Delta's option, same name).
  *  - schema evolution: rows are presented under the DECLARED schema
  *    captured at stream start (pre-evolution files read as null in
  *    added columns, declared order) — [[TableLog.alignDeclared]].
  *
  * Options: `path` (table root, required), `startingVersion` (first
  * version to emit, inclusive; `latest` = only commits after stream
  * start; default 0), `maxCommitsPerTrigger` (admission control: at
  * most N commits per micro-batch — backpressure so a backfilled
  * table doesn't become one giant first batch),
  * `skipChangeCommits` (see above), and `readChangeFeed` (Delta CDF
  * parity: emit the full row-level change feed — `_change_type` +
  * `_commit_version` columns — so change commits flow as data
  * instead of refusing; requires capture to have been on for
  * mutating commits, enforced by [[TableLog.tableChanges]]).
  *
  * V1 `Source` is the right API here deliberately: `getBatch` returns
  * the add-files as an ordinary parquet-backed DataFrame (flipping
  * `isStreaming` on the leaf relation, exactly what FileStreamSource
  * does), so the scan keeps Spark's full parquet stack — vectorized
  * reader, column pruning, filter pushdown — with zero custom reader
  * code. Scale posture: planning I/O is O(new commits) per trigger;
  * the data path is the same pruned scan as any batch read.
  */
final class TableLogStreamProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-log-stream"

  private def opt(params: Map[String, String], key: String): Option[String] =
    params.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private def declaredSchema(s: SparkSession, root: String,
      changeFeed: Boolean): StructType = {
    val base = TableLog.tableSchema(s, root)
      .getOrElse(TableLog.snapshot(s, root).schema)
    if (!changeFeed) base
    else StructType(base.fields.toSeq :+
      org.apache.spark.sql.types.StructField(TableLog.ChangeTypeCol,
        org.apache.spark.sql.types.StringType) :+
      org.apache.spark.sql.types.StructField(TableLog.CommitVersionCol,
        org.apache.spark.sql.types.IntegerType))
  }

  private def changeFeed(params: Map[String, String]): Boolean =
    opt(params, "readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, params: Map[String, String])
      : (String, StructType) = {
    val root = opt(params, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-log-stream requires .option(\"path\", <table root>)"))
    (shortName(), schema.getOrElse(
      declaredSchema(ctx.sparkSession, root, changeFeed(params))))
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val s = ctx.sparkSession
    val root = opt(params, "path").get
    // `startingVersion` resolves ONCE per checkpoint lifetime and is
    // PINNED in the stream's metadata dir: `latest` re-resolved on a
    // restart would silently skip every commit landed while the
    // stream was down (the checkpointed offset, not "now", is the
    // resume point — Delta honors startingVersion only on a fresh
    // checkpoint for exactly this reason). Pinning rides the same
    // atomic publish as the log itself.
    val startExclusive = {
      val meta = new org.apache.hadoop.fs.Path(metadataPath, "graft-start")
      val f = meta.getFileSystem(s.sparkContext.hadoopConfiguration)
      def readPinned(): Option[Int] =
        if (!f.exists(meta)) None
        else {
          val in = f.open(meta)
          try Some(new String(
            in.readAllBytes(), "UTF-8").trim.toInt)
          finally in.close()
        }
      readPinned().getOrElse {
        val resolved = opt(params, "startingVersion") match {
          case Some("latest") =>
            TableLog.versions(s, root).lastOption.getOrElse(-1)
          case Some(v) => v.toInt - 1
          case None => -1
        }
        f.mkdirs(meta.getParent)
        val tmp = new org.apache.hadoop.fs.Path(
          metadataPath, s".graft-start-${java.util.UUID.randomUUID()}")
        val out = f.create(tmp, false)
        try out.write(resolved.toString.getBytes("UTF-8")) finally out.close()
        if (!CasFs.publish(f, tmp, meta)) f.delete(tmp, false)
        // a racing creator may have pinned first — theirs wins
        readPinned().getOrElse(resolved)
      }
    }
    new TableLogSource(s, root,
      schema.getOrElse(declaredSchema(s, root, changeFeed(params))),
      startExclusive = startExclusive,
      skipChangeCommits = opt(params, "skipChangeCommits").exists(_.toBoolean),
      maxCommitsPerTrigger = opt(params, "maxCommitsPerTrigger").map(_.toInt),
      readChangeFeed = changeFeed(params))
  }
}

private final class TableLogSource(spark: SparkSession, root: String,
    declared: StructType, startExclusive: Int, skipChangeCommits: Boolean,
    maxCommitsPerTrigger: Option[Int], readChangeFeed: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override def schema: StructType = declared

  /** Highest version already handed to a batch (advanced in getBatch
    * and commit) — the admission-control base. The engine's offset
    * checkpoint remains the durable truth; this is only the in-memory
    * cursor for capping the NEXT batch. */
  @volatile private var planned: Long = startExclusive.toLong

  /** Known dense version list — first call lists the directory once;
    * every later trigger extends it by exists-probing past the last
    * known version, O(new commits) even on a 100k-commit table (an
    * idle trigger = ONE probe). This is what makes the header's
    * "planning I/O is O(new commits) per trigger" claim true. */
  private var known: Vector[Int] = null
  private def refreshVersions(): Vector[Int] = synchronized {
    known = TableLog.versionsIncremental(spark, root, known, startExclusive)
    known
  }

  /** Trigger.AvailableNow (drain-and-stop ingest): the commit horizon
    * is FROZEN at query start — commits landing during the drain wait
    * for the next incarnation, or a steady writer would keep an
    * "available now" query running forever. Batching still honors
    * maxCommitsPerTrigger within the frozen range. */
  @volatile private var frozenLatest: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    frozenLatest = Some(refreshVersions()
      .lastOption.map(_.toLong).getOrElse(startExclusive.toLong))

  /** SupportsAdmissionControl surface (pulled in by the AvailableNow
    * trait): same answer as [[getOffset]], after adopting the
    * engine-provided `start` — a fresh instance after a restart has a
    * cursor at startExclusive while the checkpoint is further along,
    * and answering from the stale cursor could hand the engine an
    * offset BEHIND its committed one. The commit-cap option already
    * bounds each batch, so the ReadLimit stays at its default. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    start match {
      case l: LongOffset => planned = math.max(planned, l.offset)
      case s: SerializedOffset => planned = math.max(planned, LongOffset(s).offset)
      case null => ()
      case other => planned = math.max(planned, other.json.trim.toLong)
    }
    getOffset.orNull
  }

  override def getOffset: Option[V1Offset] = {
    val vs = refreshVersions()
      .filter(v => v > planned && frozenLatest.forall(v <= _))
    val target = maxCommitsPerTrigger match {
      case Some(n) => vs.take(n).lastOption
      case None => vs.lastOption
    }
    target.map(v => LongOffset(v.toLong))
      .orElse(if (planned > startExclusive) Some(LongOffset(planned)) else None)
  }

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startExclusive.toLong)
    val to = ver(end)
    planned = math.max(planned, to)
    // refuse-loudly on mid-stream schema changes this stream cannot
    // represent (its schema was fixed at start; restart to adopt):
    //  - type WIDENING: aligning post-widen (wide-typed) files to the
    //    start schema would NARROW-cast silently;
    //  - RENAME or DROP of a declared column: post-change files no
    //    longer carry any physical name the start-time alignment maps
    //    (the mapping lists the column's PREVIOUS names, never a name
    //    invented after stream start), so every new row would read as
    //    a silent null in that column — data corruption, not a
    //    representable evolution. Delta fails streams on rename/drop
    //    for the same reason. Covers the CDF path too (this guard runs
    //    before both branches).
    for (cur <- TableLog.tableSchema(spark, root)) {
      val curNames = cur.fieldNames.toSet
      val meta = Set(TableLog.ChangeTypeCol, TableLog.CommitVersionCol)
      val gone = declared.fieldNames
        .filterNot(n => curNames.contains(n) || meta.contains(n))
      if (gone.nonEmpty) throw new IllegalStateException(
        s"TableLog stream at $root: declared column(s) " +
          s"${gone.mkString("'", "', '", "'")} were renamed or dropped " +
          "mid-stream; new files would read as silent nulls. Restart " +
          "the stream to adopt the evolved schema.")
      val widened = declared.fields.flatMap(f =>
        cur.fields.find(_.name == f.name)
          .filter(c => TableLog.widensTo(f.dataType, c.dataType))
          .map(c => s"'${f.name}' ${f.dataType.simpleString} -> ${c.dataType.simpleString}"))
      if (widened.nonEmpty) throw new IllegalStateException(
        s"TableLog stream at $root: column(s) widened mid-stream " +
          s"(${widened.mkString(", ")}); restart the stream to pick up " +
          "the widened schema.")
    }
    if (readChangeFeed) {
      // CDF streaming (Delta readChangeFeed parity): instead of the
      // append-only wall, emit the FULL row-level feed — inserts from
      // add lists, mutation sidecars with their _change_type tags —
      // so change commits flow as data rather than refusing. All
      // capture/refusal contracts live in [[TableLog.tableChanges]].
      if (to <= from) return emptyStreaming()
      return streamify(TableLog.alignDeclared(declared,
        TableLog.tableChanges(spark, root, from.toInt, to.toInt)))
    }
    val adds = refreshVersions()
      .filter(v => v > from && v <= to)
      .flatMap { v =>
        val (dataChange, add, nRemove, dvRecord, cdcRecord) =
          TableLog.commitFeed(spark, root, v)
        // a change commit removes rows downstream has already seen:
        // delete rewrites publish dataChange=false + a cdc record
        // (pure layout rewrites carry none), deletion vectors and
        // merge/overwrite/restore publish dataChange=true with a dv
        // record or removes
        val changesRows =
          if (dataChange) nRemove > 0 || dvRecord else cdcRecord
        if (changesRows) {
          if (skipChangeCommits) Seq.empty
          else throw new IllegalStateException(
            s"TableLog stream at $root: version $v removes or re-deletes " +
              "rows, which an append stream cannot represent. Set " +
              "skipChangeCommits=true to skip change commits, or " +
              "reprocess from a snapshot.")
        } else if (!dataChange) Seq.empty // reorganization, never re-emit
        else add
      }
    val batch =
      if (adds.isEmpty) emptyStreaming()
      // readUnion, not mergeSchema: a batch spanning a widen boundary
      // mixes narrow and wide physical files for one column — the
      // explicit declared-schema read widens at scan time where
      // mergeSchema refuses to merge int with bigint
      else streamify(TableLog.alignDeclared(declared,
        TableLog.readUnion(spark, adds, Some(declared))))
    batch
  }

  /** Re-root the batch plan as a streaming plan (`isStreaming = true`
    * on the leaf) — MicroBatchExecution asserts it; FileStreamSource
    * does the same flip on its LogicalRelation. */
  private def streamify(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed.transformUp {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
      case lr: LocalRelation => lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark, plan)
  }

  private def emptyStreaming(): DataFrame =
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark,
      LocalRelation(DataTypeUtils.toAttributes(declared), Nil,
        isStreaming = true))

  override def commit(end: V1Offset): Unit =
    planned = math.max(planned, ver(end))

  override def stop(): Unit = ()
}
