package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Minimal transaction-logged table format — the snapshot/time-travel
  * layer a 100 TB lake needs on top of raw parquet directories
  * (role model: the reference's dataset layer, which scans a
  * *static* file listing — `cpp/src/arrow/dataset/dataset.h:156-210`;
  * this adds the missing notion of WHICH files constitute the table
  * at a point in time).
  *
  * Layout: `<root>/_log/v00000.json, v00001.json, ...` — one JSON
  * entry per commit, listing data files ADDED and files REMOVED
  * (paths relative to root); data files live under `<root>/data/` in
  * per-commit subdirectories. The log is the single source of truth:
  *
  *  - **Visibility = log publish.** Data files are fully written
  *    BEFORE their log entry exists, and readers resolve the file
  *    list from the log — so a reader can never observe a
  *    half-written commit (the weakness the ADVICE review noted in
  *    the raw IPC directory sink is structural here, not patched).
  *  - **Snapshot isolation.** [[snapshot]] resolves the live file
  *    set EAGERLY at call time; concurrent appends/compactions
  *    publish new versions but never mutate or delete listed files,
  *    so an open snapshot stays stable for its lifetime (until
  *    [[vacuum]] reclaims delisted files).
  *  - **Time travel.** `snapshot(root, version = v)` replays the log
  *    prefix `<= v`.
  *  - **Optimistic concurrency.** Commit = write temp JSON, then an
  *    ATOMIC fail-if-exists publish to `v<next>.json` ([[CasFs]]:
  *    `link(2)` on local filesystems, rename on HDFS where it
  *    already refuses an existing destination); on loss (version
  *    taken) re-read the log and retry at the next number. There is
  *    no exists+rename TOCTOU window anywhere in the protocol.
  *    Object stores without atomic rename need a commit coordinator,
  *    as Delta's S3 LogStore does.
  *    Removing commits additionally re-validate on every attempt
  *    that their whole remove set is still live, so a layout rewrite
  *    racing a delete ABORTS rather than resurrecting deleted rows;
  *    add-only appends still merge freely.
  *  - **Log checkpoints.** Every `spark.graft.tablelog
  *    .checkpointInterval` (default 100) commits, the winning writer
  *    materializes the live state as `_log/ckpt-v%05d.tsv`; readers
  *    load the newest checkpoint at or below their target version
  *    and replay only the JSON suffix — O(interval) planning I/O per
  *    snapshot instead of O(#commits) (Delta's checkpoint.parquet
  *    analogue). Checkpoints are caches: best-effort, deletable,
  *    never consulted below their own version.
  *  - **Compaction is a commit.** [[compact]] rewrites the live set
  *    into fewer files and publishes {add: new, remove: old} in ONE
  *    entry — readers switch atomically, old snapshots keep working.
  *  - **Per-file stats → metadata-level pruning.** A commit written
  *    with `statsCols` carries a TSV sidecar of per-file min/max for
  *    those (long-valued) columns; [[readRange]] drops files whose
  *    range cannot intersect the predicate WITHOUT opening them. At
  *    millions of files this is the difference between O(matching)
  *    and O(all footers) planning; parquet's own row-group stats
  *    still prune WITHIN the files that survive. Files with no stats
  *    are always read (pruning can drop a file only when its stats
  *    prove it irrelevant), and the residual filter is always
  *    applied, so stats can never change an answer — only planning.
  *  - **Explicit schema evolution.** Every data-writing commit
  *    records its DataFrame schema (base64 of the DataType JSON, so
  *    the log line stays one-line-regular); [[tableSchema]] resolves
  *    the declared schema as of any version. Writes whose schema
  *    CHANGES an existing column's type outside the widening order,
  *    or DROPS a non-nullable column, are rejected at CAS time
  *    (re-checked on every publish attempt, so a racing evolution
  *    cannot slip through) — before this, evolution was implicit via
  *    `mergeSchema` reads and a bad writer corrupted silently.
  *    [[widenColumn]] performs Delta-3.x-style TYPE WIDENING as a
  *    metadata-only commit (int→long, float→double, …): no file
  *    rewrite — old narrow files widen at scan time via the explicit
  *    declared-schema read ([[readUnion]]), post-widen narrow writes
  *    upcast with the declared type staying wide, and a stream whose
  *    start schema predates the widening refuses loudly rather than
  *    narrow-casting. Additive evolution is first-class:
  *    [[addColumn]] publishes a metadata-only commit declaring a new
  *    nullable column, and [[snapshot]] presents the declared schema
  *    (missing-on-disk columns read as null, declared order, extras
  *    from dropped nullable columns hidden). Logs written before
  *    this feature have no schema records and keep the old implicit
  *    behavior.
  *  - **Row-level delete rewrites only matching files.**
  *    [[deleteRange]] uses the same stats to rewrite ONLY files that
  *    can contain matches, publishing {add: rewritten, remove:
  *    matched} in one commit; untouched files keep their identity
  *    (and stats). Pre-delete versions remain time-travelable.
  *  - **CHECK constraints.** [[addConstraint]] declares a named
  *    boolean SQL expression (validated against the current snapshot
  *    first) as a metadata-only commit; every subsequent data write
  *    is rejected — files deleted before any log entry exists — if a
  *    row definitively violates one (SQL semantics: NULL passes).
  *    Zero cost while no constraints are declared.
  *  - **Change data feed (Delta CDF parity).** With
  *    `spark.graft.tablelog.cdf` on, mutating commits capture their
  *    changed rows (tagged `_change_type`) as a parquet sidecar the
  *    log entry points at; [[tableChanges]] serves the row-level feed
  *    for any version range — appends derive 'insert' from their add
  *    lists with no sidecar, layout rewrites emit nothing, and a
  *    mutating commit captured without the feed refuses loudly.
  *  - **Deletion vectors (Delta DV / Iceberg positional-delete
  *    parity).** [[deleteVector]] deletes rows WITHOUT rewriting any
  *    data file: the matching (file, row position) pairs are written
  *    as a parquet sidecar and the commit records the active sidecar
  *    list (`"dvs":[...]` = the FULL post-commit state, so replay is
  *    last-writer-wins and old logs parse unchanged). Every read path
  *    ([[snapshot]]/[[readRange]]/[[readBox]]) and every rewriting
  *    mutation ([[deleteRange]]/[[merge]]/[[mergeUpdate]]) anti-joins
  *    the active vectors by (file key, `_metadata.row_index`) — the DV
  *    side auto-broadcasts below
  *    `spark.graft.tablelog.dv.broadcastMaxBytes` (32 MB default,
  *    decided from driver-side file lengths, no extra job). Layout
  *    rewrites ([[rewrite]]/[[compact]]/[[overwrite]]) MATERIALIZE the
  *    deletes (they rewrite from the DV-filtered snapshot) and clear
  *    the vector state; [[restore]] restores it; [[vacuum]] reclaims
  *    unreachable sidecars. At 100 TB this is the difference between
  *    deleting 0.1% of rows by appending kilobytes and rewriting
  *    terabytes. Lost-update races (a delete landing between a
  *    rewrite's read and its publish, or vice versa) abort through
  *    CAS-time expected-state revalidation, same posture as the
  *    remove-set check.
  *
  * Scale posture: the log is O(#commits) driver-side metadata and
  * stats are O(#files · #statsCols); data moves only through
  * distributed parquet jobs. Nothing here shuffles.
  */
object TableLog {

  private def fs(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def logPath(root: String, v: Int): Path =
    new Path(f"$root/_log/v$v%05d.json")

  // (kept trivially regular so the hand-rolled parser below cannot
  // drift from the writer: paths are uuid/part names, never quoted
  // metacharacters)
  private def render(version: Int, add: Seq[String], remove: Seq[String],
      statsFile: Option[String], dataChange: Boolean,
      txn: Option[(String, Long)] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      cdc: Option[String] = None,
      check: Option[(String, String)] = None,
      uncheck: Option[String] = None,
      dvs: Option[Seq[String]] = None): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    val st = statsFile.map(p => s""","stats":"$p"""").getOrElse("")
    val tx = txn.map { case (a, v) =>
      require(!a.contains('"') && !a.contains(':'),
        s"txn app id must not contain quotes or ':': $a")
      s""","txn":"$a:$v""""
    }.getOrElse("")
    // base64 keeps the schema's own JSON (quotes, braces) out of the
    // line so the regex parsers above stay sound
    val sc = schema.map(sch => s""","schema":"${java.util.Base64.getEncoder
      .encodeToString(sch.json.getBytes("UTF-8"))}"""").getOrElse("")
    val cd = cdc.map(p => s""","cdc":"$p"""").getOrElse("")
    // constraint expression rides base64 for the same reason as schema
    val ck = check.map { case (n, e) =>
      require(n.matches("[A-Za-z0-9_]+"), s"constraint name must be [A-Za-z0-9_]+: $n")
      s""","check":"$n:${java.util.Base64.getEncoder
        .encodeToString(e.getBytes("UTF-8"))}""""
    }.getOrElse("")
    val uk = uncheck.map(n => s""","uncheck":"$n"""").getOrElse("")
    // dvs renders the FULL post-commit deletion-vector state: absence
    // means "unchanged", an empty array means "cleared" — so replay is
    // a plain last-writer-wins scan and pre-DV logs need no migration
    val dv = dvs.map(ds => s""","dvs":${arr(ds)}""").getOrElse("")
    s"""{"version":$version,"add":${arr(add)},"remove":${arr(remove)}$st$tx$sc$cd$ck$uk$dv,"dataChange":$dataChange}"""
  }

  private def parseCdc(json: String): Option[String] =
    "\"cdc\":\"([^\"]*)\"".r.findFirstMatchIn(json).map(_.group(1))

  /** None = this commit does not change deletion-vector state;
    * Some(list) = the full active-sidecar list after this commit. */
  private def parseDvs(json: String): Option[Seq[String]] =
    if (!json.contains("\"dvs\":")) None else Some(parseArr(json, "dvs"))

  /** An entry naming a file OUTSIDE this table's root (absolute path or
    * URI) — introduced by [[clone]]; read as-is, never vacuumed here. */
  private def isExternal(rel: String): Boolean =
    rel.startsWith("/") || rel.contains("://")

  private def abs(root: String, rel: String): String =
    if (isExternal(rel)) rel else s"$root/$rel"

  private def parseCheck(json: String): Option[(String, String)] =
    "\"check\":\"([A-Za-z0-9_]+):([^\"]+)\"".r.findFirstMatchIn(json).map(m =>
      (m.group(1), new String(
        java.util.Base64.getDecoder.decode(m.group(2)), "UTF-8")))

  private def parseUncheck(json: String): Option[String] =
    "\"uncheck\":\"([A-Za-z0-9_]+)\"".r.findFirstMatchIn(json).map(_.group(1))

  private def parseSchema(json: String)
      : Option[org.apache.spark.sql.types.StructType] =
    "\"schema\":\"([^\"]+)\"".r.findFirstMatchIn(json).map { m =>
      org.apache.spark.sql.types.DataType.fromJson(new String(
        java.util.Base64.getDecoder.decode(m.group(1)), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  private def parseTxn(json: String): Option[(String, Long)] =
    "\"txn\":\"([^\":]+):(-?\\d+)\"".r.findFirstMatchIn(json)
      .map(m => (m.group(1), m.group(2).toLong))

  private def parseArr(json: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
    m.map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\"")))
      .getOrElse(Seq.empty)
  }

  private def parseStats(json: String): Option[String] =
    "\"stats\":\"([^\"]*)\"".r.findFirstMatchIn(json).map(_.group(1))

  // absent (pre-flag entries) defaults to true: treat unknown commits
  // as data changes, never silently skip rows
  private def parseDataChange(json: String): Boolean =
    !json.contains("\"dataChange\":false")

  private def readText(f: FileSystem, p: Path): String = {
    val c = activeCache.get
    if (c != null && p.toString.startsWith(c.logDirPrefix))
      c.textCached(p.toString, rawReadText(f, p))
    else rawReadText(f, p)
  }

  private def rawReadText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, "UTF-8")
    } finally in.close()
  }

  // ---- per-publish log cache ----------------------------------------
  /** Scoped cache making a CAS retry storm O(new commits) per attempt
    * instead of O(log directory listing) per attempt: installed for
    * the duration of ONE [[publish]] call (ThreadLocal — the commit
    * loop is driver-side, single-threaded; Spark jobs never read the
    * log). Published log entries are immutable, so their text caches
    * for the call's lifetime; the version list grows monotonically
    * and is EXTENDED between attempts by probing `exists(vLast+1…)`
    * — O(#commits landed since we last looked) — never by re-listing
    * the directory. Sound because versions are dense: every writer
    * targets exactly last+1 and the atomic publish closes gaps.
    * Checkpoints are pure caches and are listed once per publish —
    * a checkpoint landing mid-retry is simply not used this call. */
  private final class LogCache(f: FileSystem, val root: String) {
    val logDirPrefix: String = new Path(s"$root/_log").toString + "/"
    var listings = 0                 // directory listings this publish
    private var vs: Vector[Int] = null
    private var ckpts: Seq[Int] = null
    private val texts = mutable.Map.empty[String, String]
    def versionsCached(list: => Seq[Int]): Seq[Int] = {
      if (vs == null) { listings += 1; vs = list.toVector }
      else vs = extendKnownVersions(f, root, vs)
      vs
    }
    def checkpointsCached(list: => Seq[Int]): Seq[Int] = {
      if (ckpts == null) { listings += 1; ckpts = list }
      ckpts
    }
    def textCached(key: String, read: => String): String =
      texts.getOrElseUpdate(key, read)
  }
  /** Extend an already-known dense version prefix WITHOUT re-listing
    * the log directory: probe `exists(last+1…)` — O(commits landed
    * since the caller last looked). Includes dense-log gap repair: a
    * readdir racing two concurrent commits can return vN+1's entry
    * while missing vN's (the enumeration already passed vN's slot
    * when it landed); versions are dense by the publish protocol, so
    * any gap means a raced listing and the gaps are exists-probed.
    * O(1) when dense, O(#gaps) otherwise. Shared by the per-publish
    * [[LogCache]] and the streaming source's per-trigger planning. */
  private[sources] def extendKnownVersions(f: FileSystem, root: String,
      known: Vector[Int]): Vector[Int] = {
    var vs = known
    if (vs.nonEmpty && vs.length.toLong != vs.last.toLong - vs.head + 1) {
      val have = vs.toSet
      vs = (vs.head to vs.last)
        .filter(v => have(v) || f.exists(logPath(root, v))).toVector
    }
    var next = if (vs.isEmpty) 0 else vs.last + 1
    while (f.exists(logPath(root, next))) { vs = vs :+ next; next += 1 }
    vs
  }

  /** The streaming source's planning hook: `known` = the versions it
    * has already seen (null for the first call → one full listing);
    * afterwards each trigger pays O(new commits) exists-probes, never
    * a directory listing — the "planning I/O is O(new) per trigger"
    * contract.
    *
    * `floor` = the source's startExclusive. The initial readdir can
    * race a fresh table's earliest commits — the enumeration passes
    * v0's slot before v0 lands yet still catches v1 — and because the
    * source caches `known` for its lifetime (no per-trigger re-list),
    * a below-head miss would otherwise be skipped PERMANENTLY.
    * Versions are dense by the publish protocol, so a first listing
    * whose head sits above floor+1 gets the gap (floor, head)
    * exists-probed once; later triggers only extend past the tail and
    * interior gaps are already repaired by [[extendKnownVersions]]. */
  private[sources] def versionsIncremental(s: SparkSession, root: String,
      known: Vector[Int], floor: Int): Vector[Int] =
    if (known == null)
      repairBelowHead(fs(s, root), root, versions(s, root).toVector, floor)
    else extendKnownVersions(fs(s, root), root, known)

  /** Exists-probe the (floor, head) gap of an initial listing — see
    * [[versionsIncremental]]. Separated so the raced-readdir shape
    * (listing caught v1, missed v0) is directly testable. */
  private[graft] def repairBelowHead(f: FileSystem, root: String,
      listed: Vector[Int], floor: Int): Vector[Int] =
    if (listed.isEmpty || listed.head.toLong <= floor.toLong + 1) listed
    else ((floor + 1) until listed.head)
      .filter(v => f.exists(logPath(root, v))).toVector ++ listed

  private val activeCache = new ThreadLocal[LogCache]
  /** Test hook: (root, directory listings, CAS attempts) of the most
    * recently COMPLETED publish, any thread. */
  @volatile private[graft] var lastPublishFootprint: (String, Int, Int) = null

  /** Committed versions in ascending order (empty for a fresh root). */
  def versions(s: SparkSession, root: String): Seq[Int] = {
    val c = activeCache.get
    if (c != null && c.root == root) c.versionsCached(rawVersions(s, root))
    else rawVersions(s, root)
  }

  private def rawVersions(s: SparkSession, root: String): Seq[Int] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/_log")
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted.toSeq
  }

  // ---- log checkpoints ---------------------------------------------------
  // Replaying O(#commits) JSON entries per snapshot is the metadata
  // bottleneck a long-lived table hits (Delta's checkpoint.parquet
  // analogue). Every `checkpointInterval` commits the PUBLISHING
  // writer also materializes the full live state as one TSV
  // (`_log/ckpt-v%05d.tsv`, "relpath<TAB>statsRel" per line, in
  // insertion order); liveState then loads the newest checkpoint at
  // or below the requested version and replays only the JSON suffix.
  // Checkpoints are pure caches: best-effort to write (a loser of the
  // create race just skips), safe to delete, and never consulted for
  // versions below their own.

  private def ckptPath(root: String, v: Int): Path =
    new Path(f"$root/_log/ckpt-v$v%05d.tsv")

  private def checkpointInterval(s: SparkSession): Int =
    s.conf.getOption("spark.graft.tablelog.checkpointInterval")
      .map(_.toInt).getOrElse(100)

  private def checkpointVersions(s: SparkSession, root: String): Seq[Int] = {
    val c = activeCache.get
    if (c != null && c.root == root)
      c.checkpointsCached(rawCheckpointVersions(s, root))
    else rawCheckpointVersions(s, root)
  }

  private def rawCheckpointVersions(s: SparkSession, root: String): Seq[Int] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/_log")
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("ckpt-v") && n.endsWith(".tsv"))
      .map(n => n.stripPrefix("ckpt-v").stripSuffix(".tsv").toInt)
      .sorted.toSeq
  }

  /** Sentinel last line of a checkpoint: a reader that finds it knows
    * the file was completely written (create+write+close in place
    * would expose an empty or torn prefix to a concurrent
    * [[replayState]], silently dropping every file <= the checkpoint
    * version from the live set). Belt: the tmp+rename below makes the
    * file appear atomically, same CAS protocol as [[publish]].
    * Suspenders: a checkpoint missing the sentinel (pre-sentinel
    * writer, torn non-atomic filesystem copy) is treated as absent and
    * the reader falls back to raw JSON replay — checkpoints are pure
    * caches, never trusted over the log. */
  private val CkptEnd = "#end"

  private def writeCheckpoint(s: SparkSession, root: String, v: Int): Unit = {
    val state = replayState(s, root, v, useCheckpoint = true)._1
    // txn watermarks ride the checkpoint too ("#txn\tapp\tversion"
    // lines), so lastTxnVersion — the exactly-once ingestion check run
    // on EVERY appendIdempotent — replays O(interval) JSON entries,
    // not O(#commits)
    val txns = txnState(s, root, v).toSeq.sortBy(_._1)
      .map { case (a, tv) => s"#txn\t$a\t$tv" }
    // active deletion vectors ride too ("#dv\t<dir>"), so dvState —
    // consulted by every snapshot — replays O(interval), not O(#commits)
    val dvLines = dvState(s, root, v, useCheckpoint = true).map(d => s"#dv\t$d")
    val body = (state.map { case (p, st) => s"$p\t${st.getOrElse("")}" } ++
      txns ++ dvLines :+ CkptEnd).mkString("", "\n", "\n")
    val f = fs(s, root)
    try {
      val tmp = new Path(s"$root/_log/.tmp-ckpt-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val target = ckptPath(root, v)
      if (!CasFs.publish(f, tmp, target))
        f.delete(tmp, false)          // lost the race: a ckpt exists, skip
    } catch { case _: java.io.IOException => () } // best-effort cache
  }

  /** Parse a checkpoint body into (live state, txn watermarks, active
    * deletion vectors); None when the file is incomplete (no
    * [[CkptEnd]] sentinel) or malformed (a line without a tab, an
    * unknown directive) — the caller then ignores the checkpoint
    * entirely. */
  private def parseCheckpoint(body: String)
      : Option[(Seq[(String, Option[String])], Map[String, Long], Seq[String])] = {
    val lines = body.split('\n').filter(_.nonEmpty)
    if (lines.isEmpty || lines.last != CkptEnd) return None
    val (directives, entries) = lines.dropRight(1).partition(_.startsWith("#"))
    if (entries.exists(!_.contains('\t'))) return None
    val txns = mutable.Map.empty[String, Long]
    val dvs = mutable.ArrayBuffer.empty[String]
    directives.map(_.split('\t')).foreach {
      case Array("#txn", app, v) => txns(app) = v.toLong
      case Array("#dv", dir) => dvs += dir
      case _ => return None
    }
    Some((entries.toSeq.map { line =>
      val i = line.indexOf('\t')
      val st = line.substring(i + 1)
      (line.substring(0, i), if (st.isEmpty) None else Some(st))
    }, txns.toMap, dvs.toSeq))
  }

  /** Per-app transaction watermarks as of `version` (-1 = latest):
    * newest usable checkpoint's #txn directives + a JSON-suffix scan. */
  private[graft] def txnState(s: SparkSession, root: String,
      version: Int): Map[String, Long] = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val upto = if (version < 0) vs else vs.filter(_ <= version)
    if (upto.isEmpty) return Map.empty
    val base = checkpointVersions(s, root).filter(_ <= upto.last).lastOption
      .flatMap { cv =>
        parseCheckpoint(readText(f, ckptPath(root, cv))).map(cv -> _._2)
      }
    val m = mutable.Map.empty[String, Long]
    base.foreach { case (_, txns) => m ++= txns }
    upto.filter(v => base.forall(_._1 < v)).foreach { v =>
      parseTxn(readText(f, logPath(root, v))).foreach { case (a, tv) =>
        if (m.get(a).forall(_ < tv)) m(a) = tv
      }
    }
    m.toMap
  }

  /** Live file set (relative paths, insertion-ordered) plus the stats
    * sidecar of the commit that added each file, as of `version`
    * (-1 = latest): newest checkpoint at or below the target plus a
    * replay of only the JSON entries after it. */
  private def liveState(s: SparkSession, root: String,
      version: Int): Seq[(String, Option[String])] =
    replayState(s, root, version, useCheckpoint = true)._1

  /** The replay itself; also reports (checkpoint used, #JSON entries
    * replayed) so TableLogSpec can pin the read footprint. */
  private[graft] def replayState(s: SparkSession, root: String, version: Int,
      useCheckpoint: Boolean): (Seq[(String, Option[String])], Option[Int], Int) = {
    val f = fs(s, root)
    val vs = versions(s, root)
    require(vs.nonEmpty, s"TableLog at $root has no commits")
    val upto = if (version < 0) vs else vs.filter(_ <= version)
    require(upto.nonEmpty, s"no committed version <= $version at $root")
    val live = mutable.LinkedHashMap.empty[String, Option[String]]
    // a checkpoint that doesn't parse (torn write, pre-sentinel format)
    // is treated as ABSENT — fall back to full JSON replay rather than
    // trust a prefix that would silently drop live files
    val base = (if (useCheckpoint)
      checkpointVersions(s, root).filter(_ <= upto.last).lastOption
    else None).flatMap { cv =>
      parseCheckpoint(readText(f, ckptPath(root, cv))).map(cv -> _._1)
    }
    base.foreach { case (_, entries) =>
      entries.foreach { case (p, st) => live.put(p, st) }
    }
    val tail = upto.filter(v => base.forall(_._1 < v))
    tail.foreach { v =>
      val json = readText(f, logPath(root, v))
      val st = parseStats(json)
      parseArr(json, "remove").foreach(live.remove)
      parseArr(json, "add").foreach(a => live.put(a, st))
    }
    (live.toSeq, base.map(_._1), tail.size)
  }

  private def liveFiles(s: SparkSession, root: String, version: Int): Seq[String] =
    liveState(s, root, version).map(_._1)

  /** Active deletion-vector sidecar dirs as of `version` (-1 = latest):
    * newest checkpoint's `#dv` directives plus a last-writer-wins scan
    * of the JSON suffix ("dvs" records the full state, so replay keeps
    * only the newest record). */
  private[graft] def dvState(s: SparkSession, root: String, version: Int,
      useCheckpoint: Boolean = true): Seq[String] = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val upto = if (version < 0) vs else vs.filter(_ <= version)
    if (upto.isEmpty) return Seq.empty
    val base = (if (useCheckpoint)
      checkpointVersions(s, root).filter(_ <= upto.last).lastOption
    else None).flatMap { cv =>
      parseCheckpoint(readText(f, ckptPath(root, cv))).map(cv -> _._3)
    }
    var dvs: Seq[String] = base.map(_._2).getOrElse(Seq.empty)
    upto.filter(v => base.forall(_._1 < v)).foreach { v =>
      parseDvs(readText(f, logPath(root, v))).foreach(dvs = _)
    }
    dvs
  }

  /** File key shared by deletion vectors and `_metadata.file_path`:
    * the last three path components (`data/<uuid>/<part>.parquet`) —
    * identical for internal and [[clone]]-referenced external files,
    * collision-free by the per-commit uuid. */
  private def fileKey(c: Column): Column = substring_index(c, "/", -3)

  private def dvBroadcastMaxBytes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.tablelog.dv.broadcastMaxBytes")
      .map(_.toLong).getOrElse(32L * 1024 * 1024)

  /** The union of `dvs` as a keyed (_g_dv_file, _g_dv_pos) frame,
    * broadcast-hinted while the sidecars' total on-disk size (driver
    * metadata, no job) fits `spark.graft.tablelog.dv.broadcastMaxBytes`. */
  private def dvJoinFrame(s: SparkSession, root: String,
      dvs: Seq[String]): DataFrame = {
    val f = fs(s, root)
    val bytes = dvs.map { d =>
      val p = new Path(abs(root, d))
      if (f.exists(p)) f.getContentSummary(p).getLength else 0L
    }.sum
    val dvRaw = s.read.parquet(dvs.map(abs(root, _)): _*)
      .select(fileKey(col("file")).as("_g_dv_file"),
        col("pos").as("_g_dv_pos"))
    if (bytes <= dvBroadcastMaxBytes(s)) broadcast(dvRaw) else dvRaw
  }

  /** `df` (a parquet scan of this table's files) minus the rows the
    * active deletion vectors name — an anti-join on (file key,
    * `_metadata.row_index`). The DV side broadcasts while its on-disk
    * size (driver metadata, no job) stays under
    * `spark.graft.tablelog.dv.broadcastMaxBytes`; past that the join
    * shuffles and a [[compact]] is overdue. No-op without active DVs. */
  private def applyDv(s: SparkSession, root: String, df: DataFrame,
      dvs: Seq[String]): DataFrame = {
    if (dvs.isEmpty) return df
    val cols = df.columns.map(col).toSeq
    df.withColumn("_g_file", fileKey(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index"))
      .join(dvJoinFrame(s, root, dvs), col("_g_file") === col("_g_dv_file") &&
        col("_g_pos") === col("_g_dv_pos"), "left_anti")
      .select(cols: _*)
  }

  /** The declared table schema as of `version` (-1 = latest): the
    * newest commit at or below `version` that recorded one. None for
    * logs written before schema recording existed. O(#commits) JSON
    * reads worst-case, but every data commit records a schema, so in
    * practice the walk stops at the first or second entry. */
  def tableSchema(s: SparkSession, root: String, version: Int = -1)
      : Option[org.apache.spark.sql.types.StructType] = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val upTo = if (version < 0) vs else vs.filter(_ <= version)
    upTo.reverseIterator
      .map(v => parseSchema(readText(f, logPath(root, v))))
      .collectFirst { case Some(sc) => sc }
  }

  // ---- CHECK constraints -------------------------------------------------
  // Delta's `ALTER TABLE ADD CONSTRAINT` parity: named boolean SQL
  // expressions recorded in the log as metadata-only commits
  // ("check":"name:base64(expr)" / "uncheck":"name"), enforced on
  // every data write. SQL CHECK semantics: a row violates only when
  // the expression is definitively FALSE (NULL passes); NOT NULL is
  // the special case `c IS NOT NULL`. Adding a constraint validates
  // the CURRENT snapshot first — a table can never be in a state its
  // declared constraints reject. Enforcement is one extra aggregate
  // over just-written files per commit, and only when constraints
  // exist: an unconstrained table pays nothing.

  /** Declared constraints as of `version` (-1 = latest), by name. */
  def constraints(s: SparkSession, root: String,
      version: Int = -1): Map[String, String] = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val upto = if (version < 0) vs else vs.filter(_ <= version)
    val m = mutable.LinkedHashMap.empty[String, String]
    upto.foreach { v =>
      val json = readText(f, logPath(root, v))
      parseCheck(json).foreach { case (n, e) => m(n) = e }
      parseUncheck(json).foreach(m.remove)
    }
    m.toMap
  }

  /** Rows that DEFINITIVELY violate `e` (false, not null — SQL CHECK). */
  private def violating(df: DataFrame, e: String): DataFrame =
    df.filter(!coalesce(expr(e), lit(true)))

  /** ADD CONSTRAINT: validate the current snapshot against `exprSql`
    * (a constraint the existing data violates is rejected — Delta
    * semantics), then publish a metadata-only commit declaring it.
    * Every subsequent data write is checked; [[dropConstraint]]
    * lifts it. Returns the committed version. */
  def addConstraint(s: SparkSession, root: String, name: String,
      exprSql: String): Int = {
    val bad = violating(snapshot(s, root), exprSql).limit(1).count()
    require(bad == 0,
      s"addConstraint: existing rows violate CHECK $name ($exprSql)")
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      check = Some(name -> exprSql))
  }

  /** DROP CONSTRAINT as a metadata-only commit. */
  def dropConstraint(s: SparkSession, root: String, name: String): Int = {
    require(constraints(s, root).contains(name),
      s"dropConstraint: no constraint named $name")
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      uncheck = Some(name))
  }

  /** Enforce all declared constraints on freshly-written (not yet
    * published) files: ONE aggregate job counting violations per
    * constraint; on any violation the unpublished files are deleted
    * (they were never visible — data-before-log) and the write
    * throws with the per-constraint counts. */
  private def enforceConstraints(s: SparkSession, root: String,
      sub: String): Unit = {
    val cs = constraints(s, root)
    if (cs.isEmpty) return
    val named = cs.toSeq
    val counts = s.read.parquet(s"$root/$sub").select(named.map { case (n, e) =>
      count(when(!coalesce(expr(e), lit(true)), 1)).as(n)
    }: _*).head()
    val bad = named.indices.filter(i => counts.getLong(i) > 0)
      .map(i => s"${named(i)._1} (${named(i)._2}): ${counts.getLong(i)} rows")
    if (bad.nonEmpty) {
      fs(s, root).delete(new Path(s"$root/$sub"), true)
      throw new IllegalStateException(
        s"TableLog: CHECK constraint violation — ${bad.mkString("; ")}")
    }
  }

  /** Violations that make writing `next` into a table currently
    * declared as `cur` unsafe: changing an existing column's type
    * outside the widening order (readers would see conflicting
    * parquet types) or dropping a column `cur` declares non-nullable
    * (old readers assume it present). Adding nullable columns,
    * omitting nullable columns, NARROWER-typed writes (upcast, the
    * declared type stays wide) and — through [[widenColumn]] only —
    * widening promotions are legal evolution. */
  /** The type-widening partial order (Delta 3.x / Iceberg type
    * promotion): `from` may be declared as `to` without rewriting a
    * single data file, because (a) every `from` value is exactly
    * representable in `to` and (b) Spark 4's parquet readers perform
    * the widening promotion at scan time (SPARK-40876), so old files
    * keep their narrow physical encoding and new files write wide.
    * Deliberately EXCLUDED: anything lossy (long→int, double→float,
    * decimal scale changes) and string↔numeric coercions. */
  private[sources] def widensTo(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (a, b) if a == b => false
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (ByteType | ShortType | IntegerType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        b.scale == a.scale && b.precision > a.precision
      case _ => false
    }
  }

  private def schemaViolations(cur: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType,
      allowWiden: Boolean): Seq[String] = {
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val typeChanged = cur.fields.toSeq.flatMap { f =>
      nextByName.get(f.name)
        .filter(_.dataType != f.dataType)
        // a NARROWER write is a legal upcast (the declared type stays
        // wide — publish records cur's type, not the write's); a WIDER
        // type is legal only through [[widenColumn]] (allowWiden)
        .filterNot(n => widensTo(n.dataType, f.dataType))
        .filterNot(n => allowWiden && widensTo(f.dataType, n.dataType))
        .map(n => s"type change on '${f.name}': ${f.dataType.simpleString} -> ${n.dataType.simpleString}")
    }
    val droppedRequired = cur.fields.toSeq
      .filter(f => !f.nullable && !nextByName.contains(f.name))
      .map(f => s"dropped non-nullable column '${f.name}'")
    // a write re-using a column's PREVIOUS name would silently fork
    // the rename (and re-declare the old schema) — reject with a
    // pointer to the new name
    val prevOf = cur.fields.toSeq.flatMap(f =>
      physNames(f).drop(1).map(_ -> f.name)).toMap
    val renamedAway = next.fields.toSeq
      .filter(f => prevOf.contains(f.name) && !cur.fieldNames.contains(f.name))
      .map(f => s"column '${f.name}' was renamed to '${prevOf(f.name)}'")
    typeChanged ++ droppedRequired ++ renamedAway
  }

  /** Publish one commit via exists-guarded rename CAS; returns the
    * version that won. A commit that REMOVES files re-validates, on
    * every attempt, that its whole remove set is still live — so a
    * rewrite/compact racing a deleteRange aborts (with
    * `ConcurrentModificationException`) instead of committing a swap
    * that would resurrect deleted rows. Add-only commits never
    * conflict and retry freely.
    *
    * `expectFiles` / `expectDvs` extend the same CAS posture to
    * deletion vectors: a commit whose row math was computed against a
    * specific live-file set or DV state (a [[deleteVector]], or a
    * layout rewrite that materializes DVs) re-validates, per attempt,
    * that the state is STILL exactly that — otherwise a delete landing
    * between a rewrite's read and its publish (or vice versa) would be
    * silently lost. */
  private def publish(s: SparkSession, root: String, add: Seq[String],
      remove: Seq[String], statsFile: Option[String] = None,
      dataChange: Boolean = true, txn: Option[(String, Long)] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      schemaNow: Option[() => org.apache.spark.sql.types.StructType] = None,
      enforceSchema: Boolean = true, allowWiden: Boolean = false,
      cdc: Option[String] = None,
      check: Option[(String, String)] = None,
      uncheck: Option[String] = None,
      dvs: Option[Seq[String]] = None,
      expectFiles: Option[Set[String]] = None,
      expectDvs: Option[Seq[String]] = None): Int = {
    val f = fs(s, root)
    f.mkdirs(new Path(s"$root/_log"))
    // data commits record the WRITE's schema; carry the declared
    // fields' metadata (the rename name-mapping) onto it by name —
    // otherwise a post-rename append would re-declare a schema
    // without the mapping and orphan every pre-rename file's column
    // recomputed on EVERY CAS attempt (not hoisted): a concurrent
    // widenColumn or rename landing between attempts must be folded
    // into THIS commit's recorded schema, or a racing narrow append
    // would regress the widening / drop the name mapping it never saw
    def schemaRec(): Option[org.apache.spark.sql.types.StructType] =
      schema.map { next =>
        tableSchema(s, root) match {
          case None => next
          case Some(c) =>
            val curByName = c.fields.map(fl => fl.name -> fl).toMap
            org.apache.spark.sql.types.StructType(next.fields.map { fl =>
              curByName.get(fl.name) match {
                case Some(cf) =>
                  // sticky-wide: a write whose column is NARROWER than
                  // the declared type is an upcast — the recorded schema
                  // keeps the declared (wide) type, or a post-widen int
                  // append would silently regress the widening
                  val dt = if (widensTo(fl.dataType, cf.dataType)) cf.dataType
                    else fl.dataType
                  fl.copy(dataType = dt, metadata = cf.metadata)
                case None => fl
              }
            })
        }
      }
    // retry-storm read footprint: one LogCache per publish call makes
    // every re-validation on attempts 2..n re-read only entries that
    // LANDED since attempt 1 (probe + per-entry reads), never re-list
    // the log directory — O(new commits) per retry, Delta's posture
    val cache = new LogCache(f, root)
    val prevCache = activeCache.get
    activeCache.set(cache)
    var attempts = 0
    try {
    var attempt = versions(s, root).lastOption.getOrElse(-1) + 1
    while (true) {
      attempts += 1
      // evolution commits (schemaNow) re-DERIVE their target schema
      // from the schema as of THIS attempt: a racing addColumn landing
      // between attempts must appear in this commit's record (a stale
      // pre-derived StructType would silently erase it), and a racing
      // dropColumn must not be resurrected. The thunk's result is
      // authoritative — no fold — because it was computed FROM the
      // current declared schema.
      val schemaAttempt = schemaNow.map(fn => fn()).orElse(schema)
      // schema compatibility re-checked on EVERY attempt (CAS time):
      // a concurrent commit may have evolved the declared schema
      // between our check and our rename
      if (enforceSchema)
        for (next <- schemaAttempt; cur <- tableSchema(s, root)) {
          val bad = schemaViolations(cur, next, allowWiden)
          if (bad.nonEmpty) throw new IllegalStateException(
            s"TableLog: incompatible schema change rejected: ${bad.mkString("; ")}")
        }
      if (remove.nonEmpty) {
        val live = liveFiles(s, root, -1).toSet
        val gone = remove.filterNot(live)
        if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
          "TableLog: commit would remove files a concurrent commit " +
            s"already removed (rebase and retry): ${gone.take(3).mkString(", ")}")
      }
      expectFiles.foreach { exp =>
        if (liveFiles(s, root, -1).toSet != exp)
          throw new java.util.ConcurrentModificationException(
            "TableLog: live file set changed under this commit " +
              "(rebase and retry)")
      }
      expectDvs.foreach { exp =>
        if (dvState(s, root, -1) != exp)
          throw new java.util.ConcurrentModificationException(
            "TableLog: deletion-vector state changed under this commit " +
              "(rebase and retry)")
      }
      // transactional idempotency re-checked on EVERY attempt: if a
      // concurrent writer committed the same (app, >=version) between
      // our check and our CAS, bow out instead of double-appending
      txn.foreach { case (app, v) =>
        if (lastTxnVersion(s, root, app).exists(_ >= v))
          throw new java.util.ConcurrentModificationException(
            s"TableLog: txn $app:$v already committed")
      }
      val tmp = new Path(s"$root/_log/.tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      // data commits fold the write's schema against the declared one
      // (sticky-wide + metadata carry, schemaRec); evolution commits
      // record the per-attempt derivation verbatim
      val schemaOut =
        if (schemaNow.isDefined) schemaAttempt else schemaRec()
      try out.write(
        render(attempt, add, remove, statsFile, dataChange, txn, schemaOut, cdc,
          check, uncheck, dvs).getBytes("UTF-8"))
      finally out.close()
      val target = logPath(root, attempt)
      if (CasFs.publish(f, tmp, target)) {
        val interval = checkpointInterval(s)
        if (attempt > 0 && attempt % interval == 0)
          writeCheckpoint(s, root, attempt)
        return attempt
      }
      f.delete(tmp, false)            // lost the race: next version
      attempt = math.max(attempt + 1,
        versions(s, root).lastOption.getOrElse(-1) + 1)
    }
    -1 // unreachable
    } finally {
      if (prevCache == null) activeCache.remove()
      else activeCache.set(prevCache)
      lastPublishFootprint = (root, cache.listings, attempts)
    }
  }

  /** Run two independent write actions on concurrent driver threads
    * (guide §2.6 "overlap independent jobs"): a mutation commit's CDC
    * sidecar write and its data rewrite share no outputs, so the
    * commit's wall is max(two jobs) instead of their sum — the next
    * job's tasks back-fill executors the first job's tail leaves
    * idle. Exceptions from either side propagate (the secondary's
    * cause unwrapped); the orphaned-dir contract is unchanged — a
    * failure before publish leaves at most the same unreferenced
    * subdirs the sequential order could. */
  private def par2[A, B](a: => A, b: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    try {
      val fb = pool.submit(new java.util.concurrent.Callable[B] {
        override def call(): B = b
      })
      val ra = a
      val rb = try fb.get() catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
      (ra, rb)
    } finally pool.shutdownNow()
  }

  /** Write `df` into a fresh per-commit subdir; returns (subdir,
    * relative file list). */
  private def writeData(s: SparkSession, root: String,
      df: DataFrame): (String, Seq[String]) = {
    val sub = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$sub")
    // every data write (append / overwrite / merge / delete-survivor
    // rewrite) passes the declared CHECK constraints before it can be
    // published; layout-only rewrites ([[rewrite]]/[[compact]]) carry
    // the same rows by contract and skip the scan. ANY enforcement
    // failure (violation or unresolved expression) deletes the dir —
    // an unpublished write is unreachable by vacuum forever
    try enforceConstraints(s, root, sub)
    catch { case e: Throwable =>
      try { fs(s, root).delete(new Path(s"$root/$sub"), true); () }
      catch { case _: Throwable => () }
      throw e
    }
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$sub/$n").toSeq
    (sub, files)
  }

  /** Per-file min/max lines for `statsCols` read from the parquet
    * FOOTERS the write already produced — integer column-chunk
    * statistics are exact (no binary truncation), so re-scanning the
    * data to recompute them is a full extra pass for information the
    * format persists for free. O(#files) driver footer reads, like
    * every other metadata walk in this log. Returns None (→ caller
    * falls back to the distributed scan) when any chunk lacks usable
    * stats or a column isn't a plain signed int32/int64 — the
    * fallback keeps the scan path's exact cast-to-long semantics for
    * exotic layouts rather than risking a wrong range that would
    * mis-prune reads. */
  private def footerStatLines(s: SparkSession, root: String, sub: String,
      statsCols: Seq[String]): Option[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = s.sparkContext.hadoopConfiguration
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // per-file footer reads are independent metadata I/O: a bounded
    // pool keeps a many-file commit from serializing on the driver
    // (guide §5 — keep the driver thin; VERDICT r14 item 7). Output
    // keeps the deterministic (file-name-sorted, statsCols-ordered)
    // line order the sidecar has always had.
    def fileLines(p: Path): Seq[String] = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        statsCols.flatMap { c =>
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var seen = false
          for (b <- blocks) {
            val cc = b.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .getOrElse(throw new UnsupportedOperationException(
                s"column $c not found in footer"))
            val st = cc.getStatistics
            if (st == null || st.isEmpty)
              throw new UnsupportedOperationException(s"no stats for $c")
            if (st.hasNonNullValue) {
              val ann = cc.getPrimitiveType.getLogicalTypeAnnotation
              val plainInt = ann == null || (ann match {
                case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                  i.isSigned
                case _ => false
              })
              val (lo, hi) =
                cc.getPrimitiveType.getPrimitiveTypeName match {
                  case PrimitiveTypeName.INT64 if plainInt =>
                    (st.genericGetMin.asInstanceOf[java.lang.Long]
                      .longValue,
                      st.genericGetMax.asInstanceOf[java.lang.Long]
                        .longValue)
                  case PrimitiveTypeName.INT32 if plainInt =>
                    (st.genericGetMin.asInstanceOf[java.lang.Integer]
                      .longValue,
                      st.genericGetMax.asInstanceOf[java.lang.Integer]
                        .longValue)
                  case other => throw new UnsupportedOperationException(
                    s"unsupported stats type $other for $c")
                }
              if (lo < mn) mn = lo
              if (hi > mx) mx = hi
              seen = true
            }
          }
          // all-null column in this file: emit NO line (the file
          // stays in the no-stats always-read class), same as the
          // scan path's null-min/max handling
          if (seen) Some(s"$sub/${p.getName}\t$c\t$mn\t$mx") else None
        }
      } finally reader.close()
    }
    try {
      if (files.length <= 2) Some(files.toSeq.flatMap(fileLines))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(8, files.length))
        try {
          val futs = files.toSeq.map(p =>
            pool.submit(new java.util.concurrent.Callable[Seq[String]] {
              override def call(): Seq[String] = fileLines(p)
            }))
          // unwrap the pool's ExecutionException so the NonFatal
          // fallback (and its log line) sees the real cause
          Some(futs.flatMap(fut =>
            try fut.get()
            catch { case e: java.util.concurrent.ExecutionException =>
              throw e.getCause }))
        } finally pool.shutdownNow()
      }
    } catch { case scala.util.control.NonFatal(e) =>
      // NonFatal only: an OOM/interrupt must propagate, and a
      // persistently-degraded footer path (every commit paying the
      // full-scan fallback) must be visible, not silent (ADVICE r14)
      org.slf4j.LoggerFactory.getLogger("graft.sources.TableLog").info(
        s"footer stats unavailable for $root/$sub, falling back to " +
          s"distributed scan: ${e.getClass.getSimpleName}: ${e.getMessage}")
      None
    }
  }

  /** Per-file min/max for `statsCols` (long-valued columns), written
    * as a TSV sidecar inside the commit's subdir. Served from the
    * parquet footers when possible ([[footerStatLines]]); otherwise
    * one distributed pass over the just-written files. Returns the
    * sidecar's relative path. */
  private def writeStats(s: SparkSession, root: String, sub: String,
      statsCols: Seq[String]): Option[String] = {
    if (statsCols.isEmpty) return None
    val lines: Seq[String] =
      footerStatLines(s, root, sub, statsCols).getOrElse {
        val aggs = statsCols.flatMap(c =>
          Seq(min(col(c).cast(LongType)).as(s"mn_$c"),
            max(col(c).cast(LongType)).as(s"mx_$c")))
        val rows = s.read.parquet(s"$root/$sub")
          .groupBy(input_file_name().as("f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()                  // O(#files) — driver metadata
        rows.toSeq.flatMap { r =>
          val file = sub + "/" + r.getString(0).split('/').last
          // an all-NULL column yields NULL min/max — emit NO line (the
          // file stays in the no-stats always-read class) rather than
          // unboxing null to a bogus (0, 0) range that would mis-prune
          statsCols.filter(c => !r.isNullAt(r.fieldIndex(s"mn_$c")) &&
              !r.isNullAt(r.fieldIndex(s"mx_$c")))
            .map(c => s"$file\t$c\t${r.getAs[Long](s"mn_$c")}\t${r.getAs[Long](s"mx_$c")}")
        }
      }
    val rel = s"$sub/_stats.tsv"
    val f = fs(s, root)
    val out = f.create(new Path(s"$root/$rel"), false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    Some(rel)
  }

  /** Append `df` as a new commit; returns the committed version.
    * `statsCols` (long-valued columns) adds a per-file min/max
    * sidecar enabling [[readRange]]/[[deleteRange]] pruning;
    * `bloomCols` adds per-file bloom filters enabling [[readPoint]]
    * file skipping on high-cardinality keys min/max ranges can't
    * prune. */
  def append(s: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil): Int = {
    val (sub, files) = writeData(s, root, df)
    writeBloom(s, root, sub, bloomCols)
    publishOrClean(s, root, Seq(sub)) {
      publish(s, root, files, Seq.empty, writeStats(s, root, sub, statsCols),
        schema = Some(df.schema))
    }
  }

  /** Highest committed transaction version for `app` (Delta's
    * `setTransaction`/`txnVersion` analogue) — the idempotency
    * watermark for [[appendIdempotent]]. Checkpoint-accelerated via
    * [[txnState]]: O(checkpoint interval) JSON reads, not O(#commits). */
  def lastTxnVersion(s: SparkSession, root: String, app: String): Option[Long] =
    txnState(s, root, -1).get(app)

  /** Idempotent transactional append — the streaming/exactly-once
    * ingestion primitive (Delta's idempotent writes: each commit
    * records an (application id, monotonically increasing version);
    * re-applying a version at or below the recorded watermark is a
    * NO-OP instead of a duplicate append). This is what makes a
    * Structured Streaming `foreachBatch(epochId)` sink into the log
    * effectively-exactly-once: epoch replays after a crash (or a full
    * checkpoint loss) skip instead of double-writing. Returns the
    * committed log version, or None when the transaction was already
    * applied (including a concurrent writer winning the same version
    * mid-commit). */
  def appendIdempotent(s: SparkSession, root: String, df: DataFrame,
      app: String, txnVersion: Long, statsCols: Seq[String] = Nil): Option[Int] = {
    val dir = new Path(s"$root/_log")
    if (fs(s, root).exists(dir) &&
        lastTxnVersion(s, root, app).exists(_ >= txnVersion)) return None
    val (sub, files) = writeData(s, root, df)
    try Some(publishOrClean(s, root, Seq(sub)) {
      publish(s, root, files, Seq.empty,
        writeStats(s, root, sub, statsCols), txn = Some(app -> txnVersion),
        schema = Some(df.schema))
    })
    catch {
      case _: java.util.ConcurrentModificationException => None // raced: applied
    }
  }

  /** Replace the whole table content with `df` in one commit. An
    * overwrite that also changes the schema incompatibly (type
    * change / dropped non-nullable) still rejects unless
    * `overwriteSchema = true` — replacing every row makes the change
    * safe for NEW snapshots, but it must be asked for explicitly
    * (Delta's `overwriteSchema` option), because time travel across
    * the boundary changes meaning. */
  def overwrite(s: SparkSession, root: String, df: DataFrame,
      statsCols: Seq[String] = Nil, overwriteSchema: Boolean = false): Int = {
    val old = if (versions(s, root).isEmpty) Seq.empty[String]
      else liveFiles(s, root, -1)
    val (sub, files) = writeData(s, root, df)
    // replacing every row discharges any pending deletion vectors
    publishOrClean(s, root, Seq(sub)) {
      publish(s, root, files, old, writeStats(s, root, sub, statsCols),
        schema = Some(df.schema), enforceSchema = !overwriteSchema,
        dvs = Some(Seq.empty))
    }
  }

  /** StructField metadata key listing a column's PREVIOUS physical
    * names, newest first — the name-mapping that makes RENAME a
    * metadata operation (Delta column-mapping parity). */
  private val PrevNamesKey = "graft.prevNames"

  /** All physical names a declared column may appear under in data
    * files, current name first. A file is written under exactly ONE
    * schema generation, so at most one of these is non-absent per
    * file — which is what makes the read-side coalesce exact. */
  private def physNames(f: org.apache.spark.sql.types.StructField): Seq[String] =
    f.name +: (if (f.metadata.contains(PrevNamesKey))
      f.metadata.getStringArray(PrevNamesKey).toSeq else Seq.empty)

  /** Column names an expression references (unresolved — schema
    * evolution guards need the NAMES, not a resolution). */
  private def exprRefs(s: SparkSession, sql: String): Seq[String] =
    s.sessionState.sqlParser.parseExpression(sql).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
    }

  /** Renaming or dropping a column a CHECK constraint references
    * would break every subsequent write with an unresolved-column
    * error (and orphan its data dir) — reject up front, like Delta. */
  private def requireUnconstrained(s: SparkSession, root: String,
      column: String, op: String): Unit = {
    val refs = constraints(s, root).collect {
      case (n, e) if exprRefs(s, e).exists(_.equalsIgnoreCase(column)) => n
    }
    require(refs.isEmpty,
      s"TableLog: cannot $op column '$column' — referenced by CHECK " +
        s"constraint(s) ${refs.mkString(", ")}; drop them first")
  }

  /** RENAME COLUMN without rewriting a byte: ONE metadata commit
    * re-declares the schema with the field under its new name and the
    * old name recorded in the field's name-mapping metadata. Reads
    * coalesce the declared name over every previous physical name
    * ([[alignDeclared]]); writes must use the NEW name — re-using a
    * previous name is rejected at CAS time with a pointer to the
    * rename ([[schemaViolations]]). Stats/bloom sidecars keyed by the
    * old name simply stop pruning (advisory by construction — missing
    * stats mean always-read, never a wrong answer) until the next
    * stats-bearing rewrite re-keys them. Time travel to pre-rename
    * versions presents the old declared schema unchanged. */
  def renameColumn(s: SparkSession, root: String, oldName: String,
      newName: String): Int = {
    import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
    val cur = tableSchema(s, root).getOrElse(throw new IllegalStateException(
      s"TableLog: $root has no declared schema to evolve (append data first)"))
    require(cur.fieldNames.contains(oldName),
      s"TableLog: no column '$oldName' to rename")
    require(!cur.fieldNames.contains(newName),
      s"TableLog: column '$newName' already exists")
    requireUnconstrained(s, root, oldName, "rename")
    // derived from the schema AS OF EACH publish attempt — a racing
    // evolution commit (addColumn, widen) is folded in, never erased
    def next(): StructType = {
      val base = tableSchema(s, root).get
      require(base.fieldNames.contains(oldName),
        s"TableLog: column '$oldName' vanished under this rename")
      StructType(base.fields.map { f =>
        if (f.name != oldName) f
        else StructField(newName, f.dataType, f.nullable,
          new MetadataBuilder().withMetadata(f.metadata)
            .putStringArray(PrevNamesKey, physNames(f).toArray).build())
      })
    }
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      schemaNow = Some(() => next()), enforceSchema = false)
  }

  /** DROP COLUMN as a metadata-only commit: the declared schema loses
    * the field, [[alignDeclared]] hides the straggler values in
    * existing files (no rewrite), and the non-nullable case is
    * rejected by the standard schema gate — dropping a required
    * column would make old rows unrepresentable. */
  def dropColumn(s: SparkSession, root: String, name: String): Int = {
    val cur = tableSchema(s, root).getOrElse(throw new IllegalStateException(
      s"TableLog: $root has no declared schema to evolve (append data first)"))
    require(cur.fieldNames.contains(name), s"TableLog: no column '$name'")
    requireUnconstrained(s, root, name, "drop")
    // per-attempt derivation: a racing addColumn survives this drop
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      schemaNow = Some(() => org.apache.spark.sql.types.StructType(
        tableSchema(s, root).get.fields.filterNot(_.name == name))))
  }

  /** ADD COLUMN as a metadata-only commit: declares a new NULLABLE
    * column in the table schema without touching any data file.
    * Subsequent snapshots present the column (null for every row
    * written before it existed); subsequent appends may populate it.
    * Rejects if the column already exists or the log has no declared
    * schema yet (pre-schema logs must append once first). */
  def addColumn(s: SparkSession, root: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Int = {
    val cur = tableSchema(s, root).getOrElse(throw new IllegalStateException(
      s"TableLog: $root has no declared schema to evolve (append data first)"))
    require(!cur.fieldNames.contains(name),
      s"TableLog: column '$name' already exists")
    // per-attempt derivation: two racing addColumns both survive
    // (the loser's retry folds the winner's column into its record)
    def next() = {
      val base = tableSchema(s, root).get
      require(!base.fieldNames.contains(name),
        s"TableLog: column '$name' already exists")
      org.apache.spark.sql.types.StructType(
        base.fields :+ org.apache.spark.sql.types.StructField(
          name, dataType, nullable = true))
    }
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      schemaNow = Some(() => next()))
  }

  /** Widen a column's declared type WITHOUT rewriting any data file
    * (Delta 3.x type widening / Iceberg type promotion). Only the
    * [[widensTo]] promotions are accepted — every existing value is
    * exactly representable, old files keep their narrow physical
    * encoding and are widened at scan time, new appends write the
    * wide type (and post-widen NARROW appends upcast, the declared
    * type staying wide). Schema-only commit: dataChange=false, so
    * streams and CDF see no phantom rows. */
  def widenColumn(s: SparkSession, root: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Int = {
    val cur = tableSchema(s, root).getOrElse(throw new IllegalStateException(
      s"TableLog: $root has no declared schema to evolve (append data first)"))
    val f = cur.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"TableLog: no column '$name' to widen"))
    require(widensTo(f.dataType, dataType),
      s"TableLog: '${f.dataType.simpleString}' does not widen to " +
        s"'${dataType.simpleString}' (lossy or unrelated change)")
    // per-attempt derivation: a racing addColumn survives; a racing
    // IDENTICAL widen turns this commit into a harmless re-declaration
    def next() = {
      val base = tableSchema(s, root).get
      val bf = base.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"TableLog: column '$name' vanished under this widen"))
      require(bf.dataType == dataType || widensTo(bf.dataType, dataType),
        s"TableLog: '${bf.dataType.simpleString}' does not widen to " +
          s"'${dataType.simpleString}' (lossy or unrelated change)")
      org.apache.spark.sql.types.StructType(base.fields.map(fl =>
        if (fl.name == name) fl.copy(dataType = dataType) else fl))
    }
    publish(s, root, Seq.empty, Seq.empty, dataChange = false,
      schemaNow = Some(() => next()), allowWiden = true)
  }

  /** The table as of `version` (-1 = latest). File list is resolved
    * NOW — the returned frame is a stable snapshot. */
  def snapshot(s: SparkSession, root: String, version: Int = -1): DataFrame = {
    val files = liveFiles(s, root, version).map(rel => abs(root, rel))
    val decl = tableSchema(s, root, version)
    val raw = applyDv(s, root, readUnion(s, files, decl),
      dvState(s, root, version))
    // when the log declares a schema (as of the requested version),
    // the DECLARED schema is the contract: columns added by
    // addColumn but not yet written read as null, column order is
    // the declared order, and stragglers from dropped nullable
    // columns are hidden. Pre-schema logs keep the raw union frame.
    decl match {
      case None => raw
      case Some(d) => alignDeclared(d, raw)
    }
  }

  /** Union read of data files spanning schema generations. With a
    * declared schema, reads under an EXPLICIT physical schema — every
    * generation's physical name carried at the DECLARED (possibly
    * widened) type: parquet's scan-time widening promotion
    * (SPARK-40876) reads narrow old files as the wide type, which
    * `mergeSchema` cannot do (int + bigint refuse to merge), and
    * skipping footer-merging is cheaper besides. Columns absent from
    * a file surface null, stragglers from drops are never even read.
    * Pre-schema logs keep the mergeSchema union. */
  private[sources] def readUnion(s: SparkSession, files: Seq[String],
      decl: Option[org.apache.spark.sql.types.StructType]): DataFrame =
    decl match {
      case None => s.read.option("mergeSchema", "true").parquet(files: _*)
      case Some(d) =>
        val phys = org.apache.spark.sql.types.StructType(
          d.fields.toSeq.flatMap(f => physNames(f).map(n =>
            org.apache.spark.sql.types.StructField(n, f.dataType,
              nullable = true))))
        s.read.schema(phys).parquet(files: _*)
    }

  /** Present `raw` under the DECLARED schema: declared column order,
    * columns added by addColumn but not yet written read as null,
    * stragglers from dropped nullable columns hidden. Shared by
    * [[snapshot]] and the streaming source. */
  private[sources] def alignDeclared(
      decl: org.apache.spark.sql.types.StructType, raw: DataFrame,
      keep: Seq[Column] = Nil): DataFrame = {
    val present = raw.columns.toSet
    raw.select(decl.fields.toSeq.map { f =>
      // a renamed column may appear under any of its physical names
      // (one per schema generation); exactly one is non-absent per
      // FILE, so coalesce across generations is exact.
      // The cast is the WIDENING finisher: per-commit readers (the
      // CDF assembly) surface pre-widen files at their narrow file
      // type — upcasting to the declared type is lossless by the
      // widensTo contract, and Catalyst elides it when types already
      // match.
      physNames(f).filter(present.contains) match {
        case Seq() => lit(null).cast(f.dataType).as(f.name)
        case Seq(one) => col(one).cast(f.dataType).as(f.name)
        case many => coalesce(many.map(col): _*).cast(f.dataType).as(f.name)
      }
    } ++ keep: _*)
  }

  /** Subset read with the SNAPSHOT contract: mergeSchema union over
    * `files`, active DVs anti-joined, and the declared schema (as of
    * `version`) presented through the name mapping — every pruned
    * read or rewrite path must resolve renamed columns exactly like
    * [[snapshot]], or pre-rename rows would surface null under the
    * declared name and silently vanish from filters. */
  private def readAligned(s: SparkSession, root: String,
      files: Seq[String], version: Int, dv: Seq[String]): DataFrame = {
    val decl = tableSchema(s, root, version)
    val raw = applyDv(s, root,
      readUnion(s, files.map(rel => abs(root, rel)), decl), dv)
    decl match {
      case None => raw
      case Some(d) => alignDeclared(d, raw)
    }
  }

  /** Run `commit`; on failure delete the freshly-written sidecar
    * `subs` (data/stats/cdc/dv directories) before rethrowing — an
    * aborted publish (CAS conflict, schema or constraint rejection)
    * must not orphan unreferenced directories that [[vacuum]], which
    * only walks PUBLISHED records, could never reclaim. */
  private def publishOrClean(s: SparkSession, root: String,
      subs: => Seq[String])(commit: => Int): Int =
    try commit catch { case e: Throwable =>
      val f = fs(s, root)
      subs.filter(_.nonEmpty).foreach { sub =>
        try { f.delete(new Path(s"$root/$sub"), true); () }
        catch { case _: Throwable => () }
      }
      throw e
    }

  /** One commit as the streaming source sees it: (dataChange,
    * absolute add paths, remove count, whether the commit records
    * deletion-vector state, whether it carries a CDC record). The CDC
    * record is what separates a row-DELETING rewrite from a pure
    * layout rewrite — both publish dataChange=false, but deletes
    * always record cdc (the empty sentinel when capture is off),
    * exactly so feeds can refuse instead of silently skipping. */
  private[sources] def commitFeed(s: SparkSession, root: String, v: Int)
      : (Boolean, Seq[String], Int, Boolean, Boolean) = {
    val json = readText(fs(s, root), logPath(root, v))
    (parseDataChange(json), parseArr(json, "add").map(abs(root, _)),
      parseArr(json, "remove").size, parseDvs(json).isDefined,
      parseCdc(json).isDefined)
  }

  /** Rows ADDED by data-changing commits with version > `sinceVersion`
    * — incremental consumption: a consumer that remembers the last
    * version it processed reads only the new files. Compaction and
    * delete rewrites publish dataChange=false, so their re-written
    * (old) rows are never re-emitted; row DELETIONS are not emitted
    * either (this is append-stream semantics, not full CDC — a
    * consumer needing reconciled state re-reads a snapshot). */
  def changesSince(s: SparkSession, root: String, sinceVersion: Int): DataFrame = {
    val f = fs(s, root)
    val files = versions(s, root).filter(_ > sinceVersion).flatMap { v =>
      val json = readText(f, logPath(root, v))
      if (parseDataChange(json)) parseArr(json, "add") else Seq.empty
    }
    if (files.isEmpty) snapshot(s, root).limit(0)
    else {
      val decl = tableSchema(s, root)
      val raw = readUnion(s, files.map(rel => abs(root, rel)), decl)
      decl match {
        case None => raw
        case Some(d) => alignDeclared(d, raw)
      }
    }
  }

  // ---- change data feed (Delta CDF parity) -------------------------------
  // Row-level change capture: when `spark.graft.tablelog.cdf` is true,
  // the row-mutating commits (deleteRange / merge / mergeUpdate) write
  // their changed rows — tagged with `_change_type` — as a parquet
  // sidecar inside the commit's data area, and the log entry records
  // it ("cdc":"<dir>"). Plain appends need no sidecar (their adds ARE
  // the inserts); layout rewrites (dataChange=false, no cdc) change
  // nothing. [[tableChanges]] then reads the feed for a version range.
  // Capture cost is O(changed rows) extra write per mutating commit —
  // the same contract as Delta's _change_data directory; the sidecar
  // is data-before-log like everything else (written, then published).

  /** Change-type tag column of the feed ('insert', 'delete',
    * 'update_preimage', 'update_postimage'). */
  val ChangeTypeCol = "_change_type"
  /** Commit-version column added by [[tableChanges]]. */
  val CommitVersionCol = "_commit_version"

  private def cdfEnabled(s: SparkSession): Boolean =
    s.conf.getOption("spark.graft.tablelog.cdf").exists(_.toBoolean)

  /** Write a tagged change frame as this commit's CDC sidecar; returns
    * its relative directory. An empty frame still writes (Spark emits
    * a schema-bearing empty file), so "captured but no rows" reads
    * back as zero changes, distinct from "not captured". */
  private def writeCdc(s: SparkSession, root: String,
      changes: DataFrame): Option[String] = {
    if (!cdfEnabled(s)) return None
    val sub = s"data/${UUID.randomUUID()}-cdc"
    changes.write.parquet(s"$root/$sub")
    Some(sub)
  }

  /** The row-level change feed for commits in (sinceVersion, toVersion]
    * (toVersion = -1 → latest): every data column plus
    * [[ChangeTypeCol]] and [[CommitVersionCol]].
    *
    *  - Append commits emit their added rows as 'insert' (derived from
    *    the add list — no sidecar needed or written).
    *  - Mutating commits emit their captured sidecar
    *    ('delete' / 'update_preimage' / 'update_postimage' / 'insert').
    *  - Layout rewrites (dataChange=false, no sidecar) emit nothing —
    *    same rows, new files.
    *  - A row-mutating commit WITHOUT a sidecar (capture was off, or a
    *    restore/overwrite — whose change set is not captured) REFUSES
    *    loudly rather than fabricating an incomplete feed, exactly as
    *    Delta errors when CDF wasn't enabled for the range.
    *
    * Scale: planning is O(#commits in range) driver metadata; data
    * moves only through distributed parquet reads of exactly the
    * added/changed files. */
  def tableChanges(s: SparkSession, root: String, sinceVersion: Int,
      toVersion: Int = -1): DataFrame = {
    val f = fs(s, root)
    val hi = if (toVersion < 0) Int.MaxValue else toVersion
    val range = versions(s, root).filter(v => v > sinceVersion && v <= hi)
    val parts = range.flatMap { v =>
      val json = readText(f, logPath(root, v))
      val adds = parseArr(json, "add")
      val removes = parseArr(json, "remove")
      parseCdc(json) match {
        case Some("") => throw new IllegalStateException(
          s"TableLog: version $v of $root mutated rows with change capture " +
            "off (enable spark.graft.tablelog.cdf before mutating commits)")
        case Some(rel) =>
          val df = s.read.option("mergeSchema", "true").parquet(abs(root, rel))
          Some(df.withColumn(CommitVersionCol, lit(v)))
        case None if !parseDataChange(json) => None // layout: no row changes
        case None if removes.isEmpty && adds.nonEmpty =>
          Some(s.read.option("mergeSchema", "true")
            .parquet(adds.map(rel => abs(root, rel)): _*)
            .withColumn(ChangeTypeCol, lit("insert"))
            .withColumn(CommitVersionCol, lit(v)))
        case None if adds.isEmpty && removes.isEmpty => None // metadata-only
        case None => throw new IllegalStateException(
          s"TableLog: change data not captured for version $v of $root " +
            "(enable spark.graft.tablelog.cdf before mutating commits; " +
            "restore/overwrite feeds are never captured)")
      }
    }
    if (parts.isEmpty) {
      snapshot(s, root).limit(0)
        .withColumn(ChangeTypeCol, lit("insert"))
        .withColumn(CommitVersionCol, lit(0))
    } else {
      val raw = parts.reduce(_.unionByName(_, allowMissingColumns = true))
      // present the feed under the CURRENT declared schema (name
      // mapping included) + the two meta columns — pre-rename change
      // rows must surface under the declared name like any other read
      tableSchema(s, root) match {
        case None => raw
        case Some(decl) => alignDeclared(
          org.apache.spark.sql.types.StructType(decl.fields.toSeq :+
            org.apache.spark.sql.types.StructField(ChangeTypeCol,
              org.apache.spark.sql.types.StringType) :+
            org.apache.spark.sql.types.StructField(CommitVersionCol,
              org.apache.spark.sql.types.IntegerType)), raw)
      }
    }
  }

  /** Per-file [lo, hi] bounds of `column` for the given live state,
    * loaded from the commits' TSV sidecars (None = file has no stats
    * for the column and must always be read). */
  private def bounds(s: SparkSession, root: String,
      state: Seq[(String, Option[String])],
      column: String): Map[String, (Long, Long)] = {
    val f = fs(s, root)
    state.flatMap(_._2).distinct.flatMap { rel =>
      readText(f, new Path(abs(root, rel))).split('\n').filter(_.nonEmpty)
        .map(_.split('\t'))
        .collect { case Array(file, c, mn, mx) if c == column =>
          file -> (mn.toLong, mx.toLong) }
    }.toMap
  }

  /** Live files that can contain a row with `column` in [lo, hi]:
    * stats-pruned when bounds exist, kept when they don't. */
  private def candidateFiles(s: SparkSession, root: String, version: Int,
      column: String, lo: Long, hi: Long): (Seq[String], Seq[String]) = {
    val state = liveState(s, root, version)
    val b = bounds(s, root, state, column)
    state.map(_._1).partition(file =>
      b.get(file).forall { case (mn, mx) => mx >= lo && mn <= hi })
  }

  // ---- bloom-filter file skipping ----------------------------------------
  // Per-file bloom sidecars for POINT lookups — the pruning class
  // min/max stats structurally cannot serve: a hash-distributed or
  // unsorted high-cardinality key gives every file the full [min,max]
  // span, so range stats prune nothing, while a bloom answers "key
  // definitely not in this file" per file. The sidecar
  // (`<commit-dir>/_bloom.tsv`: file \t column \t base64(bitset))
  // lives INSIDE the commit's data directory at a FIXED name, so no
  // log-format or checkpoint change is needed — [[readPoint]] derives
  // each live file's sidecar path from its own. Advisory by
  // construction: a missing/unparsable sidecar (pre-bloom commits,
  // merge/compact rewrites) leaves the file in the always-read class;
  // the exact residual filter always applies, so blooms change
  // planning I/O, never answers. k=5 xxhash64 probes; size via
  // `spark.graft.tablelog.bloom.bits` (default 2^20 bits = 128 KiB per
  // file·column — at ~10 bits/distinct-key that holds ~100k keys per
  // file at <1% false-positive; size it to your file row count).
  // False NEGATIVES are impossible (the writer sets every probed bit
  // of every present key), which is what makes the skip safe. Parquet's
  // own row-group blooms (write option
  // `parquet.bloom.filter.enabled#<col>`) compose WITHIN the files
  // that survive this file-level skip.

  private val BloomK = 5
  private def bloomBits(s: SparkSession): Int =
    s.conf.getOption("spark.graft.tablelog.bloom.bits")
      .map(_.toInt).getOrElse(1 << 20)

  /** Typed bloom-bitset aggregator: input = bit position, buffer =
    * byte-array bitset (reduce sets, merge ORs). */
  private class BloomAgg(mBits: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](mBits / 8)
    def reduce(b: Array[Byte], pos: java.lang.Long): Array[Byte] = {
      val p = pos.longValue().toInt
      b(p >>> 3) = (b(p >>> 3) | (1 << (p & 7))).toByte; b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0; while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** The k probe positions of `value` — same math on both sides:
    * writer as a codegen'd column over (value, seed), reader
    * driver-side via the identical catalyst XxHash64 evaluation. */
  private def bloomPosCol(c: Column, mBits: Int): Seq[Column] =
    (0 until BloomK).map(i => pmod(xxhash64(lit(i), c), lit(mBits.toLong)))

  private def bloomPositions(value: Long, mBits: Int): Seq[Int] =
    (0 until BloomK).map { i =>
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(i),
        org.apache.spark.sql.catalyst.expressions.Literal(value)))
        .eval(null).asInstanceOf[Long]
      val m = h % mBits
      (if (m < 0) m + mBits else m).toInt
    }

  /** One distributed pass building a per-file bloom bitset for each of
    * `bloomCols` (long-valued), written as `_bloom.tsv` inside the
    * commit subdir. O(#files · mBits/8) driver transfer. */
  private def writeBloom(s: SparkSession, root: String, sub: String,
      bloomCols: Seq[String]): Unit = {
    if (bloomCols.isEmpty) return
    val m = bloomBits(s)
    val agg = udaf(new BloomAgg(m))
    val src = s.read.parquet(s"$root/$sub")
    val lines = bloomCols.flatMap { c =>
      val pos = explode(array(bloomPosCol(col(c).cast(LongType), m): _*))
      src.select(input_file_name().as("f"), pos.as("pos"))
        .filter(col("pos").isNotNull) // NULL keys probe nothing
        .groupBy(col("f")).agg(agg(col("pos")).as("bits"))
        .collect().map { r =>
          val file = sub + "/" + r.getString(0).split('/').last
          val b64 = java.util.Base64.getEncoder
            .encodeToString(r.getAs[Array[Byte]]("bits"))
          s"$file\t$c\t$b64"
        }
    }
    val f = fs(s, root)
    val out = f.create(new Path(s"$root/$sub/_bloom.tsv"), false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The bloom bitsets declared for the live `files`, keyed by file —
    * loaded lazily per distinct commit dir (one small TSV read each;
    * dirs without a sidecar contribute nothing). */
  private def bloomIndex(s: SparkSession, root: String,
      files: Seq[String], column: String): Map[String, Array[Byte]] = {
    val f = fs(s, root)
    files.map(_.split('/').dropRight(1).mkString("/")).distinct.flatMap { d =>
      val p = new Path(s"${abs(root, d)}/_bloom.tsv")
      if (!f.exists(p)) Seq.empty
      else readText(f, p).split('\n').filter(_.nonEmpty).map(_.split('\t'))
        .collect { case Array(file, c, b64) if c == column =>
          file -> java.util.Base64.getDecoder.decode(b64) }
    }.toMap
  }

  /** Point lookup with bloom + stats file skipping: opens only live
    * files whose bloom admits `value` (or that have no bloom) AND
    * whose min/max range admits it (or that have no stats), then
    * applies the exact residual filter — both sidecars are advisory,
    * neither can change an answer. The planning payoff on a
    * hash-distributed key: stats prune nothing (every file spans the
    * key range), the bloom prunes to ~1 file + the false-positive
    * tail. */
  def readPoint(s: SparkSession, root: String, column: String,
      value: Long, version: Int = -1): DataFrame = {
    val state = liveState(s, root, version)
    val files = state.map(_._1)
    val blooms = bloomIndex(s, root, files, column)
    // probe positions depend on the bitset size, which may vary across
    // commits (conf change) — memoize per distinct size
    val posFor = mutable.Map.empty[Int, Seq[Int]]
    val rangeOk = bounds(s, root, state, column)
    val keep = files.filter { fl =>
      blooms.get(fl).forall { bits =>
        posFor.getOrElseUpdate(bits.length * 8,
          bloomPositions(value, bits.length * 8))
          .forall(p => (bits(p >>> 3) & (1 << (p & 7))) != 0)
      } &&
      rangeOk.get(fl).forall { case (mn, mx) => value >= mn && value <= mx }
    }
    if (keep.isEmpty) return snapshot(s, root, version).limit(0)
    readAligned(s, root, keep, version, dvState(s, root, version))
      .filter(col(column) === value)
  }

  // ---- hidden partitioning (Iceberg-style per-file partition values) -----

  /** Max distinct partition values recorded per (file, column); a
    * file exceeding it gets NO record — always read, never mis-pruned. */
  private val PvCap = 64

  /** One distributed pass recording each file's DISTINCT values of
    * `partCols`, written as `_pv.tsv` inside the commit subdir
    * (values base64-coded — TSV-safe for arbitrary strings). The
    * Iceberg manifest-entry analogue: the partition "layout" is
    * per-file METADATA, not directory names, so the main read path
    * (snapshot / mergeSchema / DV alignment / rename mapping) is
    * untouched, and files need not be value-pure — pruning QUALITY
    * degrades with file purity, correctness never does. */
  private def writePartValues(s: SparkSession, root: String, sub: String,
      partCols: Seq[String]): Unit = {
    if (partCols.isEmpty) return
    val src = s.read.parquet(s"$root/$sub")
    val lines = partCols.flatMap { c =>
      src.select(input_file_name().as("f"), col(c).cast("string").as("v"))
        .groupBy(col("f"))
        .agg(collect_set(col("v")).as("vs"))
        .collect()                    // O(#files) — driver metadata
        .flatMap { r =>
          val vs = r.getSeq[String](1)
          if (vs.size > PvCap) None   // over cap: no record, always read
          else {
            val file = sub + "/" + r.getString(0).split('/').last
            // an all-NULL file records the EMPTY set — prunable for
            // every probe value (equality never matches NULL)
            val b64 = vs.sorted.map(v => java.util.Base64.getEncoder
              .encodeToString(v.getBytes("UTF-8"))).mkString(",")
            Some(s"$file\t$c\t$b64")
          }
        }
    }
    val out = fs(s, root).create(new Path(s"$root/$sub/_pv.tsv"), false)
    try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The partition-value sets declared for the live `files` on
    * `column`, keyed by file — one small TSV per distinct commit dir,
    * same discovery as [[bloomIndex]]. */
  private def pvIndex(s: SparkSession, root: String,
      files: Seq[String], column: String): Map[String, Set[String]] = {
    val f = fs(s, root)
    files.map(_.split('/').dropRight(1).mkString("/")).distinct.flatMap { d =>
      val p = new Path(s"${abs(root, d)}/_pv.tsv")
      if (!f.exists(p)) Seq.empty
      else readText(f, p).split('\n').filter(_.nonEmpty)
        .map(_.split("\t", -1))
        .collect { case Array(file, c, b64) if c == column =>
          file -> b64.split(',').filter(_.nonEmpty).map(v =>
            new String(java.util.Base64.getDecoder.decode(v), "UTF-8")).toSet }
    }.toMap
  }

  /** Append with hidden partitioning (Iceberg-style): rows are
    * repartitioned by `partCols` so data files are (typically)
    * value-pure, and each file's distinct partition values are logged
    * as a `_pv.tsv` sidecar; [[readPartition]] then plans its file
    * list from metadata alone. Unlike Hive directory layout the
    * partition columns STAY in the data files — nothing to
    * reconstruct from paths, and every existing read/mutate path
    * (snapshot, time travel, CDF, DVs, rename alignment, compaction)
    * works unchanged; a compaction that mixes values merely costs the
    * pruning until the next partitioned write. At 100 TB the payoff
    * is Hive-partition-shaped planning — O(matching files) — without
    * the small-file explosion a high-cardinality directory layout
    * forces: the cap-and-skip rule keeps manifests bounded and the
    * writer free to bin-pack. */
  def appendPartitioned(s: SparkSession, root: String, df: DataFrame,
      partCols: Seq[String], statsCols: Seq[String] = Nil): Int = {
    // EXPLICIT partition count: a bare repartition(cols) is an AQE
    // coalesce target, and a small commit collapses to ONE mixed-value
    // file — pruning stays correct but prunes nothing. Pinning the
    // count keeps files value-pure up to hash collisions.
    val p = s.sessionState.conf.numShufflePartitions
    val (sub, files) =
      writeData(s, root, df.repartition(p, partCols.map(col): _*))
    writePartValues(s, root, sub, partCols)
    publishOrClean(s, root, Seq(sub)) {
      publish(s, root, files, Seq.empty, writeStats(s, root, sub, statsCols),
        schema = Some(df.schema))
    }
  }

  /** The file list [[readPartition]] would open for (`column` =
    * `value`) — planning introspection (Delta `inputFiles` analogue),
    * and the hook tests use to prove pruned-out files are never
    * touched. Paths relative to `root`. */
  def readPartitionFiles(s: SparkSession, root: String, column: String,
      value: String, version: Int = -1): Seq[String] = {
    val files = liveState(s, root, version).map(_._1)
    val pv = pvIndex(s, root, files, column)
    files.filter(fl => pv.get(fl).forall(_.contains(value)))
  }

  /** Exact-match partitioned read: opens only live files whose logged
    * partition-value set contains `value` (files without a record are
    * always read), then applies the residual filter — the sidecar is
    * advisory, like stats and blooms: it can change the FILE LIST,
    * never an answer. */
  def readPartition(s: SparkSession, root: String, column: String,
      value: String, version: Int = -1): DataFrame = {
    val keep = readPartitionFiles(s, root, column, value, version)
    if (keep.isEmpty) return snapshot(s, root, version).limit(0)
    readAligned(s, root, keep, version, dvState(s, root, version))
      .filter(col(column) === value)
  }

  /** Range read with metadata-level file skipping: opens only files
    * whose logged [min, max] intersects [lo, hi] (plus any file
    * without stats), then applies the exact residual filter — stats
    * affect planning, never the answer. */
  def readRange(s: SparkSession, root: String, column: String,
      lo: Long, hi: Long, version: Int = -1): DataFrame = {
    val (keep, _) = candidateFiles(s, root, version, column, lo, hi)
    // stats may prune every live file — an empty path list would make
    // the reader throw instead of returning zero rows
    if (keep.isEmpty) return snapshot(s, root, version).limit(0)
    // snapshot contract (mergeSchema + DV filter + declared-name
    // mapping): a pruned read must neither resurrect vector-deleted
    // rows nor lose pre-rename rows to a null declared column
    readAligned(s, root, keep, version, dvState(s, root, version))
      .filter(col(column) >= lo && col(column) <= hi)
  }

  /** Box read over TWO stats columns — the z-order payoff: a file
    * survives only if BOTH its logged ranges intersect the box, so a
    * z-ordered (Morton-clustered) layout prunes on either dimension
    * alone or both together, where a single-column sort helps only
    * its own column. Residual filters applied as always. */
  def readBox(s: SparkSession, root: String,
      c1: String, lo1: Long, hi1: Long,
      c2: String, lo2: Long, hi2: Long, version: Int = -1): DataFrame = {
    val state = liveState(s, root, version)
    val b1 = bounds(s, root, state, c1)
    val b2 = bounds(s, root, state, c2)
    val keep = state.map(_._1).filter { file =>
      b1.get(file).forall { case (mn, mx) => mx >= lo1 && mn <= hi1 } &&
      b2.get(file).forall { case (mn, mx) => mx >= lo2 && mn <= hi2 }
    }
    if (keep.isEmpty) return snapshot(s, root, version).limit(0)
    readAligned(s, root, keep, version, dvState(s, root, version))
      .filter(col(c1) >= lo1 && col(c1) <= hi1 &&
        col(c2) >= lo2 && col(c2) <= hi2)
  }

  /** Delete every row with `column` in [lo, hi], rewriting ONLY the
    * files whose stats admit a match; the swap publishes as one
    * commit and untouched files keep their identity and stats.
    * Returns the committed version. */
  def deleteRange(s: SparkSession, root: String, column: String,
      lo: Long, hi: Long): Int = {
    val (touched, _) = candidateFiles(s, root, -1, column, lo, hi)
    require(touched.nonEmpty, "deleteRange: nothing to delete")
    // DV-filtered: rewriting a touched file must not resurrect its
    // vector-deleted rows (the survivors land in fresh files the
    // vectors don't name); untouched files keep their DV entries live.
    // The state is captured ONCE and CAS-revalidated at publish — a
    // deleteVector landing mid-rewrite aborts this commit, never loses
    val dv0 = dvState(s, root, -1)
    val src = readAligned(s, root, touched, -1, dv0)
    val survivors = src
      // NULL in the delete column is inside neither range nor its
      // negation — keep such rows explicitly, or every rewritten
      // file (including stats-less ones, always rewritten) would
      // silently drop them: data loss beyond the requested range
      .filter(col(column).isNull ||
        !(col(column) >= lo && col(column) <= hi))
    // CDF: the deleted rows (the range complement of the survivors)
    // are the feed — captured before the log entry that removes them.
    // With capture OFF, record the EMPTY sentinel: a delete commit is
    // otherwise indistinguishable from a layout rewrite (both publish
    // dataChange=false), and the feed must refuse, not silently skip
    // sidecar + data rewrite overlap: independent outputs (par2)
    val ((sub, files), cdc) = par2(
      writeData(s, root, survivors),
      writeCdc(s, root, src
        .filter(col(column) >= lo && col(column) <= hi)
        .withColumn(ChangeTypeCol, lit("delete")))
        .orElse(Some("")))
    publishOrClean(s, root, sub +: cdc.toSeq) {
      publish(s, root, files, touched,
        writeStats(s, root, sub, Seq(column)), dataChange = false, cdc = cdc,
        expectDvs = Some(dv0))
    }
  }

  /** DELETE WHERE `predicate` without rewriting ANY data file — the
    * deletion-vector form (Delta DV / Iceberg positional-delete
    * parity). The matching rows' (file key, `_metadata.row_index`)
    * pairs are written as a parquet sidecar (O(deleted rows) bytes,
    * distributed write) and ONE metadata commit appends it to the
    * active-vector list; every data file keeps its identity, bytes,
    * and stats. Reads anti-join the vectors (see [[applyDv]]); a later
    * [[compact]]/[[rewrite]] materializes and clears them. Pre-delete
    * versions remain time-travelable (the vectors are versioned state,
    * not file mutations).
    *
    * Why it matters at scale: deleting 0.1% of a 100 TB table by
    * rewrite copies ~100 TB; by vector it appends kilobytes and defers
    * the copy to the next scheduled compaction. The trade is read-side
    * work — one broadcast anti-join per scan while vectors are active.
    *
    * Publish CAS-revalidates that BOTH the live-file set and the DV
    * state still equal what this delete computed against — a
    * concurrent compact/merge/delete aborts one side loudly instead of
    * silently losing rows (same posture as the remove-set check).
    * Already-vector-deleted rows are excluded from the read, so
    * re-deleting an overlapping predicate records only the NEW rows
    * and the CDF feed never double-reports a delete. Requires at least
    * one matching row (like [[deleteRange]]). Returns the version. */
  /** Alive rows of `files` keyed by (_g_file, _g_pos) and presented
    * under the DECLARED schema — the shared scan preamble of
    * [[deleteVector]] and [[update]]: key FIRST (metadata columns
    * resolve only on the scan itself), then drop already-vector-
    * deleted rows, then the declared-name mapping (a predicate names
    * declared columns and a pre-rename file must still match).
    * [[readUnion]], not mergeSchema — the live set may span a
    * type-widening boundary, whose narrow+wide physical generations
    * mergeSchema refuses to merge. */
  private def alignedAliveScan(s: SparkSession, root: String,
      files: Seq[String], dv0: Seq[String]): DataFrame = {
    val decl = tableSchema(s, root)
    val raw = readUnion(s, files.map(rel => abs(root, rel)), decl)
    val keyed = raw
      .withColumn("_g_file", fileKey(col("_metadata.file_path")))
      .withColumn("_g_pos", col("_metadata.row_index"))
    val alive = if (dv0.isEmpty) keyed
      else keyed.join(dvJoinFrame(s, root, dv0),
        col("_g_file") === col("_g_dv_file") &&
          col("_g_pos") === col("_g_dv_pos"), "left_anti")
    decl match {
      case None => alive
      case Some(d) =>
        alignDeclared(d, alive, Seq(col("_g_file"), col("_g_pos")))
    }
  }

  def deleteVector(s: SparkSession, root: String, predicate: Column): Int = {
    val dv0 = dvState(s, root, -1)
    val files = liveFiles(s, root, -1)
    // zero live files: SQL DELETE on an empty table is a no-op, not
    // an error (the log must exist — no versions is still an error)
    if (files.isEmpty) return versions(s, root).lastOption.getOrElse(
      throw new IllegalStateException(s"deleteVector: no table at $root"))
    val aligned = alignedAliveScan(s, root, files, dv0)
    val dataCols = aligned.columns.toSeq
      .filterNot(Set("_g_file", "_g_pos")).map(col)
    val matched = aligned.filter(predicate).cache()
    try {
      // zero matched rows: a DELETE whose predicate hits nothing is a
      // successful no-op (Delta/SQL semantics) — no commit, current
      // version returned
      if (matched.limit(1).count() == 0)
        return versions(s, root).lastOption.getOrElse(-1)
      val dvSub = s"data/${UUID.randomUUID()}-dv"
      // DV sidecar + CDF sidecar overlap: independent outputs, both
      // off the cached `matched` frame (par2). CDF keeps the
      // deleteRange contract — captured sidecar with the feed on, the
      // EMPTY sentinel (refuse-at-read) with it off.
      val (_, cdc) = par2(
        matched.select(col("_g_file").as("file"), col("_g_pos").as("pos"))
          .write.parquet(s"$root/$dvSub"),
        writeCdc(s, root, matched.select(dataCols: _*)
          .withColumn(ChangeTypeCol, lit("delete")))
          .orElse(Some("")))
      publishOrClean(s, root, dvSub +: cdc.toSeq) {
        publish(s, root, Seq.empty, Seq.empty, dataChange = true, cdc = cdc,
          dvs = Some(dv0 :+ dvSub), expectFiles = Some(files.toSet),
          expectDvs = Some(dv0))
      }
    } finally matched.unpersist()
  }

  /** UPDATE … SET … WHERE (Delta UPDATE parity): rewrite ONLY the
    * files containing at least one matching alive row; every other
    * file keeps its identity, bytes, and stats. File targeting is
    * predicate-EXACT — one distributed pass marks each matching row
    * with its `_metadata` file identity and the distinct file keys
    * come back as O(#files) driver metadata — where min/max stats
    * could only approximate an arbitrary predicate (and would still
    * be consulted by the scan below them). The touched files are
    * re-read under the captured DV state (rewriting must not
    * resurrect vector-deleted rows), SET applies where the predicate
    * holds, and the swap publishes as ONE commit whose remove set and
    * expectDvs CAS-revalidate at publish — a racing delete/compact
    * aborts one side loudly. CDF records update_preimage/postimage
    * pairs for the matched rows (the MERGE contract). Requires at
    * least one matching row. Returns the committed version.
    *
    * 100 TB shape: write amplification is |touched files|, not
    * |table| — an UPDATE hitting 0.1% of a clustered table rewrites
    * ~0.1% of its files; the scan that finds them is one full read
    * of the predicate columns only (column-pruned). */
  def update(s: SparkSession, root: String, predicate: Column,
      set: Map[String, Column], statsCols: Seq[String] = Nil): Int = {
    require(set.nonEmpty, "update: empty SET clause")
    val dv0 = dvState(s, root, -1)
    val files = liveFiles(s, root, -1)
    if (files.isEmpty) return versions(s, root).lastOption.getOrElse(
      throw new IllegalStateException(s"update: no table at $root"))
    val aligned = alignedAliveScan(s, root, files, dv0)
    val touched = aligned.filter(predicate)
      .select(col("_g_file")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted // O(#files) metadata
    // zero matched rows: SQL UPDATE semantics — successful no-op
    if (touched.isEmpty) return versions(s, root).lastOption.getOrElse(-1)
    val src = readAligned(s, root, touched, -1, dv0)
    val unknown = set.keySet -- src.columns.toSet
    require(unknown.isEmpty,
      s"update: SET names unknown column(s) ${unknown.mkString(", ")}")
    // hit flag materializes BEFORE any SET applies: a SET that
    // rewrites a predicate column (SET x = 0 WHERE x > 5) must still
    // report its postimages
    val flagged = src.withColumn("__g_hit", predicate)
    val hit = col("__g_hit")
    // ONE projection, never chained withColumn: every SET right-hand
    // side must evaluate against the row PREIMAGE (SQL UPDATE
    // semantics — SET a = b, b = a swaps), where sequential
    // withColumn would feed later assignments the already-updated
    // values in Map-iteration order
    val updated = flagged.select(flagged.columns.toSeq.map { c =>
      set.get(c) match {
        case Some(e) => when(hit, e).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    val outCols = src.columns.map(col).toSeq
    // sidecar + data rewrite overlap: independent outputs (par2)
    val ((sub, outFiles), cdc) = par2(
      writeData(s, root, updated.select(outCols: _*)),
      writeCdc(s, root,
        flagged.filter(hit).select(outCols: _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(updated.filter(hit).select(outCols: _*)
            .withColumn(ChangeTypeCol, lit("update_postimage"))))
        .orElse(Some("")))
    publishOrClean(s, root, sub +: cdc.toSeq) {
      publish(s, root, outFiles, touched,
        writeStats(s, root, sub, statsCols), cdc = cdc,
        expectDvs = Some(dv0))
    }
  }

  /** MERGE (upsert-by-key): every target row whose `keyCol` appears
    * in `source` is REPLACED by the source row (all columns), and
    * source rows with new keys are INSERTED — one atomic commit.
    *
    * Scale shape: file selection is PER-FILE EXACT — one distributed
    * semi-join of the source keys against the broadcast per-file
    * [min,max] ranges from the log stats — so an INSERT-heavy source
    * (fresh keys outside every file's range) rewrites nothing it
    * doesn't have to; a global source bounding box would smear
    * updates and inserts together and touch everything in between.
    * Touched files are rewritten with a LEFT ANTI join against the
    * source keys (drop matched, keep the rest) and the source unioned
    * in; the key set is broadcast while it fits
    * (`spark.graft.merge.broadcastMaxKeys`, default 1M keys) and
    * falls back to a shuffle anti-join for bulk backfill sources —
    * only the O(#files) range frame is unconditionally broadcast.
    * Every other file keeps its identity, stats, and bytes. Files without stats for `keyCol` are always
    * rewritten (the no-stats always-read class — never a correctness
    * risk, only write amplification). Duplicate or NULL keys in the
    * SOURCE are rejected (one deterministic winner per key);
    * duplicate keys in the target simply all get replaced. Returns
    * the committed version. */
  def merge(s: SparkSession, root: String, source: DataFrame,
      keyCol: String, statsCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.broadcast
    val src = source.cache()
    try {
      val (touched, smallSrc) = mergeTouched(s, root, src, keyCol)
      val dv0 = dvState(s, root, -1)
      val keys = src.select(col(keyCol))
      val tgt =
        if (touched.isEmpty) src.limit(0)
        else readAligned(s, root, touched, -1, dv0)
      val kept =
        if (touched.isEmpty) src.limit(0)
        else if (smallSrc) tgt.join(broadcast(keys), Seq(keyCol), "left_anti")
        else tgt.join(keys, Seq(keyCol), "left_anti")
      // CDF: matched keys can only live in touched files (stats-exact
      // selection), so `tgt` is the complete preimage universe —
      // replaced target rows are the update preimages, their source
      // counterparts the postimages, and fresh-key source rows inserts
      val changes = if (!cdfEnabled(s)) None else {
        val tgtKeys = tgt.select(col(keyCol))
        val pre = tgt.join(if (smallSrc) broadcast(keys) else keys,
          Seq(keyCol), "left_semi")
          .withColumn(ChangeTypeCol, lit("update_preimage"))
        val post = src.join(tgtKeys, Seq(keyCol), "left_semi")
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        val ins = src.join(tgtKeys, Seq(keyCol), "left_anti")
          .withColumn(ChangeTypeCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(ins))
      }
      // sidecar + data rewrite overlap: independent outputs (par2)
      val ((sub, files), cdc) = par2(
        writeData(s, root, kept.unionByName(src)),
        changes.flatMap(writeCdc(s, root, _)))
      publishOrClean(s, root, sub +: cdc.toSeq) {
        publish(s, root, files, touched, writeStats(s, root, sub, statsCols),
          cdc = cdc, expectDvs = Some(dv0))
      }
    } finally src.unpersist()
  }

  /** Shared MERGE front half: validate the source (no NULL, no
    * duplicate keys), then pick the files to rewrite PER-FILE EXACTLY
    * — a distributed semi-join of source keys against the broadcast
    * per-file [min,max] ranges — plus the stats-less always-rewrite
    * class. Also decides whether the source key set is small enough
    * to broadcast in the rewrite joins
    * (`spark.graft.merge.broadcastMaxKeys`, default 1M): the O(#files)
    * range frame is always broadcast, but a bulk backfill source must
    * fall back to shuffle joins instead of OOMing the driver. */
  /** Shared MERGE source guard: no NULL keys, no duplicate keys;
    * returns whether the key set fits the broadcast budget. Split out
    * of [[mergeTouched]] because [[mergeFull]] needs the guard but
    * NOT the per-file selection (BY SOURCE touches every file — the
    * selection job's result would be computed and thrown away). */
  private def mergeSrcGuard(s: SparkSession, src: DataFrame,
      keyCol: String): Boolean = {
    // ONE validation pass: the null probe, the duplicate group-scan
    // and the broadcast-budget count each re-ran the source as a
    // separate action; a single aggregate answers all three.
    // count_distinct ignores NULL keys, so the duplicate arithmetic
    // (rows == distinct keys) is exact once the null gate passes —
    // and the null gate throws first, preserving message precedence.
    val r = src.agg(
      count(lit(1)).as("n"),
      count(when(col(keyCol).isNull, lit(1))).as("nulls"), // count: never NULL on empty src
      count_distinct(col(keyCol)).as("nd")).head()
    require(r.getAs[Long]("nulls") == 0L,
      s"merge: NULL $keyCol values in source")
    require(r.getAs[Long]("n") == r.getAs[Long]("nd"),
      s"merge: duplicate $keyCol values in source")
    val bcastMaxKeys =
      s.conf.getOption("spark.graft.merge.broadcastMaxKeys")
        .map(_.toLong).getOrElse(1000000L)
    r.getAs[Long]("n") <= bcastMaxKeys
  }

  private def mergeTouched(s: SparkSession, root: String, src: DataFrame,
      keyCol: String): (Seq[String], Boolean) = {
    import org.apache.spark.sql.functions.broadcast
    val smallSrc = mergeSrcGuard(s, src, keyCol)
    val state = liveState(s, root, -1)
    val b = bounds(s, root, state, keyCol)
    val (withStats, noStats) = state.map(_._1).partition(b.contains)
    val ranges = s.createDataFrame(
      java.util.Arrays.asList(withStats.map(fl =>
        org.apache.spark.sql.Row(fl, b(fl)._1, b(fl)._2)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("mn", LongType),
        org.apache.spark.sql.types.StructField("mx", LongType))))
    val matched = src.select(col(keyCol).cast(LongType).as("k"))
      .join(broadcast(ranges), col("k") >= col("mn") && col("k") <= col("mx"))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet   // O(#files) driver metadata
    val noStatsSet = noStats.toSet          // Seq.contains would be O(F²)
    val touched = state.map(_._1).filter(fl =>
      matched.contains(fl) || noStatsSet.contains(fl))
    (touched, smallSrc)
  }

  /** MERGE, conditional-update form (Delta parity:
    * `WHEN MATCHED AND <cond> THEN UPDATE SET c = expr, ...` +
    * optional `WHEN NOT MATCHED THEN INSERT *`):
    *
    *  - Target rows join the source by `keyCol`; inside `cond` and the
    *    `set` expressions, target columns appear under their own names
    *    and source columns under a `src_` prefix (e.g.
    *    `col("src_price") > col("price")`).
    *  - A matched target row satisfying `cond` gets EXACTLY the `set`
    *    columns replaced; all other columns — and matched rows failing
    *    `cond` — keep their target values (this is the column-level
    *    update [[merge]]'s replace-whole-row form cannot express).
    *  - Source rows whose key matches nothing are inserted wholesale
    *    when `insertUnmatched` (aligned by name), else dropped.
    *
    * File selection, rewrite confinement, and the broadcast-vs-shuffle
    * source threshold are identical to [[merge]] ([[mergeTouched]]);
    * matched keys can only live in touched files (stats-exact
    * selection), so the unmatched-insert anti-join needs only the
    * touched files' keys. One atomic commit; returns the version. */
  /** Unknown SET names refuse loudly — `set.get(c)` against the
    * joined frame would otherwise silently no-op a misspelled or
    * alias-qualified assignment (the lost update nobody notices). */
  private def requireSetColumns(s: SparkSession, root: String,
      set: Map[String, Column]): Unit = {
    val cols = tableSchema(s, root).map(_.fieldNames.toSeq)
      .getOrElse(snapshot(s, root).columns.toSeq).toSet
    val unknown = set.keySet -- cols
    require(unknown.isEmpty,
      s"merge: SET names unknown target column(s) ${unknown.mkString(", ")}")
  }

  def mergeUpdate(s: SparkSession, root: String, source: DataFrame,
      keyCol: String, cond: Column, set: Map[String, Column],
      insertUnmatched: Boolean = true, statsCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.broadcast
    requireSetColumns(s, root, set)
    val src = source.cache()
    try {
      val (touched, smallSrc) = mergeTouched(s, root, src, keyCol)
      val dv0 = dvState(s, root, -1)
      val srcPref = src.columns.foldLeft(src)((d, c) =>
        d.withColumnRenamed(c, s"src_$c"))
      def maybeBcast(df: DataFrame) = if (smallSrc) broadcast(df) else df
      val (kept, cdc) =
        if (touched.isEmpty) {
          // no file can contain a matched key (stats-exact selection),
          // so EVERY source row is unmatched: insert them all (or none)
          val ins = if (insertUnmatched) src else src.limit(0)
          (ins, if (!cdfEnabled(s)) None
            else Some(ins.withColumn(ChangeTypeCol, lit("insert"))))
        } else {
          val tgt = readAligned(s, root, touched, -1, dv0)
          // the clause flag is materialized BEFORE any SET applies:
          // a condition referencing a SET column must see the TARGET
          // value, not the half-updated frame (and every SET column
          // must see the same verdict)
          val joined = tgt.join(maybeBcast(srcPref),
            tgt(keyCol) === srcPref(s"src_$keyCol"), "left")
            .withColumn("__hit", col(s"src_$keyCol").isNotNull && cond)
          val hit = col("__hit")
          // one projection: every SET right-hand side evaluates
          // against the row PREIMAGE (chained withColumn would feed
          // later assignments already-updated values)
          val updated = joined.select(joined.columns.toSeq.map { c =>
            set.get(c) match {
              case Some(e) => when(hit, e).otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
          // right side here is the TARGET keys (not the source), so
          // the smallSrc guard doesn't apply — leave the strategy to
          // AQE, which sizes the touched-file key set at runtime
          val tgtCols = tgt.columns.map(col).toSeq
          // no-INSERT merges take an empty TARGET-schema frame: the
          // source may legitimately be narrower than the target (an
          // update-only merge), and src.limit(0) would poison the
          // union with the source's schema
          val inserts =
            if (!insertUnmatched) tgt.select(tgtCols: _*).limit(0)
            else src.join(tgt.select(col(keyCol)), Seq(keyCol), "left_anti")
          // CDF: only predicate-passing matches are updates — rows the
          // condition leaves untouched are NOT changes; preimages come
          // from the joined frame pre-SET, postimages post-SET
          val changes = if (!cdfEnabled(s)) None else Some(
            joined.filter(hit).select(tgtCols: _*)
              .withColumn(ChangeTypeCol, lit("update_preimage"))
              .unionByName(updated.filter(hit).select(tgtCols: _*)
                .withColumn(ChangeTypeCol, lit("update_postimage")))
              .unionByName(inserts.withColumn(ChangeTypeCol, lit("insert"))))
          (updated.select(tgtCols: _*).unionByName(inserts), changes)
        }
      // sidecar + data rewrite overlap: independent outputs (par2)
      val ((sub, files), cdcRes) = par2(
        writeData(s, root, kept),
        cdc.flatMap(writeCdc(s, root, _)))
      publishOrClean(s, root, sub +: cdcRes.toSeq) {
        publish(s, root, files, touched, writeStats(s, root, sub, statsCols),
          cdc = cdcRes, expectDvs = Some(dv0))
      }
    } finally src.unpersist()
  }

  /** MERGE, full three-clause form (Delta >= 2.4 parity) — adds
    * `WHEN NOT MATCHED BY SOURCE [AND <bySourceCond>] THEN DELETE`
    * to [[mergeUpdate]]'s matched-update + unmatched-insert clauses:
    * target rows whose key appears in NO source row and that satisfy
    * `bySourceCond` (target columns only) are deleted; everything
    * else follows [[mergeUpdate]] exactly.
    *
    * File selection is where this clause differs fundamentally:
    * "key NOT IN source" is true of almost every row of almost every
    * file, so per-file stats CANNOT prune — the rewrite must touch
    * EVERY live file (Delta pays the same; its docs call the clause
    * out as a full-table operation). That cost is the honest
    * semantics; the stats-exact confinement of [[merge]]/
    * [[mergeUpdate]] remains the right tool when the clause isn't
    * needed. One atomic commit; returns the version. */
  def mergeFull(s: SparkSession, root: String, source: DataFrame,
      keyCol: String, cond: Column, set: Map[String, Column],
      bySourceCond: Column, insertUnmatched: Boolean = true,
      statsCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.broadcast
    requireSetColumns(s, root, set)
    val src = source.cache()
    try {
      val smallSrc = mergeSrcGuard(s, src, keyCol)
      val touched = liveFiles(s, root, -1) // BY SOURCE can hit any file
      val dv0 = dvState(s, root, -1)
      val srcPref = src.columns.foldLeft(src)((d, c) =>
        d.withColumnRenamed(c, s"src_$c"))
      def maybeBcast(df: DataFrame) = if (smallSrc) broadcast(df) else df
      val tgt = readAligned(s, root, touched, -1, dv0)
      // clause flags materialize BEFORE any SET applies — conditions
      // must see TARGET values, not the half-updated frame
      val joined = tgt.join(maybeBcast(srcPref),
        tgt(keyCol) === srcPref(s"src_$keyCol"), "left")
        .withColumn("__hit", col(s"src_$keyCol").isNotNull && cond)
        // SQL MERGE deletes only on a definitive TRUE: a NULL
        // bySourceCond row is kept (filter(!NULL) would silently drop
        // it AND omit it from the CDF — the deleteRange NULL contract)
        .withColumn("__doomed",
          coalesce(col(s"src_$keyCol").isNull && bySourceCond, lit(false)))
      val hit = col("__hit")
      val doomed = col("__doomed")
      // one projection — preimage semantics for every SET RHS (see
      // [[update]])
      val updated = joined.select(joined.columns.toSeq.map { c =>
        set.get(c) match {
          case Some(e) => when(hit, e).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }: _*)
      val tgtCols = tgt.columns.map(col).toSeq
      // no-INSERT merges take an empty TARGET-schema frame (an
      // update-only merge's source may be narrower than the target)
      val inserts =
        if (!insertUnmatched) tgt.select(tgtCols: _*).limit(0)
        else src.join(tgt.select(col(keyCol)), Seq(keyCol), "left_anti")
      val kept = updated.filter(!doomed).select(tgtCols: _*)
        .unionByName(inserts)
      val changes = if (!cdfEnabled(s)) None else Some(
        joined.filter(hit).select(tgtCols: _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(updated.filter(hit).select(tgtCols: _*)
            .withColumn(ChangeTypeCol, lit("update_postimage")))
          .unionByName(joined.filter(doomed).select(tgtCols: _*)
            .withColumn(ChangeTypeCol, lit("delete")))
          .unionByName(inserts.withColumn(ChangeTypeCol, lit("insert"))))
      // sidecar + data rewrite overlap: independent outputs (par2).
      // A row-deleting commit without capture must record the empty
      // sentinel so feeds refuse instead of mistaking it for an
      // ordinary merge (same contract as deleteRange).
      val ((sub, files), cdc) = par2(
        writeData(s, root, kept),
        changes.flatMap(writeCdc(s, root, _)).orElse(Some("")))
      publishOrClean(s, root, sub +: cdc.toSeq) {
        publish(s, root, files, touched, writeStats(s, root, sub, statsCols),
          cdc = cdc, expectDvs = Some(dv0))
      }
    } finally src.unpersist()
  }

  /** Replace the live set with whatever `write` produces into the
    * fresh directory it is handed — the general layout-rewrite commit
    * (compaction, z-ordering, re-sorting): same rows, new physical
    * organization, published atomically with dataChange=false and
    * fresh per-file stats for `statsCols`.
    *
    * Contract: `write` must materialize the rows of the CURRENT
    * snapshot (all callers read through [[snapshot]], which applies
    * active deletion vectors) — so a rewrite MATERIALIZES pending DV
    * deletes and clears the vector state. `expectDvs` should be the DV
    * state as of the caller's snapshot read (defaults to the state at
    * entry); publish CAS-revalidates it so a deleteVector racing the
    * rewrite aborts one side instead of losing the delete. */
  def rewrite(s: SparkSession, root: String, statsCols: Seq[String] = Nil,
      expectDvs: Option[Seq[String]] = None,
      base: Option[Seq[String]] = None)(
      write: String => Unit): Int = {
    val dv0 = expectDvs.getOrElse(dvState(s, root, -1))
    // base = the file list the caller's snapshot was RESOLVED against.
    // Callers materializing a pre-read frame MUST pass it ([[pinSnapshot]]):
    // re-resolving here would race a commit landing between the
    // caller's snapshot and this call — the newcomer's file would
    // join the remove set without its rows joining the rewrite, a
    // silent lost update (caught by the TableLogSpec CAS storm fuzz).
    val old = base.getOrElse(liveFiles(s, root, -1))
    val sub = s"data/${UUID.randomUUID()}"
    write(s"$root/$sub")
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$sub/$n").toSeq
    publishOrClean(s, root, Seq(sub)) {
      publish(s, root, files, old, writeStats(s, root, sub, statsCols),
        dataChange = false, dvs = Some(Seq.empty), expectDvs = Some(dv0))
    }
  }

  /** Pin the current snapshot for a layout rewrite: DV state and live
    * file list resolved ONCE, and the returned frame reads EXACTLY
    * those files under those vectors — so the (files, dvs) pair can
    * ride into [[rewrite]]'s remove set and CAS revalidation as the
    * precise state the rows were computed from. A commit landing
    * after this pin either leaves the pinned files live (add-only —
    * its rows survive the swap untouched) or invalidates the pin at
    * publish time (remove/DV change — ConcurrentModificationException,
    * retryable). */
  def pinSnapshot(s: SparkSession, root: String)
      : (Seq[String], Seq[String], DataFrame) = {
    val dv0 = dvState(s, root, -1)
    val old = liveFiles(s, root, -1)
    (old, dv0, readAligned(s, root, old, -1, dv0))
  }

  /** Rewrite the live set into `numFiles` files and publish the swap
    * as one atomic commit. Old snapshots keep reading the old files. */
  def compact(s: SparkSession, root: String, numFiles: Int,
      statsCols: Seq[String] = Nil): Int = {
    val (old, dv0, snap) = pinSnapshot(s, root)
    rewrite(s, root, statsCols, expectDvs = Some(dv0), base = Some(old))(
      dir => snap.coalesce(numFiles).write.parquet(dir))
  }

  /** RESTORE parity: make the live set equal what it was at `version`
    * by publishing ONE commit (add = files live then but not now,
    * remove = files live now but not then). History is preserved — the
    * restore is itself a new version, the undone commits remain
    * time-travelable, and a racing writer conflicts through the normal
    * remove-set CAS validation. Fails if `version`'s files were
    * vacuumed. Re-added files rejoin the no-stats always-read class
    * (a commit carries one stats sidecar; the originals' sidecars
    * stay with their own commits) — pruning weakens until the next
    * stats-bearing rewrite, answers never change. Returns the
    * committed version. */
  def restore(s: SparkSession, root: String, version: Int): Int = {
    val f = fs(s, root)
    val then_ = liveFiles(s, root, version)
    then_.foreach(rel => require(f.exists(new Path(abs(root, rel))),
      s"restore: $rel was vacuumed; version $version is not restorable"))
    // the deletion-vector state restores with the file set — a restore
    // across a deleteVector resurrects its rows, a restore across a
    // materializing compact re-applies the then-active vectors
    val thenDvs = dvState(s, root, version)
    thenDvs.foreach(d => require(f.exists(new Path(abs(root, d))),
      s"restore: deletion vector $d was vacuumed; " +
        s"version $version is not restorable"))
    val now = liveFiles(s, root, -1)
    val nowSet = now.toSet
    val thenSet = then_.toSet
    publish(s, root, then_.filterNot(nowSet), now.filterNot(thenSet),
      dataChange = true, dvs = Some(thenDvs))
  }

  /** Commit history as a DataFrame — `DESCRIBE HISTORY` parity:
    * (version, n_add, n_remove, data_change, txn_app, txn_version)
    * per commit, ascending. Driver-side log metadata (O(#commits)),
    * surfaced relationally so audits compose with the query engine. */
  def history(s: SparkSession, root: String): DataFrame = {
    val f = fs(s, root)
    val rows = versions(s, root).map { v =>
      val json = readText(f, logPath(root, v))
      val txn = parseTxn(json)
      org.apache.spark.sql.Row(v, parseArr(json, "add").size,
        parseArr(json, "remove").size, parseDataChange(json),
        txn.map(_._1).orNull,
        txn.map(t => java.lang.Long.valueOf(t._2)).orNull)
    }
    import org.apache.spark.sql.types._
    s.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("n_add", IntegerType, nullable = false),
      StructField("n_remove", IntegerType, nullable = false),
      StructField("data_change", BooleanType, nullable = false),
      StructField("txn_app", StringType),
      StructField("txn_version", LongType))))
  }

  /** Shallow CLONE (Delta parity): start a NEW log at `dstRoot` whose
    * first commit references the source's current live files BY
    * ABSOLUTE PATH — zero data bytes copied, O(#files) metadata only.
    * The clone then evolves independently: appends/merges/deletes on
    * either side never touch the other (the referenced files are
    * immutable by the log contract — mutation always writes NEW
    * files). Carried over: the per-file min/max stats (remapped into
    * one dst-local sidecar, so stats pruning keeps working), the
    * declared schema, and the active deletion vectors (also by
    * absolute path). NOT carried: CHECK constraints and txn
    * watermarks (a clone is a new table, not a continuation of the
    * writer's exactly-once stream). [[vacuum]] on either side never
    * reclaims external (absolute-path) references — but the same
    * Delta caveat applies: a vacuum on the SOURCE that drops files
    * the clone still references breaks the clone. Retain source
    * history for the clone's lifetime, or compact the clone (which
    * rewrites it onto its own files) to sever the dependency.
    *
    * Why it matters at scale: CLONE is the zero-cost test/dev branch
    * of a 100 TB table — experiment with deletes, schema evolution,
    * or OPTIMIZE on the clone; throw it away or compact it into
    * independence. Returns the clone's first committed version (0). */
  def shallowClone(s: SparkSession, srcRoot: String, dstRoot: String): Int = {
    require(versions(s, dstRoot).isEmpty,
      s"shallowClone: $dstRoot already has a log")
    val srcFs = fs(s, srcRoot)
    val state = liveState(s, srcRoot, -1)
    require(state.nonEmpty, s"shallowClone: $srcRoot is empty")
    val files = state.map { case (rel, _) => abs(srcRoot, rel) }
    // one merged dst-local sidecar, keyed by the absolute names the
    // clone's add list uses (each source commit's sidecar keyed its
    // own relative names — a cross-root lookup would silently miss
    // and demote every file to the always-read class)
    val statLines = state.flatMap(_._2).distinct.flatMap { rel =>
      readText(srcFs, new Path(abs(srcRoot, rel))).split('\n')
        .filter(_.nonEmpty).map(_.split('\t'))
        .collect { case Array(file, c, mn, mx) =>
          s"${abs(srcRoot, file)}\t$c\t$mn\t$mx" }
    }
    val statsFile = if (statLines.isEmpty) None else {
      val rel = s"data/clone-${UUID.randomUUID()}/_stats.tsv"
      val f = fs(s, dstRoot)
      f.mkdirs(new Path(s"$dstRoot/${rel.split('/').dropRight(1).mkString("/")}"))
      val out = f.create(new Path(s"$dstRoot/$rel"), false)
      try out.write((statLines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      Some(rel)
    }
    val srcDvs = dvState(s, srcRoot, -1).map(abs(srcRoot, _))
    publish(s, dstRoot, files, Seq.empty, statsFile,
      schema = tableSchema(s, srcRoot), enforceSchema = false,
      dvs = if (srcDvs.isEmpty) None else Some(srcDvs))
  }

  /** Reclaim data files no snapshot at version >= `retainFrom` can
    * reach (the files delisted by the retained log prefix). Time
    * travel to versions before `retainFrom` stops working; newer
    * snapshots are untouched. Returns the number of reclaimed
    * files/sidecars (the `VACUUM` report).
    *
    * **Reader-vs-vacuum contract** (Delta's retention posture): an
    * open snapshot at version >= `retainFrom` is SAFE — vacuum only
    * deletes files that no retained version lists, and commits never
    * mutate listed files, so every file such a snapshot resolved
    * eagerly stays on disk. An open snapshot BELOW `retainFrom` is
    * outside the retention window: its files may be reclaimed
    * mid-read, and the read then fails LOUDLY (FileNotFound at scan
    * time) — it can never silently return partial rows, because the
    * file list was fixed at snapshot time and Spark does not skip
    * missing inputs unless `spark.sql.files.ignoreMissingFiles` is
    * explicitly enabled. Operators choose `retainFrom` to exceed the
    * longest-running reader, exactly as with Delta's retention
    * interval. */
  def vacuum(s: SparkSession, root: String, retainFrom: Int): Int = {
    val f = fs(s, root)
    val vs = versions(s, root)
    val retained = vs.filter(_ >= retainFrom)
    val reachable = retained.flatMap(v => liveFiles(s, root, v)).toSet ++
      liveFiles(s, root, -1).toSet
    val all = vs
      .flatMap(v => parseArr(readText(f, logPath(root, v)), "add")).toSet
    // external (clone-referenced) files belong to their source table —
    // never reclaimed from the referencing side
    val doomed = (all -- reachable).filterNot(isExternal)
    doomed.foreach(rel => f.delete(new Path(s"$root/$rel"), false))
    // deletion-vector sidecars no retained version can need (a compact
    // cleared them, or the declaring commit fell out of retention)
    val dvReachable = (retained.map(v => dvState(s, root, v)) :+
      dvState(s, root, -1)).flatten.toSet
    val dvAll = vs.flatMap(v =>
      parseDvs(readText(f, logPath(root, v))).getOrElse(Seq.empty)).toSet
    val dvDoomed = (dvAll -- dvReachable).filterNot(isExternal)
    dvDoomed.foreach(rel => f.delete(new Path(s"$root/$rel"), true))
    doomed.size + dvDoomed.size
  }
}
