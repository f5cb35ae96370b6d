package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *  - **Optimistic concurrency.** Commit = write temp JSON, then
  *    exists-guarded rename to `v<next>.json`; on loss (version
  *    taken) re-read the log and retry at the next number. Same
  *    protocol + caveat as Ipc.scala:186 — HDFS rename refuses an
  *    existing destination (true CAS); RawLocalFileSystem overwrites,
  *    so the exists() guard carries local runs where the race window
  *    is within-JVM nanoseconds. Object stores without atomic rename
  *    need a commit coordinator, as Delta's S3 LogStore does.
  *  - **Compaction is a commit.** [[compact]] rewrites the live set
  *    into fewer files and publishes {add: new, remove: old} in ONE
  *    entry — readers switch atomically, old snapshots keep working.
  *
  * Scale posture: the log is O(#commits) driver-side metadata; data
  * moves only through distributed parquet jobs. Nothing here shuffles.
  */
object TableLog {

  private def fs(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def logPath(root: String, v: Int): Path =
    new Path(f"$root/_log/v$v%05d.json")

  // (kept trivially regular so the hand-rolled parser below cannot
  // drift from the writer: paths are uuid/part names, never quoted
  // metacharacters)
  private def render(version: Int, add: Seq[String], remove: Seq[String]): String = {
    def arr(xs: Seq[String]) = xs.map(x => "\"" + x + "\"").mkString("[", ",", "]")
    s"""{"version":$version,"add":${arr(add)},"remove":${arr(remove)}}"""
  }

  private def parseArr(json: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
    m.map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\"")))
      .getOrElse(Seq.empty)
  }

  /** Committed versions in ascending order (empty for a fresh root). */
  def versions(s: SparkSession, root: String): Seq[Int] = {
    val f = fs(s, root)
    val dir = new Path(s"$root/_log")
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toInt)
      .sorted.toSeq
  }

  /** Live file set (paths relative to root) after replaying the log
    * prefix up to and including `version` (-1 = latest). */
  private def liveFiles(s: SparkSession, root: String, version: Int): Seq[String] = {
    val f = fs(s, root)
    val vs = versions(s, root)
    require(vs.nonEmpty, s"TableLog at $root has no commits")
    val upto = if (version < 0) vs else vs.filter(_ <= version)
    require(upto.nonEmpty, s"no committed version <= $version at $root")
    val live = mutable.LinkedHashSet.empty[String]
    upto.foreach { v =>
      val in = f.open(logPath(root, v))
      val json = try {
        val bytes = new Array[Byte](f.getFileStatus(logPath(root, v)).getLen.toInt)
        in.readFully(bytes); new String(bytes, "UTF-8")
      } finally in.close()
      parseArr(json, "remove").foreach(live.remove)
      parseArr(json, "add").foreach(live.add)
    }
    live.toSeq
  }

  /** Publish one commit via exists-guarded rename CAS; returns the
    * version that won. */
  private def publish(s: SparkSession, root: String,
      add: Seq[String], remove: Seq[String]): Int = {
    val f = fs(s, root)
    f.mkdirs(new Path(s"$root/_log"))
    var attempt = versions(s, root).lastOption.getOrElse(-1) + 1
    while (true) {
      val tmp = new Path(s"$root/_log/.tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(render(attempt, add, remove).getBytes("UTF-8"))
      finally out.close()
      val target = logPath(root, attempt)
      if (!f.exists(target) && f.rename(tmp, target)) return attempt
      f.delete(tmp, false)            // lost the race: next version
      attempt = math.max(attempt + 1,
        versions(s, root).lastOption.getOrElse(-1) + 1)
    }
    -1 // unreachable
  }

  /** Append `df` as a new commit; returns the committed version. */
  def append(s: SparkSession, root: String, df: DataFrame): Int = {
    val sub = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$sub")
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$sub/$n").toSeq
    publish(s, root, files, Seq.empty)
  }

  /** Replace the whole table content with `df` in one commit. */
  def overwrite(s: SparkSession, root: String, df: DataFrame): Int = {
    val old = if (versions(s, root).isEmpty) Seq.empty[String]
      else liveFiles(s, root, -1)
    val sub = s"data/${UUID.randomUUID()}"
    df.write.parquet(s"$root/$sub")
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$sub/$n").toSeq
    publish(s, root, files, old)
  }

  /** The table as of `version` (-1 = latest). File list is resolved
    * NOW — the returned frame is a stable snapshot. */
  def snapshot(s: SparkSession, root: String, version: Int = -1): DataFrame = {
    val files = liveFiles(s, root, version).map(rel => s"$root/$rel")
    s.read.parquet(files: _*)
  }

  /** Rewrite the live set into `numFiles` files and publish the swap
    * as one atomic commit. Old snapshots keep reading the old files. */
  def compact(s: SparkSession, root: String, numFiles: Int): Int = {
    val old = liveFiles(s, root, -1)
    val sub = s"data/${UUID.randomUUID()}"
    snapshot(s, root).coalesce(numFiles).write.parquet(s"$root/$sub")
    val f = fs(s, root)
    val files = f.listStatus(new Path(s"$root/$sub"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .sorted.map(n => s"$sub/$n").toSeq
    publish(s, root, files, old)
  }

  /** Reclaim data files no snapshot at version >= `retainFrom` can
    * reach (the files delisted by the retained log prefix). Time
    * travel to versions before `retainFrom` stops working; newer
    * snapshots are untouched. */
  def vacuum(s: SparkSession, root: String, retainFrom: Int): Unit = {
    val f = fs(s, root)
    val reachable = versions(s, root).filter(_ >= retainFrom)
      .flatMap(v => liveFiles(s, root, v)).toSet ++
      liveFiles(s, root, -1).toSet
    val all = versions(s, root)
      .flatMap { v =>
        val in = f.open(logPath(root, v))
        val json = try {
          val bytes = new Array[Byte](
            f.getFileStatus(logPath(root, v)).getLen.toInt)
          in.readFully(bytes); new String(bytes, "UTF-8")
        } finally in.close()
        parseArr(json, "add")
      }.toSet
    (all -- reachable).foreach(rel => f.delete(new Path(s"$root/$rel"), false))
  }
}
