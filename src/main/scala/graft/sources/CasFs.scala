package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one compare-and-swap primitive every log/file publish in the
  * engine rides on: atomically install `tmp` as `target`, FAILING if
  * `target` already exists — never overwriting.
  *
  * Why this exists: HDFS `rename` refuses an existing destination
  * (a true CAS), but `RawLocalFileSystem` rename OVERWRITES — an
  * `exists()` pre-check leaves a TOCTOU window in which two in-JVM
  * writers both pass the check and the second rename silently
  * destroys the first writer's committed file (the reference's
  * dataset layer never hits this because it scans static listings —
  * `cpp/src/arrow/dataset/dataset.h:156-210` — but a transaction log
  * lives or dies by this primitive). So on `file:` scheme we publish
  * via `link(2)` (`Files.createLink`), which the kernel guarantees
  * fails with EEXIST atomically; on everything else we keep rename,
  * which is already fail-if-exists there. Object stores without
  * atomic rename need an external commit coordinator (as Delta's S3
  * LogStore does) — out of scope for this environment.
  */
object CasFs {

  /** Test-only hook, invoked on entry to [[publish]] with the target
    * path — lets a spec deterministically hold N writers INSIDE the
    * publish window for the same target (e.g. with a CyclicBarrier)
    * and assert exactly one wins. Never set outside tests. */
  @volatile private[graft] var interceptor: Option[Path => Unit] = None

  /** Striped fallback locks for local filesystems where `link(2)` is
    * unavailable (exotic mounts): serializes the exists+rename window
    * for IN-PROCESS writers. Cross-process writers on such a mount
    * are covered by [[withDirLock]] below — a flock(2)-style advisory
    * lock — NOT by these stripes. The fallback path keys the stripe
    * on the target's PARENT so two in-JVM threads can never attempt
    * overlapping OS locks on the same lock file (the JVM throws
    * OverlappingFileLockException instead of queueing). */
  private val stripes = Array.fill(64)(new Object)
  // keyed on the CANONICAL nio form of the parent, not the Hadoop Path
  // spelling: "file:/x/t" and "/x/t" name the same directory but hash
  // differently as Hadoop Paths, and two spellings landing on
  // different stripes would let two in-JVM threads race to the OS
  // lock below (the JVM answers OverlappingFileLockException, not
  // queueing). toUri.getPath upstream already strips the scheme; the
  // normalize here collapses any residual ./.. segments.
  private def lockFor(dstParent: java.nio.file.Path): Object =
    stripes(math.floorMod(
      dstParent.toAbsolutePath.normalize.toString.hashCode, stripes.length))

  /** Best-effort cross-process advisory lock around `body`: an OS
    * file lock on a per-directory `.graft-cas.lock` sibling, held
    * only for the exists+rename window. The lock file is
    * intentionally NEVER deleted — unlinking a lock file another
    * process may already have open lets a third process recreate the
    * path and lock the NEW inode while the second locks the orphaned
    * one: two "holders" at once. One empty file per log directory is
    * the price of a sound lock. Contract: a mount with neither hard
    * links nor working advisory locks (some NFS configurations)
    * cannot host a safe MULTI-PROCESS log — on such a mount this
    * degrades to in-JVM-only serialization (the stripes above), a
    * documented ceiling rather than silent corruption. */
  private[graft] def withDirLock(dst: java.nio.file.Path)(body: => Boolean): Boolean = {
    import java.nio.file.StandardOpenOption.{CREATE, WRITE}
    val ch =
      try java.nio.channels.FileChannel.open(
        dst.getParent.resolve(".graft-cas.lock"), CREATE, WRITE)
      catch { case _: Exception => null }
    if (ch == null) body
    else try {
      // Acquisition outcomes are NOT equivalent: an
      // OverlappingFileLockException means a thread of THIS JVM holds
      // the lock (possible only if the stripe above was bypassed), and
      // proceeding unlocked would reopen the exact exists+rename race
      // this primitive closes — wait and retry instead. Any other
      // failure means the mount's advisory locks don't work at all;
      // that degrades to in-JVM-only serialization, the documented
      // ceiling (scaladoc above), so body proceeds under the stripe.
      var l: java.nio.channels.FileLock = null
      var unsupported = false
      while (l == null && !unsupported) {
        try l = ch.lock()
        catch {
          case _: java.nio.channels.OverlappingFileLockException =>
            Thread.sleep(2)
          case _: Exception => unsupported = true
        }
      }
      try body finally { if (l != null) l.release() }
    } finally ch.close()
  }

  /** Atomically publish `tmp` as `target`; returns true iff this call
    * installed the file. On success the tmp file is consumed (renamed
    * or hard-link-then-deleted, checksum sidecars included); on
    * failure tmp is left for the caller to clean up. */
  def publish(f: FileSystem, tmp: Path, target: Path): Boolean = {
    interceptor.foreach(_(target))
    if (f.getUri.getScheme == "file") {
      val src = Paths.get(tmp.toUri.getPath)
      val dst = Paths.get(target.toUri.getPath)
      try {
        Files.createLink(dst, src) // link(2): EEXIST is atomic
        // carry the Hadoop checksum sidecar (".name.crc") the old
        // rename used to move: without it a checksummed LocalFileSystem
        // silently skips read-time corruption detection on the
        // committed file. Best-effort AFTER the data link — the
        // publish is already won; a missing .crc only disables
        // verification, never correctness.
        try {
          val srcCrc = src.resolveSibling("." + src.getFileName + ".crc")
          val dstCrc = dst.resolveSibling("." + dst.getFileName + ".crc")
          if (Files.exists(srcCrc) && !Files.exists(dstCrc))
            Files.createLink(dstCrc, srcCrc)
        } catch { case _: java.io.IOException => () }
        // the publish is DONE at link time; a failed tmp cleanup must
        // not make the caller believe the commit lost and re-publish
        try { f.delete(tmp, false); () } // hadoop delete reaps .crc sidecars
        catch { case _: java.io.IOException => () }
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          // no hard links on this mount: stripe (keyed on the PARENT,
          // see above) serializes in-process writers; the dir lock
          // extends that to cross-process writers where the mount
          // supports advisory locks
          lockFor(dst.getParent).synchronized {
            withDirLock(dst) { !f.exists(target) && f.rename(tmp, target) }
          }
      }
    } else {
      // HDFS-like: rename refuses an existing destination (true CAS);
      // the exists() is a cheap fast-path, not the guard
      !f.exists(target) && f.rename(tmp, target)
    }
  }
}
