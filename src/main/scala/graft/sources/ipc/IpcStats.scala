package graft.sources.ipc

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column statistics for the graft-ipc format — the
  * data-skipping layer the Arrow file format itself lacks (an IPC
  * footer has batch offsets but no column min/max, unlike parquet
  * row groups; the reference's dataset layer solves the same gap
  * with partition/statistics expressions, `dataset/file_base.h`,
  * `dataset/filter.h`).
  *
  * Each committed `part-*.arrow` gains a `part-*.arrow.stats` sidecar
  * (JSON: row count + per-column min/max/null-count) written through
  * the same temp→rename commit as the data file. Pruning is
  * PLANNING-side and advisory only: a file is skipped only when its
  * stats PROVE no row can satisfy the pushed conjuncts; a missing or
  * unparsable sidecar, an unsupported filter shape, or an untracked
  * column type just keeps the file — and every pushed filter remains
  * a residual Spark re-evaluates, so correctness never rests on the
  * sidecars. Commit order (data file before sidecar) means a
  * concurrent planner sees at worst a data file without stats =
  * no pruning, never pruning without data.
  *
  * Tracked kinds: int/long/date/timestamp as `l` (their Catalyst
  * encodings are ordered integers), float/double as `d`, string as
  * `s`, boolean as `b`; binary columns record null counts only.
  * String min/max order on UTF8String.compareTo — unsigned UTF-8
  * byte order, exactly the order Spark's own string comparisons and
  * pushed range filters use — so string columns prune on FULL ranges
  * (point, IN, and </>/<=/>=), for any content including
  * supplementary characters. The decline path for non-binary
  * collations is structural: a collated StringType instance never
  * matches the binary-collation singleton, lands in kind 'x', and
  * records null counts only — no order claim, no pruning.
  */
private[ipc] object IpcStats {

  final class ColAcc(val field: StructField) {
    val kind: Char = field.dataType match {
      case LongType | IntegerType | DateType | TimestampType => 'l'
      case DoubleType | FloatType => 'd'
      case StringType => 's'
      case BooleanType => 'b'
      case _ => 'x' // null counts only
    }
    var nulls = 0L
    var any = false
    var minL = Long.MaxValue; var maxL = Long.MinValue
    var minD = Double.PositiveInfinity; var maxD = Double.NegativeInfinity
    // tracked explicitly: a file of only {+Infinity, NaN} leaves minD
    // at +Infinity too — the sentinel alone cannot distinguish
    // "saw no non-NaN value" from "the min really is +Infinity"
    var sawNonNaN = false
    var minS: UTF8String = null; var maxS: UTF8String = null
    var minB = true; var maxB = false

    def update(row: InternalRow, c: Int): Unit =
      if (row.isNullAt(c)) nulls += 1
      else {
        any = true
        kind match {
          case 'l' =>
            val v = field.dataType match {
              case IntegerType | DateType => row.getInt(c).toLong
              case _ => row.getLong(c)
            }
            if (v < minL) minL = v
            if (v > maxL) maxL = v
          case 'd' =>
            val v = field.dataType match {
              case FloatType => row.getFloat(c).toDouble
              case _ => row.getDouble(c)
            }
            // NaN is the LARGEST double in Spark's sort order — a file
            // containing one must record max = NaN (serialized "NaN"),
            // or range probes like d > 5 would prune the file whose
            // NaN rows actually match. NaN never lowers min — EXCEPT
            // when the file is all-NaN: then min really is NaN (not
            // the +Infinity sentinel, which a pushed MIN would report
            // as a value Spark never saw); toJson repairs that case
            // via sawNonNaN (a genuine +Infinity min must survive).
            if (v.isNaN) maxD = Double.NaN
            else {
              sawNonNaN = true
              if (v < minD) minD = v
              if (!maxD.isNaN && v > maxD) maxD = v
            }
          case 's' =>
            // UTF8String.compareTo is unsigned byte order — the order
            // Spark's pushed range filters mean. clone(): the row may
            // reuse its backing buffer across next() calls
            val v = row.getUTF8String(c)
            if (minS == null || v.compareTo(minS) < 0) minS = v.clone()
            if (maxS == null || v.compareTo(maxS) > 0) maxS = v.clone()
          case 'b' =>
            val v = row.getBoolean(c)
            if (!v) minB = false
            if (v) maxB = true
          case _ => ()
        }
      }
  }

  /** Sidecar format version. v2 = string bounds accumulate in
    * UTF8String (unsigned UTF-8 byte) order. A sidecar WITHOUT the
    * marker predates the order guarantee — its string bounds were
    * computed under Java String (UTF-16 code unit) order, which
    * disagrees beyond the BMP — so readers must not prune strings
    * from it. Numeric/boolean bounds order identically in both
    * generations and stay prunable. */
  private val FormatVersion = 2

  def toJson(rows: Long, accs: Array[ColAcc]): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("v", FormatVersion)
    root.put("rows", rows)
    val cols = root.putObject("cols")
    for (a <- accs) {
      val o = cols.putObject(a.field.name)
      o.put("t", a.kind.toString)
      o.put("nulls", a.nulls)
      if (a.any) a.kind match {
        case 'l' => o.put("min", a.minL.toString); o.put("max", a.maxL.toString)
        case 'd' =>
          // all-NaN file: minD still holds the +Infinity sentinel (NaN
          // never lowers min) but the column's true MIN under Spark's
          // order is NaN — serializing the sentinel would let a pushed
          // MIN answer +Infinity, a value the data never contained.
          // Gate on sawNonNaN, NOT on the sentinel value: a file of
          // {+Infinity, NaN} rows has a GENUINE +Infinity min that
          // must survive (equality probes on it would otherwise prune
          // a matching file)
          val mn = if (!a.sawNonNaN && a.maxD.isNaN) Double.NaN else a.minD
          o.put("min", mn.toString); o.put("max", a.maxD.toString)
        case 's' =>
          o.put("min", a.minS.toString); o.put("max", a.maxS.toString)
        case 'b' => o.put("min", a.minB.toString); o.put("max", a.maxB.toString)
        case _ => ()
      }
    }
    m.writeValueAsString(root)
  }

  final case class ColStats(kind: Char, nulls: Long,
      min: Option[String], max: Option[String])
  final case class FileStats(rows: Long, cols: Map[String, ColStats])

  /** Read + parse one sidecar; None on any read or parse failure —
    * the SHARED open/read/decode/parse sequence (it used to live in
    * three literal copies across the planner, the agg reader, and the
    * pushdown gate; callers choose keep-file vs fail-loud on None). */
  def readSidecar(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[FileStats] =
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(bytes) finally in.close()
      fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => None }

  def fromJson(json: String): Option[FileStats] =
    try {
      val root = new ObjectMapper().readTree(json)
      // pre-v2 sidecars recorded string bounds under Java String
      // order — demote their 's' columns to null-count-only so a
      // supplementary-plane string is never mis-pruned by bounds
      // computed under the wrong order
      val stringsOrdered =
        Option(root.get("v")).exists(_.asInt() >= FormatVersion)
      val cols = root.get("cols").fields().asScala.map { e =>
        val o = e.getValue
        val kind0 = o.get("t").asText().head
        val kind = if (kind0 == 's' && !stringsOrdered) 'x' else kind0
        e.getKey -> ColStats(kind,
          o.get("nulls").asLong(),
          if (kind == 'x') None else Option(o.get("min")).map(_.asText()),
          if (kind == 'x') None else Option(o.get("max")).map(_.asText()))
      }.toMap
      Some(FileStats(root.get("rows").asLong(), cols))
    } catch { case _: Throwable => None }

  /** Can any row of a file with `stats` satisfy every conjunct?
    * `true` = keep (also for anything not understood). */
  def mightMatch(stats: FileStats, filters: Array[Filter]): Boolean =
    filters.forall(f => conjunctMightMatch(stats, f))

  private def conjunctMightMatch(st: FileStats, f: Filter): Boolean = f match {
    case EqualTo(a, v) => boundsContain(st, a, v)
    case GreaterThan(a, v) => upperAbove(st, a, v, strict = true)
    case GreaterThanOrEqual(a, v) => upperAbove(st, a, v, strict = false)
    case LessThan(a, v) => lowerBelow(st, a, v, strict = true)
    case LessThanOrEqual(a, v) => lowerBelow(st, a, v, strict = false)
    case In(a, vs) => vs.exists(v => boundsContain(st, a, v))
    case IsNull(a) => st.cols.get(a).forall(_.nulls > 0)
    case IsNotNull(a) => st.cols.get(a).forall(c => c.nulls < st.rows)
    case And(l, r) => conjunctMightMatch(st, l) && conjunctMightMatch(st, r)
    case Or(l, r) => conjunctMightMatch(st, l) || conjunctMightMatch(st, r)
    case _ => true // Not, StringContains, … — no pruning claim
  }

  // numeric view of a filter value for an 'l' or 'd' column; None if
  // the value's type doesn't line up (then: no pruning)
  private def asLong(v: Any): Option[Long] = v match {
    case n: Long => Some(n)
    case n: Int => Some(n.toLong)
    case n: Short => Some(n.toLong)
    case n: Byte => Some(n.toLong)
    case _ => None // dates/timestamps arrive as java.sql types: skip
  }
  private def asDouble(v: Any): Option[Double] = v match {
    case n: Double => Some(n)
    case n: Float => Some(n.toDouble)
    case n: Long => Some(n.toDouble)
    case n: Int => Some(n.toDouble)
    case _ => None
  }

  private def boundsContain(st: FileStats, a: String, v: Any): Boolean =
    st.cols.get(a) match {
      case Some(c) if c.min.isDefined && c.max.isDefined => c.kind match {
        case 'l' => asLong(v).forall(x =>
          x >= c.min.get.toLong && x <= c.max.get.toLong)
        // NaN probe: every NaN comparison below is false — pruning on
        // it would drop files whose residual filter matches (Spark's
        // NaN = NaN is TRUE). Decline. A NaN MAX bound (file contains
        // NaN, the largest double in Spark's order) keeps the file for
        // any probe's upper check.
        case 'd' => asDouble(v).forall { x =>
          val mx = c.max.get.toDouble
          x.isNaN || (x >= c.min.get.toDouble && (mx.isNaN || x <= mx))
        }
        case 's' => v match {
          // bounds and probe compare in UTF8String binary order — the
          // same order the stats were accumulated under and the same
          // order Spark evaluates the residual filter with
          case s: String =>
            val u = UTF8String.fromString(s)
            u.compareTo(UTF8String.fromString(c.min.get)) >= 0 &&
              u.compareTo(UTF8String.fromString(c.max.get)) <= 0
          case _ => true
        }
        case 'b' => v match {
          case b: Boolean =>
            (b || c.min.get == "false") && (!b || c.max.get == "true")
          case _ => true
        }
        case _ => true
      }
      // min/max absent: untracked kind ('x' — keep) or an all-null /
      // empty file (a non-null probe can never match — prune)
      case Some(c) => c.kind == 'x'
      case None => true
    }

  private def upperAbove(st: FileStats, a: String, v: Any,
      strict: Boolean): Boolean =
    st.cols.get(a) match {
      case Some(c) if c.max.isDefined => c.kind match {
        case 'l' => asLong(v).forall(x =>
          if (strict) c.max.get.toLong > x else c.max.get.toLong >= x)
        // NaN probe declines; a NaN MAX bound (file contains NaN —
        // above every finite probe in Spark's order) keeps the file
        case 'd' => asDouble(v).forall { x =>
          val mx = c.max.get.toDouble
          x.isNaN || mx.isNaN || (if (strict) mx > x else mx >= x)
        }
        case 's' => v match {
          case s: String =>
            val mx = UTF8String.fromString(c.max.get)
            val u = UTF8String.fromString(s)
            if (strict) mx.compareTo(u) > 0 else mx.compareTo(u) >= 0
          case _ => true
        }
        case _ => true
      }
      case Some(c) => c.kind == 'x' // see boundsContain
      case None => true
    }

  private def lowerBelow(st: FileStats, a: String, v: Any,
      strict: Boolean): Boolean =
    st.cols.get(a) match {
      case Some(c) if c.min.isDefined => c.kind match {
        case 'l' => asLong(v).forall(x =>
          if (strict) c.min.get.toLong < x else c.min.get.toLong <= x)
        // NaN probe declines (see boundsContain)
        case 'd' => asDouble(v).forall(x => x.isNaN ||
          (if (strict) c.min.get.toDouble < x else c.min.get.toDouble <= x))
        case 's' => v match {
          case s: String =>
            val mn = UTF8String.fromString(c.min.get)
            val u = UTF8String.fromString(s)
            if (strict) mn.compareTo(u) < 0 else mn.compareTo(u) <= 0
          case _ => true
        }
        case _ => true
      }
      case Some(c) => c.kind == 'x' // see boundsContain
      case None => true
    }
}
