package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the LLM-pipeline tier — tier (b) of
  * the custom-operator ladder, like [[CosineSimilarity]]: single fused
  * JVM loops replacing interpreted higher-order-function chains
  * (`transform`/`zip_with`/`aggregate` lambdas are evaluated
  * per-element by the interpreter and allocate per step). The
  * reference's analogue is Gandiva's LLVM-JIT'd kernel registry
  * (`cpp/src/gandiva/function_registry.cc`).
  *
  * Hash-chain compatibility is load-bearing: every kernel reproduces
  * BIT-FOR-BIT the value the composed Spark-expression form produced
  * (`xxhash64` = XXH64 seed 42, chained per argument), so swapping a
  * kernel into an existing query cannot change any oracle-checked
  * result. KernelsSpec pins each equivalence.
  */
object TextVectorKernels {

  /** Analysis-time gate shared by the (input, foldable int n) kernels:
    * n must be a POSITIVE literal. Without it a zero/negative window
    * crashes mid-task with an unrelated-looking error (divide-by-zero
    * in the segment count, NegativeArraySizeException, an MD5 update
    * over a negative range) instead of a plannable type-check failure. */
  private[functions] def positiveN(name: String,
      n: Expression): Option[TypeCheckResult] = n.eval() match {
    case i: Integer if i >= 1 => None
    case bad => Some(TypeCheckResult.TypeCheckFailure(
      s"$name requires n >= 1, got $bad"))
  }

  /** The shared tokenization contract of every text kernel: split on
    * every single space (Java `split(text, ' ')` limit -1 — empty
    * tokens kept), token i spanning bytes [starts(i), starts(i+1)-1),
    * with the sentinel starts(nTokens) = len + 1 so the "strip one
    * trailing separator" arithmetic works uniformly for the last
    * token. ONE implementation — the invariant used to live in three
    * literal copies, where a fix to one would silently miss the rest. */
  private def tokenStarts(text: UTF8String): Array[Int] = {
    val len = text.numBytes()
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == ' ') nTokens += 1
      i += 1
    }
    val starts = new Array[Int](nTokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (text.getByte(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = len + 1
    starts
  }

  /** Word-n-gram shingle hashes of `text`, distinct, sorted ascending.
    *
    * Tokenization matches `split(text, ' ')` with Java regex limit -1
    * (every single space splits; empty tokens kept). Because separators
    * are single spaces, each shingle "w(i) w(i+1) .. w(i+n-1)" is a
    * contiguous byte range of the original text — hashed in place with
    * zero copies, value-equal to `xxhash64(shingle_string)`.
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val starts = tokenStarts(text)
    val nTokens = starts.length - 1
    if (nTokens < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTokens - n + 1)
    var i = 0
    while (i < nTokens - n + 1) {
      val s = starts(i)
      val e = starts(i + n) - 1 // end of token i+n-1 (strip trailing sep)
      out(i) = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted run
    var w = 0
    i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else out.take(w))
  }

  private val md5Digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Word-n-gram shingle hashes like [[shingleHashes]], but the hash
    * is the FIRST 64 BITS OF MD5 (big-endian, two's complement) —
    * the one 64-bit-capable hash this engine and DuckDB compute
    * identically, which is what lets the SimHash pipeline carry a
    * full-semantics exact oracle. Value-equal to parsing the first
    * 16 hex chars of `md5(shingle)` as two 32-bit halves
    * ((hi << 32) | lo), which is exactly what the composed
    * `conv(substring(md5(..)))` expression form (and the DuckDB
    * mirror) computes — KernelsSpec pins the equivalence. Distinct,
    * sorted ascending, fused in one loop over the text bytes. */
  def md5Shingles64(text: UTF8String, n: Int): ArrayData = {
    val out = md5WindowHashes(text, n)
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else out.take(w))
  }

  /** fastText-inference margin (the quality_classify hot path) in ONE
    * fused pass: distinct unigrams + distinct bigrams of `text`, each
    * hashed to an integer weight = (first 12 md5 bits) % 2001 - 1000,
    * summed. Value-equal to the composed
    * `aggregate(concat(array_distinct(w), array_distinct(bigrams)),
    * 0L, acc + conv(substring(md5(f),1,3),16,10) % 2001 - 1000)` form
    * — the first 3 hex chars of a digest are exactly the top 12 bits
    * of its first two bytes, and integer addition is order-free so
    * set iteration order cannot matter. KernelsSpec pins the
    * equivalence on the fixture and adversarial literals. */
  def md5Margin(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val md = md5Digest.get()
    var z = 0L
    def add(f: String): Unit = {
      md.reset()
      val d = md.digest(f.getBytes("UTF-8"))
      val v = ((d(0) & 0xFF) << 4) | ((d(1) & 0xFF) >>> 4)
      z += v % 2001 - 1000
    }
    val seenU = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { if (seenU.add(toks(i))) add(toks(i)); i += 1 }
    val seenB = new java.util.HashSet[String]()
    i = 0
    while (i < toks.length - 1) {
      val b = toks(i) + " " + toks(i + 1)
      if (seenB.add(b)) add(b)
      i += 1
    }
    z
  }

  /** Bucketed md5 feature stream of `text`: one entry per NON-EMPTY
    * token (unigram, in order) followed by one per ADJACENT pair of
    * non-empty tokens joined by '_' (bigram, in order), each mapped to
    * (first-16-md5-bits) % buckets — duplicates kept. Bit-equal to the
    * interpreted chain it replaces:
    * explode(concat(filter(split(text,' '), x≠''),
    *   filter(zip_with(slice,slice,concat-if-both), notNull)))
    * → conv(substring(md5(f),1,4),16,10) % buckets.
    * The HOF lambdas are CodegenFallback (the r12 token_profile
    * lesson), so the composed form ran interpreted per element AND
    * evicted its projection from whole-stage codegen. */
  def md5BucketFeats(text: UTF8String, buckets: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val md = md5Digest.get()
    def bucket(f: String): Int = {
      md.reset()
      val d = md.digest(f.getBytes("UTF-8"))
      (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % buckets
    }
    var nUni = 0
    var nBig = 0
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        nUni += 1
        if (i + 1 < toks.length && toks(i + 1).nonEmpty) nBig += 1
      }
      i += 1
    }
    val out = new Array[Int](nUni + nBig)
    var k = 0
    i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) { out(k) = bucket(toks(i)); k += 1 }
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      if (toks(i).nonEmpty && toks(i + 1).nonEmpty) {
        out(k) = bucket(toks(i) + "_" + toks(i + 1)); k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** POSITIONAL variant of [[md5Shingles64]]: entry i is the hash of
    * the n-word window STARTING at token i — order kept, duplicates
    * kept — so `posexplode` yields the (position, window-hash) pairs
    * the substring-dedup index is built from, in one fused pass with
    * no per-position string materialization. */
  def md5ShinglesPos64(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(md5WindowHashes(text, n))

  /** Shared core: first-64-md5-bits of each n-token window of `text`,
    * one entry per start position (empty when the text has fewer than
    * n tokens). */
  private def md5WindowHashes(text: UTF8String, n: Int): Array[Long] = {
    val starts = tokenStarts(text)
    val nTokens = starts.length - 1
    if (nTokens < n) return Array.empty[Long]
    val bytes = text.getBytes
    val md = md5Digest.get()
    val out = new Array[Long](nTokens - n + 1)
    var i = 0
    while (i < nTokens - n + 1) {
      val s = starts(i)
      val e = starts(i + n) - 1 // end of token i+n-1 (strip trailing sep)
      md.reset()
      md.update(bytes, s, e - s)
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Content-defined chunks of `text` in ONE fused pass — the kernel
    * form of the cdc_chunk explode/union/window/groupBy pipeline.
    * Returns one struct (chunk_id, digest, n_words) per NON-EMPTY
    * chunk, bit-equal to the composed form it replaces:
    *
    *  - cut positions: after word i+n-1 (i.e. at word position i+n)
    *    whenever the first-64-md5-bits hash of the n-word window
    *    starting at i (exactly [[md5WindowHashes]]'s value) satisfies
    *    pmod(h, mod) == 0;
    *  - chunk_id: the running count of cuts at or before the chunk's
    *    first word — equal to the chunk ordinal (cuts are strictly
    *    increasing; a trailing cut at the text end yields an empty
    *    chunk, which — like the old groupBy over words — emits no row);
    *  - digest: lowercase-hex md5 of the chunk's words joined by
    *    single spaces. Tokens are split on every single space
    *    ([[tokenStarts]]), so that join IS the original text's byte
    *    range [start of first word, end of last word) — hashed in
    *    place, zero string materialization;
    *  - n_words: the chunk's token count (empty tokens kept, exactly
    *    like the old posexplode(split(text, ' '))).
    *
    * Replaces: a corpus-sized explode of every word + a second explode
    * of the window hashes, a union, a per-doc window running sum, and
    * a (doc, chunk) groupBy re-assembling the words it had just
    * exploded — the shuffle now carries one digest row per CHUNK
    * (~1/8th the words) instead of every word twice (guide §2.3
    * "shuffle keys and metadata instead of payloads"). KernelsSpec
    * pins the equivalence against the composed form. */
  def cdcChunks(text: UTF8String, n: Int, mod: Int): ArrayData = {
    val starts = tokenStarts(text)
    val nTokens = starts.length - 1
    val bytes = text.getBytes
    val md = md5Digest.get()
    // pass 1: cut positions (strictly increasing, each in [n, nTokens])
    val cutsB = Array.newBuilder[Int]
    var i = 0
    while (nTokens >= n && i <= nTokens - n) {
      val s = starts(i)
      val e = starts(i + n) - 1 // end of token i+n-1 (strip trailing sep)
      md.reset(); md.update(bytes, s, e - s)
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      if (((h % mod) + mod) % mod == 0) cutsB += (i + n)
      i += 1
    }
    val cuts = cutsB.result()
    // pass 2: one struct per non-empty chunk [a, b)
    val out = new Array[AnyRef](
      if (cuts.nonEmpty && cuts.last == nTokens) cuts.length
      else cuts.length + 1)
    var chunkId = 0
    var a = 0
    while (a < nTokens) {
      val b = if (chunkId < cuts.length) cuts(chunkId) else nTokens
      val s = starts(a)
      val e = starts(b) - 1
      md.reset(); md.update(bytes, s, e - s)
      val d = md.digest()
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = hexDigits((d(j) >> 4) & 0xf)
        cs(2 * j + 1) = hexDigits(d(j) & 0xf)
        j += 1
      }
      out(chunkId) = org.apache.spark.sql.catalyst.InternalRow(
        chunkId.toLong, UTF8String.fromString(new String(cs)),
        (b - a).toLong)
      chunkId += 1
      a = b
    }
    new GenericArrayData(out)
  }

  /** Consecutive n-token segments of `text` — the corpus-dedup
    * granularity between exact-document and shingle: segment i covers
    * tokens [i·n, min((i+1)·n, tokens)) joined by single spaces (the
    * final segment may be shorter). Tokenization matches
    * `split(text, ' ')` limit -1 (empty tokens kept), so — like
    * [[shingleHashes]] — every segment is a contiguous byte range of
    * the original text and each output is a zero-copy view over one
    * materialized byte array. Replaces a `transform(sequence(..),
    * i -> concat_ws(" ", slice(w, i*n+1, n)))` chain whose per-element
    * `slice(w, ..)` re-evaluates (and with an inlined `split`,
    * re-splits) the token array once per segment — O(len²/n) per doc,
    * interpreted. */
  def textSegments(text: UTF8String, n: Int): ArrayData = {
    val starts = tokenStarts(text)
    val nTokens = starts.length - 1
    val nSegs = (nTokens + n - 1) / n
    val bytes = text.getBytes
    val out = new Array[AnyRef](nSegs)
    var i = 0
    while (i < nSegs) {
      val s = starts(i * n)
      val e = starts(math.min((i + 1) * n, nTokens)) - 1
      out(i) = UTF8String.fromBytes(bytes, s, e - s)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k MinHash signatures over a shingle-hash set: sig(i) = min over h
    * of the chained xxhash64 value of (h, i) — bit-equal to
    * `min(xxhash64(col, lit(i)))`, whose chain is
    * hashInt(i, hashLong(h, 42)). Empty set → null (a doc with no
    * shingles has no signature; callers filter). */
  def minhashSigs(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val sigs = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(hs.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, base)
        if (v < sigs(i)) sigs(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sigs)
  }

  /** 64-bit SimHash over a shingle-hash set: bit j is 1 iff the +1/-1
    * votes of bit j across hashes sum >= 0 (i.e. 2*count(j) >= n) —
    * the exact tie semantics of the summed-votes form it replaces.
    * Empty set → null. */
  def simhash64(hs: ArrayData): Any = {
    val n = hs.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 64) {
        cnt(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (2 * cnt(j) >= n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Dot products of each plane (array<double>) against `vec`
    * (array<float> or array<double>): strict left-to-right double
    * accumulation over the common prefix — bit-equal to the
    * `aggregate(zip_with(...))` fold it replaces. */
  def vectorDots(planes: ArrayData, vec: ArrayData, vecIsFloat: Boolean): ArrayData = {
    val p = planes.numElements()
    val out = new Array[Double](p)
    var i = 0
    while (i < p) {
      val plane = planes.getArray(i)
      val n = math.min(plane.numElements(), vec.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) {
        val v = if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        dot += plane.getDouble(j) * v
        j += 1
      }
      out(i) = dot
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[vectorDots]] against a plain JVM matrix — the broadcast-variable
    * form (see [[BroadcastVectorDots]]). Same loop, same operand order,
    * so dots are bit-equal to the plan-literal path. */
  def vectorDotsMat(planes: Array[Array[Double]], vec: ArrayData,
      vecIsFloat: Boolean): ArrayData = {
    val p = planes.length
    val out = new Array[Double](p)
    var i = 0
    while (i < p) {
      val plane = planes(i)
      val n = math.min(plane.length, vec.numElements())
      var dot = 0.0
      var j = 0
      while (j < n) {
        val v = if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        dot += plane(j) * v
        j += 1
      }
      out(i) = dot
      i += 1
    }
    new GenericArrayData(out)
  }

  /** |A ∩ B| of two SORTED DISTINCT long arrays by a single merge walk
    * — the count-only replacement for `size(array_intersect(a, b))` on
    * shingle-hash sets ([[ShingleHashes]]/[[Md5Shingles64]] both emit
    * sorted distinct arrays by contract). array_intersect builds a hash
    * set AND materializes the intersection array per row only for
    * `size` to immediately discard it; candidate-verification stages
    * run this once per candidate pair, so the allocation-free merge is
    * the hot-loop win. Equal by construction to the composed form on
    * sorted distinct inputs (KernelsSpec pins it on the real fixture). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Keyed [[vectorDotsMat]]: look the matrix up by `key` in a
    * broadcast map (one matrix per k-means cell in the batched
    * SemDeDup resplit). Unknown key → null. */
  def vectorDotsByKey(
      mats: java.util.HashMap[java.lang.Long, Array[Array[Double]]],
      key: Long, vec: ArrayData, vecIsFloat: Boolean): ArrayData = {
    val m = mats.get(key)
    if (m == null) null else vectorDotsMat(m, vec, vecIsFloat)
  }
}

/** shingle_hashes(text, n): sorted distinct xxhash64 values of the
  * word-n-gram shingles of `text`. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("shingle_hashes", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes requires (string, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextVectorKernels.shingleHashes(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextVectorKernels.shingleHashes($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashes =
    copy(left = newLeft, right = newRight)
}

/** sorted_intersect_count(a, b): |A ∩ B| of two sorted distinct long
  * arrays (merge walk, no intersection array allocated) — the
  * verification-stage replacement for `size(array_intersect(a, b))`
  * over shingle-hash sets. Inputs MUST be sorted distinct (the
  * [[ShingleHashes]]/[[Md5Shingles64]] output contract); the kernel is
  * not a general array_intersect. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextVectorKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextVectorKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** md5_bucket_feats(text, buckets): bucketed md5 hashes of the
  * non-empty unigrams + adjacent '_'-joined bigrams of `text`,
  * duplicates kept — the fused codegen form of the DSIR
  * explode-HOF-md5 feature chain (same cross-engine md5 buckets; the
  * DuckDB oracle replays `md5(f)` hex). */
case class Md5BucketFeats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("md5_bucket_feats", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"md5_bucket_feats requires (string, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_bucket_feats"

  override def nullSafeEval(text: Any, buckets: Any): Any =
    TextVectorKernels.md5BucketFeats(
      text.asInstanceOf[UTF8String], buckets.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b) =>
      s"graft.functions.TextVectorKernels.md5BucketFeats($t, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5BucketFeats =
    copy(left = newLeft, right = newRight)
}

/** md5_shingles_pos64(text, n): POSITIONAL first-64-md5-bits hashes of
  * the word-n-gram windows of `text` — entry i hashes the window
  * starting at token i, order and duplicates kept (the substring-dedup
  * index form of [[Md5Shingles64]]; same cross-engine md5 values). */
case class Md5ShinglesPos64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("md5_shingles_pos64", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"md5_shingles_pos64 requires (string, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_shingles_pos64"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextVectorKernels.md5ShinglesPos64(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextVectorKernels.md5ShinglesPos64($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5ShinglesPos64 =
    copy(left = newLeft, right = newRight)
}

/** cdc_chunks(text, n, mod): fused content-defined chunking — one
  * struct (chunk_id, digest, n_words) per non-empty chunk, cut after
  * word i+n-1 whenever pmod(first-64-md5-bits of window [i, i+n-1]),
  * mod) = 0. Bit-equal to the explode/union/window/groupBy pipeline it
  * replaces ([[TextVectorKernels.cdcChunks]]). */
case class CdcChunks(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TextVectorKernels.positiveN("cdc_chunks", second)
          .orElse(TextVectorKernels.positiveN("cdc_chunks", third))
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks requires (string, foldable int, foldable int), got ($a, $b, $c)")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(text: Any, n: Any, mod: Any): Any =
    TextVectorKernels.cdcChunks(text.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], mod.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, m) =>
      s"graft.functions.TextVectorKernels.cdcChunks($t, $n, $m)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CdcChunks =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** md5_shingles64(text, n): sorted distinct first-64-md5-bits hashes of
  * the word-n-gram shingles of `text` (cross-engine: DuckDB computes
  * the same values from `md5(shingle)` hex — the SimHash oracle hash). */
case class Md5Shingles64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("md5_shingles64", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"md5_shingles64 requires (string, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_shingles64"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextVectorKernels.md5Shingles64(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextVectorKernels.md5Shingles64($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Shingles64 =
    copy(left = newLeft, right = newRight)
}

/** text_segments(text, n): consecutive n-token segments of text. */
case class TextSegments(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("text_segments", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"text_segments requires (string, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_segments"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextVectorKernels.textSegments(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextVectorKernels.textSegments($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TextSegments =
    copy(left = newLeft, right = newRight)
}

/** minhash_sigs(hs, k): k chained-xxhash64 MinHash signatures. */
case class MinHashSigs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TextVectorKernels.positiveN("minhash_sigs", right)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires (array<bigint>, foldable int), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty input → null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(hs: Any, k: Any): Any =
    TextVectorKernels.minhashSigs(
      hs.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (hs, k) => s"""
      ${ev.value} = graft.functions.TextVectorKernels.minhashSigs($hs, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

/** simhash64(hs): 64-bit majority-vote SimHash signature. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<bigint>, got $t")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty input → null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(hs: Any): Any =
    TextVectorKernels.simhash64(hs.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val r = ctx.freshName("simhashR")
      s"""
      Object $r = graft.functions.TextVectorKernels.simhash64($hs);
      ${ev.isNull} = ($r == null);
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) $r).longValue();
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** vector_dots(planes, vec): dot product of each plane against vec. */
case class VectorDots(left: Expression, right: Expression)
    extends BinaryExpression {

  private def vecIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dots requires (array<array<double>>, array<float|double>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dots"

  override def nullSafeEval(planes: Any, vec: Any): Any =
    TextVectorKernels.vectorDots(
      planes.asInstanceOf[ArrayData], vec.asInstanceOf[ArrayData], vecIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, v) =>
      s"graft.functions.TextVectorKernels.vectorDots($p, $v, $vecIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDots =
    copy(left = newLeft, right = newRight)
}

/** [[VectorDots]] with the plane matrix on a `SparkContext.broadcast`
  * instead of a plan literal: a `typedlit` centroid matrix serializes
  * O(k·d) doubles into every plan fragment and task closure, which caps
  * usable k (the documented adaptive-cells ceiling is k = 100,000 — a
  * ~25 MB literal at d=32). The broadcast rides the torrent block
  * store once per executor, and the plan/codegen size is independent
  * of k. Constructed directly via `GraftBridge.column` (the broadcast
  * handle is not an `Expression` child, so registry registration does
  * not apply). Kernel loop is identical to `vector_dots` → dots are
  * bit-equal (KernelsSpec pins the parity at k = 10,000).
  */
case class BroadcastVectorDots(
    mat: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
    child: Expression) extends UnaryExpression {

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bcast_vector_dots requires array<float|double>, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bcast_vector_dots"

  override def nullSafeEval(vec: Any): Any =
    TextVectorKernels.vectorDotsMat(
      mat.value, vec.asInstanceOf[ArrayData], vecIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("planesBc", mat,
      "org.apache.spark.broadcast.Broadcast")
    val m = ctx.addMutableState("double[][]", "planesMat",
      v => s"$v = (double[][]) $bc.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TextVectorKernels" +
        s".vectorDotsMat($m, $v, $vecIsFloat);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BroadcastVectorDots = copy(child = newChild)
}

/** Keyed [[BroadcastVectorDots]]: `left` is a LONG key selecting the
  * plane matrix from a broadcast map — one matrix per k-means cell.
  * This is what lets the SemDeDup hot-cell resplit run as ONE map-only
  * assignment pass over every hot cell at once (each row scores
  * against its own cell's sub-centroids) instead of a driver-side loop
  * of per-cell Spark jobs. Unknown key → null (callers pre-filter to
  * hot cells, so a null marks a logic error loudly, not silently).
  */
case class BroadcastVectorDotsByKey(
    mats: org.apache.spark.broadcast.Broadcast[
      java.util.HashMap[java.lang.Long, Array[Array[Double]]]],
    left: Expression, right: Expression) extends BinaryExpression {

  private def vecIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bcast_vector_dots_by_key requires (bigint, array<float|double>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // unknown key → null
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bcast_vector_dots_by_key"

  override def nullSafeEval(key: Any, vec: Any): Any =
    TextVectorKernels.vectorDotsByKey(mats.value,
      key.asInstanceOf[Long], vec.asInstanceOf[ArrayData], vecIsFloat)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("planesByKeyBc", mats,
      "org.apache.spark.broadcast.Broadcast")
    val m = ctx.addMutableState("java.util.HashMap", "planesByKey",
      v => s"$v = (java.util.HashMap) $bc.value();")
    nullSafeCodeGen(ctx, ev, (k, v) => s"""
      ${ev.value} = graft.functions.TextVectorKernels.vectorDotsByKey($m, $k, $v, $vecIsFloat);
      ${ev.isNull} = (${ev.value} == null);
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BroadcastVectorDotsByKey =
    copy(left = newLeft, right = newRight)
}

/** token_profile(text, stops): ONE fused byte-level pass over the
  * whitespace tokens of `text` — the codegen replacement for the
  * interpreted `size(filter(split(text, ' '), λ))` higher-order
  * chains the quality tier composed (HOF lambdas are CodegenFallback
  * in Spark: the Project carrying them is EXCLUDED from whole-stage
  * codegen and interprets per row — the PlanLintSpec codegen lint
  * catches exactly this). `stops` is a foldable space-separated stop
  * list (tokens cannot contain the delimiter). Returns a struct of
  * exact counts with `split`-compatible semantics (every single space
  * is a boundary; empty tokens count; "" is one empty token):
  *  - n_tok: token count
  *  - n_stop: tokens EQUAL to a stop word (occurrences — the
  *    text_quality / lang_id hit count)
  *  - n_stop_distinct: DISTINCT stop words present (the MassiveText
  *    membership rule; stop list bounded at 64 words)
  *  - n_alpha: tokens containing an ASCII a-z byte
  *  - n_sym: tokens containing '#' or the substring "..."
  * Byte-level is safe: every probe is ASCII, and UTF-8 guarantees
  * ASCII bytes never occur inside a multi-byte sequence. */
case class TokenProfile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        val n = Option(right.eval(null))
          .map(_.toString.split(" ").count(_.nonEmpty)).getOrElse(0)
        if (n > 64) TypeCheckResult.TypeCheckFailure(
          s"token_profile stop list has $n words; the distinct bitmask caps at 64")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_profile requires (string, foldable string), got ($l, $r)")
    }
  override def dataType: DataType = TokenProfile.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_profile"

  @transient private lazy val stops: Array[Array[Byte]] =
    right.eval(null).toString.split(" ").filter(_.nonEmpty)
      .map(_.getBytes("UTF-8"))

  override def nullSafeEval(text: Any, s: Any): Any =
    TokenProfile.profile(text.asInstanceOf[UTF8String], stops)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stops", stops, "byte[][]")
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.functions.TokenProfile.profile($t, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenProfile =
    copy(left = newLeft, right = newRight)
}

object TokenProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_stop_distinct", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_sym", IntegerType, nullable = false)))

  def profile(text: UTF8String,
      stops: Array[Array[Byte]]): org.apache.spark.sql.catalyst.InternalRow = {
    val b = text.getBytes
    var nTok = 1
    var nStop = 0
    var nAlpha = 0
    var nSym = 0
    var seen = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        // token is b[start, i)
        var alpha = false
        var sym = false
        var j = start
        while (j < i && !(alpha && sym)) {
          val c = b(j)
          if (!alpha && c >= 'a' && c <= 'z') alpha = true
          if (!sym && (c == '#' ||
              (c == '.' && j + 2 < i && b(j + 1) == '.' && b(j + 2) == '.')))
            sym = true
          j += 1
        }
        if (alpha) nAlpha += 1
        if (sym) nSym += 1
        var k = 0
        var matched = false
        while (k < stops.length && !matched) {
          val sw = stops(k)
          if (sw.length == i - start) {
            var m = 0
            while (m < sw.length && sw(m) == b(start + m)) m += 1
            if (m == sw.length) {
              nStop += 1
              seen |= 1L << k
              matched = true // a token equals at most one stop word
            }
          }
          k += 1
        }
        if (i < b.length) { nTok += 1; start = i + 1 }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, nStop, java.lang.Long.bitCount(seen), nAlpha, nSym))
  }
}

/** md5_margin(text): the fused [[TextVectorKernels.md5Margin]] as a
  * codegen'd expression — feature hashing + weight lookup + linear
  * margin of the fastText-shaped quality classifier, per row, inside
  * whole-stage codegen (the composed HOF `aggregate` form is
  * CodegenFallback and interprets). */
case class Md5Margin(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_margin requires string, got $other")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_margin"

  override def nullSafeEval(t: Any): Any =
    TextVectorKernels.md5Margin(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextVectorKernels.md5Margin($t)")

  override protected def withNewChildInternal(newChild: Expression): Md5Margin =
    copy(child = newChild)
}
