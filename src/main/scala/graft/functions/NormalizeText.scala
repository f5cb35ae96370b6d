package graft.functions

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernel for [[NormalizeText]] — a plain object (no companion
  * class) so Scala emits a static-forwarder mirror class and the
  * whole-stage-codegen Java can call
  * `graft.functions.TextNorm.normalize(...)` directly. Patterns are
  * compiled once per JVM, not per row.
  */
object TextNorm {
  private val marks = Pattern.compile("\\p{M}+")
  private val spaces = Pattern.compile("\\s+")

  /** Unicode canonical cleanup: NFD-decompose, drop combining marks
    * (the strip-accents step), case-fold to lower, collapse runs of
    * whitespace to single spaces and trim. The step ORDER is part of
    * the contract — it is mirrored literally by the DuckDB oracle
    * (`strip_accents` → `lower` → `regexp_replace('\s+')` → `trim`). */
  def normalize(u: UTF8String): UTF8String = {
    val decomposed = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
    val stripped = marks.matcher(decomposed).replaceAll("")
    val collapsed =
      spaces.matcher(stripped.toLowerCase(Locale.ROOT)).replaceAll(" ")
    UTF8String.fromString(collapsed.trim)
  }
}

/** Native text normalization — the canonical first stage of every
  * dedup / quality pipeline (near-dup recall collapses when "Crème"
  * and "Creme" shingle differently). One fused kernel for
  * NFD + strip-accents + lowercase + whitespace-collapse, as a
  * codegen'd Catalyst `Expression`: the composed built-in equivalent
  * needs a regexp_replace chain whose patterns re-evaluate per call
  * site, and Spark ships no Unicode-normalization function at all.
  *
  * Reference analogue: Gandiva's per-row UTF-8 string kernels
  * (`cpp/src/gandiva/function_registry_string.cc` — lower_utf8 etc.);
  * the reference also leans on utf8proc for normalization in its
  * compute layer (`cpp/src/arrow/compute/kernels/scalar_string.cc`).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(s: Any): Any =
    TextNorm.normalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // same static kernel as the interpreted path — bit-identical by
    // construction, and the call stays inside the codegen span
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeText = copy(child = newChild)
}
