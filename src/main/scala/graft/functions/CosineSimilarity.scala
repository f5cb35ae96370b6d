package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float vectors — the
  * engine's hot similarity kernel (Similarity.scala, Dedup.scala).
  *
  * This is the (b) tier of the custom-operator preference order: a
  * Catalyst `Expression` with `doGenCode`, compiled into whole-stage
  * codegen as a single fused loop — no lambda-function interpretation,
  * no per-element boxing, unlike the equivalent
  * `aggregate(zip_with(..))` composition. The reference's analogue is
  * a Gandiva LLVM-JIT'd kernel (`cpp/src/gandiva/` function registry);
  * Janino-compiled Java is Spark's JIT.
  *
  * Semantics: strict left-to-right accumulation in double — bit-equal
  * to the composed `aggregate(zip_with(...))` fold it replaces (and to
  * the DuckDB oracle's sequential list_sum), so swapping it in cannot
  * change any oracle-checked ranking. Null array → null (nullSafe);
  * a null ELEMENT in either array → null result, matching the
  * composed form's null propagation (reading the slot as 0.0 would
  * silently diverge from the documented equivalence); length mismatch
  * uses the common prefix; zero vector → NaN, as the composed form
  * also yields.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      // null element → null result (the composed form's propagation)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
          else {
            double $xi = (double) $a.getFloat($i);
            double $yi = (double) $b.getFloat($i);
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
        }
        if (!${ev.isNull}) {
          ${ev.value} = $dot /
            (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
