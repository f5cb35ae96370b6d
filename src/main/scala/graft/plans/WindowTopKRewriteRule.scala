package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the standard grouped-top-k WINDOW IDIOM
  *
  *   Project(p without rn,
  *     Filter(rn <= k,
  *       Window([row_number() over (partition g order o)] as rn, child)))
  *
  * into the engine's whole-operator [[TopKPerGroupNode]] — so a user
  * who writes the textbook `row_number().over(...)  <= k` form (or any
  * SQL generator that emits it) silently gets the bounded-heap
  * two-phase plan: no per-group sort, shuffle capped at
  * k·groups·partitions rows, and the Window + Sort nodes vanish.
  *
  * Relationship to Spark's own `InferWindowGroupLimit` (3.5+): that
  * rule PRUNES rows below the Window (WindowGroupLimit pre/post
  * shuffle passes) but still sorts each group and evaluates the
  * window to produce `rn`. When the query then DISCARDS `rn` — the
  * only case this rule matches, since the Project must not reference
  * it — the sort and window evaluation are pure overhead; TopKPerGroup
  * replaces them outright. If InferWindowGroupLimit already fired, the
  * interposed WindowGroupLimit node is recognized and absorbed.
  *
  * Match guards (all load-bearing):
  *  - exactly ONE window expression, a plain ROW_NUMBER over a
  *    non-empty ORDER BY (rank/dense_rank admit >k ties — different
  *    semantics — and an empty order is degenerate);
  *  - the filter is a single conjunct of shape rn <= k / rn < k /
  *    k >= rn / k > rn / rn = 1 with a positive integer literal;
  *  - the Project's expressions never reference rn (otherwise the
  *    rank is observable and must be computed);
  *  - batch plans only (the physical operator is not
  *    streaming-capable).
  *
  * Tie behavior: with a non-total ORDER BY, row_number picks
  * arbitrary rows among ties and so does the heap — both plans are
  * nondeterministic in exactly the same way, so the rewrite never
  * changes a deterministic answer (RulesSpec pins equality on a
  * total order).
  */
case class WindowTopKRewriteRule() extends Rule[LogicalPlan] {

  /** rn <= K as a limit, if the condition has that shape. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(plist,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(), spec), _)),
            part, order, wchild, _)))
        if part.nonEmpty && order.nonEmpty && !wchild.isStreaming &&
          spec.partitionSpec == part && spec.orderSpec == order &&
          !plist.exists(_.references.contains(al.toAttribute)) =>
      // part.nonEmpty: a GLOBAL row_number top-k (no PARTITION BY)
      // must NOT rewrite — TopKPerGroupExec would demand
      // ClusteredDistribution(Nil), which Spark rejects at planning;
      // the native window (+ WindowGroupLimit) already handles it
      // split the conjunction: exactly ONE rn-bound conjunct; the rest
      // must not touch rn. Residual conjuncts stay as a filter ABOVE
      // the top-k — same semantics as the original, where rn was also
      // assigned over ALL rows before any of them filtered.
      val conjuncts = splitConjuncts(cond)
      val (bounds, rest) =
        conjuncts.partition(c => limitOf(c, al.toAttribute).isDefined)
      if (bounds.length == 1 &&
          !rest.exists(_.references.contains(al.toAttribute))) {
        limitOf(bounds.head, al.toAttribute) match {
          case Some(k) if k >= 1 =>
            // absorb an InferWindowGroupLimit insertion if present: its
            // pruning is subsumed by the top-k operator itself
            val source = wchild match {
              case WindowGroupLimit(gPart, gOrder, _: RowNumber, _, inner)
                if gPart == part && gOrder == order => inner
              case other => other
            }
            val topk = TopKPerGroupNode(part, order, k, source)
            Project(plist,
              if (rest.isEmpty) topk
              else Filter(rest.reduce(And), topk))
          case _ => p
        }
      } else p
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
