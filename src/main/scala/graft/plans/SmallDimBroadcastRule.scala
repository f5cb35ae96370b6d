package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule (tier (c) of the custom-operator ladder: a
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`):
  * force a broadcast hint onto a join side that IS a scan of one of
  * the engine's scale-factor-invariant dimension tables
  * (`graft.sources.Tables.smallDims` — region/nation), modulo
  * Project/Filter/alias wrappers. A side that merely CONTAINS a dim
  * scan deeper inside (e.g. a fact tree already joined to nation) is
  * deliberately NOT matched — hinting that whole side would broadcast
  * an arbitrarily large intermediate.
  *
  * Why a rule and not `broadcast()` at every call site: the size
  * estimate Catalyst uses for auto-broadcast is file size, which
  * mis-guesses through projections/filters and is capped by
  * `autoBroadcastJoinThreshold`; domain knowledge ("nation has 25
  * rows at ANY scale factor") is something only the engine can inject.
  * The reference's analogue is DataFusion's rule-based optimizer
  * chain (`rust/datafusion/src/optimizer/optimizer.rs`).
  */
case class SmallDimBroadcastRule() extends Rule[LogicalPlan] {

  private val dimFiles: Set[String] =
    graft.sources.Tables.smallDims.map(n => s"$n.parquet")

  /** True iff the plan is the dim scan itself, wrapped only in nodes
    * that cannot grow cardinality beyond the scan (projections,
    * filters, aliases, hints). Recursion, not `exists`: a join or
    * union above the scan stops the match. */
  @annotation.tailrec
  private def isSmallDimScan(plan: LogicalPlan): Boolean = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      // match the path's FILE-NAME COMPONENT against the registry of
      // tables whose cardinality is scale-factor-independent — a bare
      // endsWith would also hit "donation.parquet"/"subregion.parquet"
      // and force-broadcast an arbitrarily large table
      fs.location.rootPaths.exists(p => dimFiles.contains(p.getName))
    case Project(_, child)         => isSmallDimScan(child)
    case Filter(_, child)          => isSmallDimScan(child)
    case SubqueryAlias(_, child)   => isSmallDimScan(child)
    case ResolvedHint(child, _)    => isSmallDimScan(child)
    case UnresolvedHint(_, _, child) => isSmallDimScan(child)
    case _ => false
  }

  private def alreadyHinted(plan: LogicalPlan): Boolean = plan match {
    case ResolvedHint(_, hint) => hint.strategy.isDefined
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, _, _, hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
      val newLeft = isSmallDimScan(l) && !alreadyHinted(l)
      val newRight = isSmallDimScan(r) && !alreadyHinted(r)
      if (!newLeft && !newRight) j
      else {
        val hi = org.apache.spark.sql.catalyst.plans.logical.HintInfo(
          strategy = Some(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))
        j.copy(hint = JoinHint(
          if (newLeft) Some(hi) else hint.leftHint,
          if (newRight) Some(hi) else hint.rightHint))
      }
  }
}
