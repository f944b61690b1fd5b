package graft.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule for the reference's W1 idiom (`utils.scala:188,209`):
  *
  *   SELECT DISTINCT key, agg(x) OVER (PARTITION BY key)   -- window + distinct
  *   ≡ SELECT key, agg(x) GROUP BY key                     -- one aggregation
  *
  * Catalyst doesn't attempt this because it isn't sound in general; it IS
  * sound under conditions this rule checks precisely:
  *   - the dedup (as `Distinct`, `Deduplicate`, or the dedup-`Aggregate` the
  *     optimizer rewrites them into) sits directly on a `Project` over a
  *     `Window`;
  *   - every projected column is either a partition-key attribute or a
  *     window aggregate over exactly this partition spec with an
  *     entire-partition frame (no ORDER BY / no custom frame);
  *   - EVERY partition key is projected (otherwise DISTINCT may merge rows
  *     of different partitions that happen to share projected values — an
  *     aggregation would not);
  *   - the aggregate is deterministic, order-insensitive
  *     (sum/min/max/count/avg) and non-DISTINCT.
  *
  * Under those conditions both plans emit exactly one row per partition key
  * with identical values, and the rewrite replaces sort-the-whole-partition
  * plus a dedup shuffle with partial aggregation. The engine's `Summarize`
  * API already avoids the pattern; this rule repairs it when it arrives via
  * SQL written in the reference's style. Registered by `GraftExtensions`.
  */
object WindowDistinctToAggregate extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Distinct(Project(projectList, w: Window)) if eligible(projectList, w) =>
      rewrite(projectList, w)
    case Deduplicate(keys, Project(projectList, w: Window))
        if sameAttrs(keys, projectList) && eligible(projectList, w) =>
      rewrite(projectList, w)
    // the optimizer's ReplaceDeduplicateWithAggregate form: group-by-all-columns
    case Aggregate(groupingExprs, aggExprs, Project(projectList, w: Window), _)
        if sameAttrs(groupingExprs, projectList) && sameAttrs(aggExprs, projectList) &&
          eligible(projectList, w) =>
      rewrite(projectList, w)
  }

  private def sameAttrs(a: Seq[Expression], b: Seq[NamedExpression]): Boolean = {
    val ids = b.collect { case attr: Attribute => attr.exprId }.toSet
    ids.size == b.size && a.length == b.length && a.forall {
      case attr: Attribute => ids.contains(attr.exprId)
      case _ => false
    }
  }

  private def rewrite(projectList: Seq[NamedExpression], w: Window): Aggregate = {
    val windowAliases: Map[ExprId, Alias] = w.windowExpressions.collect {
      case a @ Alias(_: WindowExpression, _) => a.exprId -> a
    }.toMap
    val aggExprs: Seq[NamedExpression] = projectList.map {
      case attr: Attribute if windowAliases.contains(attr.exprId) =>
        val orig = windowAliases(attr.exprId)
        val agg = orig.child.asInstanceOf[WindowExpression]
          .windowFunction.asInstanceOf[AggregateExpression]
        Alias(agg, orig.name)(exprId = attr.exprId, qualifier = attr.qualifier)
      case attr: Attribute => attr
      case other => other // unreachable under eligible()
    }
    Aggregate(w.partitionSpec, aggExprs, w.child)
  }

  private def eligible(projectList: Seq[NamedExpression], w: Window): Boolean = {
    if (w.orderSpec.nonEmpty) return false
    val partitionAttrs = w.partitionSpec.flatMap {
      case a: Attribute => Some(a.exprId)
      case _ => None
    }.toSet
    if (partitionAttrs.size != w.partitionSpec.size) return false // non-attribute keys

    val windowAliasIds = w.windowExpressions.collect {
      case a @ Alias(_: WindowExpression, _) => a.exprId
    }.toSet

    // all window expressions in this node must be eligible (Project may
    // reference any of them)
    val allWindowsEligible = w.windowExpressions.forall {
      case Alias(we: WindowExpression, _) => eligibleWindow(we, w)
      case _ => false
    }
    if (!allWindowsEligible) return false

    val (winRefs, plainRefs) = projectList.partition {
      case a: Attribute => windowAliasIds.contains(a.exprId)
      case _ => return false // computed projections: stay out
    }
    val plainIds = plainRefs.map(_.asInstanceOf[Attribute].exprId).toSet
    // non-window projections must be exactly the full partition-key set
    winRefs.nonEmpty && plainIds == partitionAttrs
  }

  private def eligibleWindow(we: WindowExpression, w: Window): Boolean = {
    val specOk = we.windowSpec.partitionSpec.length == w.partitionSpec.length &&
      we.windowSpec.partitionSpec.zip(w.partitionSpec).forall {
        case (a, b) => a.semanticEquals(b)
      } && we.windowSpec.orderSpec.isEmpty
    val frameOk = we.windowSpec.frameSpecification match {
      case UnspecifiedFrame => true
      case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
      case _ => false
    }
    val funcOk = we.windowFunction match {
      case ae: AggregateExpression if !ae.isDistinct && ae.deterministic =>
        ae.aggregateFunction match {
          case _: Sum | _: Min | _: Max | _: Count | _: Average => true
          case _ => false
        }
      case _ => false
    }
    specOk && frameOk && funcOk
  }
}
