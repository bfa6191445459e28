package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the `row_number() OVER (PARTITION BY g
  * ORDER BY o) <= k` idiom — a full window sort that materializes
  * every row — into the bounded-heap [[TopKPerGroupLogical]] operator.
  *
  * Matched shape (what `.withColumn("rn", row_number over w)
  * .filter(rn <= k).drop("rn")` produces after analysis):
  *
  *   Project [child cols, no rn]
  *     Filter (rn <= k)
  *       Window [row_number() ... AS rn]
  *         child
  *
  * The rewrite only fires when the rank column itself is projected
  * away — if the query keeps rn, the window computes it and we leave
  * the plan alone. PARTITION BY must be non-empty (a global top-k is
  * TakeOrdered's job, and ClusteredDistribution(Nil) is rejected).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _)) if a.exprId == rn => Some(k - 1)
    // rn = 1 is top-1 (rn = k for k > 1 selects a middle rank — not a
    // top-k shape, and row_number() >= 1 always, so only 1 qualifies)
    case EqualTo(a: AttributeReference, Literal(1, _)) if a.exprId == rn => Some(1)
    case EqualTo(Literal(1, _), a: AttributeReference) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(
          Seq(winExpr @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty &&
          partitionSpec.forall(_.isInstanceOf[AttributeReference]) &&
          orderSpec.forall(_.child.isInstanceOf[AttributeReference]) &&
          !projectList.exists(_.references.contains(winExpr.toAttribute)) =>
      rankLimit(cond, winExpr.exprId) match {
        case Some(k) if k > 0 =>
          // Spark's own InferWindowGroupLimit may already have inserted
          // a WindowGroupLimit below the Window; it is redundant under
          // the heap operator (and carries two sorts) — strip it.
          val realChild = child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          Project(projectList, TopKPerGroupLogical(partitionSpec, orderSpec, k, realChild))
        case _ => p
      }
  }
}
