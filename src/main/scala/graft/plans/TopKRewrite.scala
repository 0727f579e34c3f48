package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extension: rewrite the ubiquitous window top-k idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *       .filter($"rn" <= k) }}}
  *
  * into the native [[TopKPerKeyPlan]] — so USER-written window code gets the
  * bounded-heap, sort-free plan without knowing graft's API. Spark ≥ 3.5
  * helps this shape with `WindowGroupLimit` (bounds each group before the
  * sort); this rewrite goes further and removes the per-key sort + Window
  * pass entirely, keeping the rank output (computed over the ≤ k survivors).
  *
  * Only the exactly-equivalent shapes rewrite: a single `row_number()`
  * window expression (rank()/dense_rank() can emit more than k rows on
  * ties), a non-empty partition spec (a global top-k would need a
  * single-key clustered distribution), and a `<= k` / `< k+1` / `= 1`
  * filter on the rank. Everything else is left untouched.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def limitFor(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rank) => Some(v)
    case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rank) => Some(v - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rank) => Some(v)
    case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rank) => Some(v - 1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  /** The single-row_number Window node, tolerating a WindowGroupLimit that
    * Spark's own InferWindowGroupLimit may already have inserted below it
    * (ours subsumes it). */
  private object RowNumberWindow {
    def unapply(plan: LogicalPlan): Option[(Alias, Seq[Expression], Seq[org.apache.spark.sql.catalyst.expressions.SortOrder], LogicalPlan)] =
      plan match {
        case Window(
            Seq(alias @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(ps, os, _)), _)),
            _, _, wchild, _) if ps.nonEmpty && os.nonEmpty =>
          val child = wchild match {
            case wgl: WindowGroupLimit => wgl.child
            case other => other
          }
          Some((alias, ps, os, child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, RowNumberWindow(alias, ps, os, child)) =>
      limitFor(cond, alias.toAttribute) match {
        case Some(k) if k > 0 => TopKPerKeyPlan(ps, os, k, Some(alias.toAttribute), child)
        case _ => f
      }
    // same, with a pure column-selection Project between Filter and Window
    case f @ Filter(cond, Project(projList, RowNumberWindow(alias, ps, os, child)))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      limitFor(cond, alias.toAttribute) match {
        case Some(k) if k > 0 &&
            projList.exists(_.exprId == alias.exprId) =>
          Project(projList, TopKPerKeyPlan(ps, os, k, Some(alias.toAttribute), child))
        case _ => f
      }
  }
}
