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

  /** The single-row_number Window node. The raw child is returned as-is; a
    * WindowGroupLimit that Spark's own InferWindowGroupLimit may have
    * inserted below it is only stripped later, once the filter's k is known
    * and the WGL is proven redundant (same spec, RowNumber, limit >= k) —
    * discarding a narrower or foreign WGL would change results. */
  private object RowNumberWindow {
    def unapply(plan: LogicalPlan): Option[(Alias, Seq[Expression], Seq[org.apache.spark.sql.catalyst.expressions.SortOrder], LogicalPlan)] =
      plan match {
        case Window(
            Seq(alias @ Alias(WindowExpression(_: RowNumber, WindowSpecDefinition(ps, os, _)), _)),
            _, _, wchild, _) if ps.nonEmpty && os.nonEmpty =>
          Some((alias, ps, os, wchild))
        case _ => None
      }
  }

  /** Strip a WindowGroupLimit below the matched Window only when it is
    * subsumed by the rewrite: identical partition/order spec, RowNumber
    * rank, and a limit that keeps at least the k rows the filter wants.
    * Any other WGL (narrower limit, different spec or rank function) makes
    * the shape non-equivalent — signalled by None so the caller leaves the
    * plan untouched. */
  private def childWithoutSubsumedWgl(
      wchild: LogicalPlan,
      ps: Seq[Expression],
      os: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
      k: Int): Option[LogicalPlan] = wchild match {
    case wgl: WindowGroupLimit =>
      val sameSpec = wgl.partitionSpec.length == ps.length &&
        wgl.partitionSpec.zip(ps).forall { case (a, b) => a.semanticEquals(b) } &&
        wgl.orderSpec.length == os.length &&
        wgl.orderSpec.zip(os).forall { case (a, b) => a.semanticEquals(b) }
      if (sameSpec && wgl.rankLikeFunction.isInstanceOf[RowNumber] && wgl.limit >= k)
        Some(wgl.child)
      else None
    case other => Some(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, RowNumberWindow(alias, ps, os, wchild)) =>
      limitFor(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          childWithoutSubsumedWgl(wchild, ps, os, k) match {
            case Some(child) => TopKPerKeyPlan(ps, os, k, Some(alias.toAttribute), child)
            case None => f
          }
        case _ => f
      }
    // same, with a pure column-selection Project between Filter and Window
    case f @ Filter(cond, Project(projList, RowNumberWindow(alias, ps, os, wchild)))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      limitFor(cond, alias.toAttribute) match {
        case Some(k) if k > 0 &&
            projList.exists(_.exprId == alias.exprId) =>
          childWithoutSubsumedWgl(wchild, ps, os, k) match {
            case Some(child) =>
              Project(projList, TopKPerKeyPlan(ps, os, k, Some(alias.toAttribute), child))
            case None => f
          }
        case _ => f
      }
  }
}
