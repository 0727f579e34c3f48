package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` classic Column <-> Expression
  * converters, so graft can build native Catalyst expressions (codegen'd,
  * no UDF boxing) and expose them as ordinary [[Column]]s.
  *
  * This is the standard extension-library pattern: the only thing that lives
  * in the Spark namespace is this two-method shim.
  */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column (possibly carrying a `.asc`/`.desc` ordering) into a
    * pure catalyst [[catalyst.expressions.SortOrder]]. The Column API wraps
    * orderings in `sql.internal.SortOrder` ColumnNodes whose direction
    * objects are NOT java-serializable — capturing one in a physical
    * operator's task closure throws `NotSerializableException` at execute.
    * This unwraps the node and rebuilds the catalyst form; a plain column
    * defaults to ascending nulls-first (SQL ORDER BY default). */
  def sortOrder(df: DataFrame, c: Column): catalyst.expressions.SortOrder = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast}
    import org.apache.spark.sql.{internal => nodes}
    c.node match {
      case so: nodes.SortOrder =>
        val dir = so.sortDirection match {
          case nodes.SortOrder.Ascending => Ascending
          case nodes.SortOrder.Descending => Descending
        }
        val no = so.nullOrdering match {
          case nodes.SortOrder.NullsFirst => NullsFirst
          case nodes.SortOrder.NullsLast => NullsLast
        }
        catalyst.expressions.SortOrder(resolvedExpression(df, Column(so.child)), dir, no, Seq.empty)
      case _ =>
        catalyst.expressions.SortOrder(
          resolvedExpression(df, c), Ascending, NullsFirst, Seq.empty)
    }
  }

  /** Resolve an arbitrary Column against `df` into a pure catalyst
    * Expression (attribute references bound to df's analyzed output): run it
    * through an analyzed single-column projection and unwrap the alias.
    * Attribute exprIds are stable per Dataset, so the result composes with
    * [[analyzed]](df) in a manually-built plan. */
  def resolvedExpression(df: DataFrame, c: Column): Expression =
    df.select(c).asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed match {
      case p: catalyst.plans.logical.Project =>
        p.projectList.head match {
          case a: catalyst.expressions.Alias => a.child
          case e => e
        }
      case other =>
        throw new IllegalStateException(s"unexpected plan for single-column select: $other")
    }

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point for
    * graft's custom logical operators (e.g. [[graft.plans.TopKPerKeyPlan]]). */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
