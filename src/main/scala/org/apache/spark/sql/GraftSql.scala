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
}
