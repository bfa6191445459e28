package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] Column↔Expression converters so
  * graft can register custom Catalyst expressions (Spark 4 removed the
  * public `new Column(expr)` constructor). Lives under
  * org.apache.spark.sql for visibility, exposes only these two calls.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
