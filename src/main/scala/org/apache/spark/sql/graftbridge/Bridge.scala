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

  /** Build a DataFrame from a (possibly custom) logical plan. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The session's name resolver (honors spark.sql.caseSensitive). */
  def resolver(spark: org.apache.spark.sql.SparkSession): (String, String) => Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.conf.resolver
}

/** Base for graft expressions that need the private[sql] input-type
  * coercion machinery: declares array<double>,array<double> inputs so
  * SQL-registered calls get analysis-time casts/checks instead of
  * runtime garbage.
  */
abstract class ArrayDoubleBinaryExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}

/** Unary sibling of [[ArrayDoubleBinaryExpression]]: one array<double>
  * input with analysis-time coercion.
  */
abstract class ArrayDoubleUnaryExpression
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}

/** (array<double>, int) sibling: a vector and a cell id, coerced at
  * analysis time — the two-level quantizer's in-cell assignment shape.
  */
abstract class ArrayDoubleIntBinaryExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.IntegerType)
}

/** (array<int>, array<double>) sibling: PQ codes and a query vector —
  * the ADC scoring shape.
  */
abstract class ArrayIntArrayDoubleBinaryExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
}

/** (long, long) sibling: two integral inputs coerced to LONG at
  * analysis time (AbstractDataType is private[sql], so the input-type
  * declaration lives here with the other coercion shims).
  */
abstract class LongBinaryExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
}

/** (binary, binary) sibling: two packed byte arrays — the int8
  * quantized-dot shape.
  */
abstract class BinaryBinaryExpression
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.BinaryType, org.apache.spark.sql.types.BinaryType)
}
