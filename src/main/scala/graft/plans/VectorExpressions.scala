package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ArrayDoubleBinaryExpression, Bridge}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the ANN/dedup hot path: dot product
  * of two array<double> columns without materializing the intermediate
  * array that zip_with + aggregate would allocate per row. Generated
  * code is a tight primitive loop inside whole-stage codegen.
  *
  * Declares array<double> input types (via ImplicitCastInputTypes), so
  * SQL-registered calls get analysis-time coercion — array<float> is
  * cast, strings fail analysis — instead of reading garbage at
  * runtime. A NULL element in either array, or a length mismatch,
  * nulls the result — matching the zip_with + aggregate SQL this
  * replaces (zip_with pads the shorter array with NULLs), so a
  * truncated embedding surfaces as NULL instead of a plausible
  * partial-sum score.
  */
case class DotProduct(left: Expression, right: Expression)
    extends ArrayDoubleBinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column API for [[DotProduct]]; inputs are cast to array<double>. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}
