package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ArrayDoubleBinaryExpression, ArrayDoubleUnaryExpression, Bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

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

/** Native L2-normalize for array<double> columns — replaces the
  * `transform(a, x -> x / sqrt(aggregate(zip_with(a, a, *), ...)))`
  * higher-order-function tree, which Spark evaluates INTERPRETED with
  * per-element copies and re-evaluates the norm subtree per element
  * (measured ~100× slower for comparable per-row loops, SURVEY.md §5).
  * Sits in the scan path of every ANN operator and the embedding
  * dedup, so it must stay inside whole-stage codegen.
  *
  * Floating-point contract matches the HOF chain it replaces (and the
  * DuckDB oracle): sum of squares accumulated in element order, one
  * sqrt, then per-element division by the norm — bit-identical
  * results. A NULL element nulls the whole result (the HOF version
  * produced an array of NULLs; all-or-nothing is the saner contract
  * and the oracle tables carry no NULL elements). A zero vector yields
  * IEEE NaNs, same as the division it replaces.
  */
case class L2Normalize(child: Expression) extends ArrayDoubleUnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val norm = java.lang.Math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val vals = ctx.freshName("vals")
      val norm = ctx.freshName("norm")
      s"""
         |int $n = $a.numElements();
         |double[] $vals = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = $a.getDouble($i);
         |  $vals[$i] = $x;
         |  $s += $x * $x;
         |}
         |if (!${ev.isNull}) {
         |  double $norm = java.lang.Math.sqrt($s);
         |  for (int $i = 0; $i < $n; $i++) { $vals[$i] = $vals[$i] / $norm; }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  /** Column API for [[DotProduct]]; inputs are cast to array<double>. */
  def dotNative(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Column API for [[L2Normalize]]; input is cast to array<double>. */
  def normalizeNative(a: Column): Column =
    Bridge.column(L2Normalize(Bridge.expression(a.cast("array<double>"))))
}
