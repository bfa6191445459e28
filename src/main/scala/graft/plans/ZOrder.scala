package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.{Bridge, LongBinaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two key columns — the multi-
  * dimensional clustering key behind [[graft.sources.Sinks.writeZOrdered]].
  *
  * A table sorted by (a, b) prunes row groups only for predicates on
  * `a`; sorted by the Z-value of (a, b) it clusters BOTH dimensions,
  * so parquet min/max stats become selective for range predicates on
  * either column — the lakehouse OPTIMIZE-ZORDER layout, done with
  * nothing but a codegen expression and a range repartition.
  *
  * Bit semantics: the low 32 bits of each operand are spread to even
  * (left) / odd (right) positions of the 64-bit result via the
  * standard mask-doubling chain. Keys are expected in [0, 2^32) —
  * surrogate ids and dictionary ranks are; anything wider should be
  * rank-compressed first (the z-curve only needs ORDER, not values) —
  * [[graft.sources.VersionedTableOps.optimize]]'s zorder mode does
  * exactly that, equi-depth-binning arbitrary numeric/date/decimal
  * columns before interleaving.
  */
case class ZValue(left: Expression, right: Expression)
    extends LongBinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 32 bits of x to the even bit positions. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 64-bit Morton code: a on even bits, b on odd bits. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column form for DataFrame pipelines. */
  def zvalue(a: Column, b: Column): Column =
    Bridge.column(ZValue(Bridge.expression(a), Bridge.expression(b)))
}
