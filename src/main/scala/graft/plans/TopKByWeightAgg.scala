package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** From-scratch mergeable aggregate (the one extension station the
  * repo's tour lacked): a bounded top-k-by-weight, written directly
  * against Spark's TypedImperativeAggregate contract — per-partition
  * partial buffers, partial merge, binary buffer serialization between
  * stages, final eval. This is what you write when the built-in sketch
  * family (HLL / CMS / KLL / freqItems — all exercised elsewhere)
  * doesn't have your statistic.
  *
  * Semantics: over input rows (item BIGINT, weight DOUBLE), keep the k
  * items with the largest weight — ties broken by smaller item — and
  * emit them strongest-first as array<bigint>. Deterministic for any
  * partitioning / merge order because the (weight desc, item asc)
  * order is total, which the spec pins by merging partials both ways.
  *
  * Scale shape: the buffer is a size-k min-heap, so state is O(k) per
  * group regardless of group size, updates are O(log k), and partial
  * merge is O(k log k) — the map-side combine does almost all the work
  * and the shuffle carries ≤k pairs per (partition, group). This is
  * the same reason the reference's reducer-side sort (mapreduce.c
  * do_sort_reduce) scales: bounded per-key state, not per-row.
  */
case class TopKByWeight(
    item: Expression,
    weight: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // "weaker is greater": the PriorityQueue dequeues its max, so ranking
  // (smaller weight, then larger item) as greater makes the head the
  // eviction candidate
  private val weakestFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk_by: k must be a literal")
    val v = kExpr.eval().asInstanceOf[Number].intValue()
    require(v > 0, s"graft_topk_by: k must be positive, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(item, weight, kExpr)
  override def checkInputDataTypes(): TypeCheckResult = {
    // AbstractDataType (ExpectsInputTypes' vocabulary) is private[sql],
    // so the type contract is enforced here instead
    val want = Seq(LongType, DoubleType, IntegerType)
    val got = children.map(_.dataType)
    if (got == want) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_topk_by expects (BIGINT item, DOUBLE weight, INT k), got (${got.mkString(", ")})")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk_by"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(weakestFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (weakestFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val it = item.eval(input)
    val w = weight.eval(input)
    if (it != null && w != null)
      add(buf, (w.asInstanceOf[Double], it.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(weakestFirst).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (w, i) => bb.putDouble(w); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByWeight =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByWeight =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0), weight = newChildren(1), kExpr = newChildren(2))
}

object TopKByWeight {
  /** Column API: top-k `item`s by `weight`, strongest first. */
  def topkBy(item: Column, weight: Column, k: Int): Column =
    Bridge.column(TopKByWeight(
      Bridge.expression(item.cast("long")),
      Bridge.expression(weight.cast("double")),
      Literal(k)).toAggregateExpression())
}
