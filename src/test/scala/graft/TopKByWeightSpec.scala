package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.plans.{GraftExtensions, TopKByWeight}

/** TypedImperativeAggregate contract pins for TopKByWeight: partial
  * update → serialize → deserialize → merge in BOTH orders must yield
  * the same eval (commutative merge is what makes a distributed
  * aggregate correct under any shuffle plan), plus end-to-end
  * partition-independence and SQL availability via GraftExtensions.
  */
class TopKByWeightSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val agg = TopKByWeight(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, DoubleType, nullable = true),
    Literal(3))

  private def partial(rows: Seq[(Long, Double)]) =
    rows.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
      agg.update(b, InternalRow(r._1, r._2))
    }

  private def evalItems(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Seq[Long] =
    agg.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq

  test("merge order does not matter; ties break to the smaller item; nulls skipped") {
    val rows: Seq[(Long, Double)] =
      Seq((1L, 5.0), (2L, 7.0), (3L, 5.0), (4L, 1.0), (5L, 9.0), (6L, 5.0))
    // two different partition splits, each merged in both orders,
    // always through the wire format (serialize/deserialize)
    for (cut <- Seq(1, 3, 5)) {
      val (l, r) = rows.splitAt(cut)
      def thaw(rs: Seq[(Long, Double)]) = agg.deserialize(agg.serialize(partial(rs)))
      val ab = agg.merge(thaw(l), thaw(r))
      val ba = agg.merge(thaw(r), thaw(l))
      // top-3 by (weight desc, item asc): 5 (9.0), 2 (7.0), then the
      // 5.0 three-way tie resolves to item 1
      assert(evalItems(ab) === Seq(5L, 2L, 1L), s"cut=$cut")
      assert(evalItems(ba) === Seq(5L, 2L, 1L), s"cut=$cut")
    }
    // null item / null weight contribute nothing
    val b = partial(Seq((9L, 2.0)))
    agg.update(b, InternalRow(null, 3.0))
    agg.update(b, InternalRow(7L, null))
    assert(evalItems(b) === Seq(9L))
  }

  test("buffer stays bounded at k and survives the wire format") {
    val big = (1L to 1000L).map(i => (i, (i % 97).toDouble))
    val buf = partial(big)
    assert(buf.size === 3)
    assert(agg.serialize(buf).length === 4 + 3 * 16)
    assert(evalItems(agg.deserialize(agg.serialize(buf))) ===
      evalItems(buf))
  }

  test("end-to-end result is independent of partitioning and matches a window top-k") {
    val data = (1L to 500L).map(i => ((i % 7).toString, i, ((i * 37) % 101).toDouble))
    val df = data.toDF("g", "item", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(TopKByWeight.topkBy(col("item"), col("w"), 5).as("topk"))
    val a = run(df.repartition(1)).orderBy("g").as[(String, Seq[Long])].collect()
    val b = run(df.repartition(13, col("w"))).orderBy("g").as[(String, Seq[Long])].collect()
    assert(a.toSeq === b.toSeq)
    // oracle: row_number over (w desc, item asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("w").desc, col("item"))
    val expect = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("g").agg(collect_list(struct(col("rn"), col("item"))).as("xs"))
      .select(col("g"), expr("transform(array_sort(xs), x -> x.item)").as("topk"))
      .orderBy("g").as[(String, Seq[Long])].collect()
    assert(a.toSeq === expect.toSeq)
  }

  test("graft_topk_by is callable from SQL via GraftExtensions") {
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      val got = s.sql(
        """SELECT graft_topk_by(x, wt, 2) AS topk FROM VALUES
          |  (1L, 1.0D), (2L, 5.0D), (3L, 3.0D), (4L, 5.0D) AS t(x, wt)""".stripMargin)
        .head.getSeq[Long](0)
      assert(got === Seq(2L, 4L, 3L).take(2))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
