package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopK

class TopKSpec extends SparkSpec {

  test("native top-k equals the window row_number formulation") {
    val orders = core.Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val native = TopK.topKPerGroup(orders, Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(native === windowed)
  }

  test("physical plan uses TopKPerGroupExec, not a window sort") {
    val df = operators.Relational2.qTopkNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(1500))
    assert(!plan.contains("Window"), "should not fall back to a window")
  }

  test("k larger than every group returns all rows") {
    val nation = core.Tables.load(spark, sf, "nation")
    val native = TopK.topKPerGroup(nation, Seq("n_regionkey"),
      Seq("n_nationkey" -> true), 1000)
    assert(native.count() === nation.count())
  }

  test("ties at the k boundary resolve by the total order") {
    import TestSpark.spark.implicits._
    val df = Seq(("a", 1, 10.0), ("a", 2, 10.0), ("a", 3, 10.0), ("a", 4, 5.0))
      .toDF("g", "id", "v")
    val got = TopK.topKPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => r.getInt(1)).sorted
    assert(got.toSeq === Seq(1, 2)) // ids 1,2 beat 3 on the id tiebreak
  }
}
