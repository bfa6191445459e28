package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKRewriteRule, TopKStrategy}

class TopKRewriteSpec extends SparkSpec {

  private def ensureRegistered(): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  private def windowTopK = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    core.Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  test("row_number<=k with rank dropped is rewritten to TopKPerGroup") {
    ensureRegistered()
    val df = windowTopK.drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
    // neither the window exec nor Spark's own WindowGroupLimit+sorts
    // should remain (note "WindowGroupLimit" contains "Window")
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
      "window machinery should be rewritten away:\n" + plan.take(2000))
    // and the rewrite preserves results exactly
    val got = df.collect().map(_.toSeq).toSet
    val want = windowTopK.drop("rn").queryExecution.analyzed // fresh plan w/o rule? same session; compare vs native API
    val native = plans.TopK.topKPerGroup(
      core.Tables.load(spark, sf, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .collect().map(_.toSeq).toSet
    assert(got === native)
  }

  test("rn === 1 (dedup-per-key idiom) is rewritten to TopKPerGroup k=1") {
    ensureRegistered()
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val df = core.Tables.load(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["),
      "window machinery should be rewritten away:\n" + plan.take(2000))
    val native = plans.TopK.topKPerGroup(
      core.Tables.load(spark, sf, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 1)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === native)
  }

  test("queries that keep the rank column are NOT rewritten") {
    ensureRegistered()
    val df = windowTopK // rn stays in the output
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(1500))
    assert(!plan.contains("TopKPerGroup"))
  }
}
