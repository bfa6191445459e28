package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Resample

/** resampleByKey contract: the fused gap-fill form (2 shuffles, no
  * join) must equal the naive spine+join+window form, per key, and be
  * independent of input partitioning.
  */
class ResampleSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def naive(series: org.apache.spark.sql.DataFrame) = {
    // reference formulation: per-key spine from per-key bounds, left
    // join, last_value IGNORE NULLS window — the 4-shuffle shape the
    // operator exists to avoid
    val bounds = series.groupBy("k").agg(min("d").as("lo"), max("d").as("hi"))
    val spine = bounds.select(col("k"),
      explode(sequence(col("lo"), col("hi"))).as("d"))
    val w = Window.partitionBy("k").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(series, Seq("k", "d"), "left")
      .select(col("k"), col("d"), col("v").isNotNull.as("observed"),
        last("v", ignoreNulls = true).over(w).as("v_ffill"))
  }

  private val rows = Seq(
    // key "a": gaps of 2 and 3 days
    ("a", "2024-01-01", 1.0), ("a", "2024-01-03", 2.0), ("a", "2024-01-06", 3.0),
    // key "b": single observation (degenerate grid)
    ("b", "2024-02-10", 7.0),
    // key "c": adjacent observations (no gap — explode must not duplicate)
    ("c", "2024-03-01", 4.0), ("c", "2024-03-02", 5.0))

  test("gap-fill form equals spine+join form; grid is exactly [min,max] per key") {
    val series = rows.toDF("k", "ds", "v")
      .select(col("k"), col("ds").cast("date").as("d"), col("v"))
    val got = Resample.resampleByKey(series, "k", "d", "v")
    val want = naive(series)
    assert(got.count() === 6 + 1 + 2) // a: Jan 1..6, b: one day, c: two days
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // fill values land where expected
    val a = got.filter($"k" === "a").orderBy("d")
      .select($"v_ffill").as[Double].collect()
    assert(a.toSeq === Seq(1.0, 1.0, 2.0, 2.0, 2.0, 3.0))
  }

  test("result is independent of input partitioning") {
    val series = rows.toDF("k", "ds", "v")
      .select(col("k"), col("ds").cast("date").as("d"), col("v"))
    val p1 = Resample.resampleByKey(series.repartition(1), "k", "d", "v")
    val p7 = Resample.resampleByKey(series.repartition(7, col("v")), "k", "d", "v")
    assert(p1.exceptAll(p7).isEmpty && p7.exceptAll(p1).isEmpty)
  }

  test("interpolateByKey: exact values on the known grid, observed rows verbatim") {
    val series = rows.toDF("k", "ds", "v")
      .select(col("k"), col("ds").cast("date").as("d"), col("v"))
    val got = Resample.interpolateByKey(series, "k", "d", "v")
    // a: 1.0 @Jan1, gap Jan2 = 1 + (2-1)*1/2 = 1.5, 2.0 @Jan3,
    //    Jan4 = 2+1/3, Jan5 = 2+2/3, 3.0 @Jan6
    val a = got.filter($"k" === "a").orderBy("d")
      .select($"v_interp").as[Double].collect()
    assert(a.toSeq === Seq(1.0, 1.5, 2.0, 2.333333, 2.666667, 3.0))
    // degenerate single observation passes through
    val b = got.filter($"k" === "b").select($"v_interp").as[Double].collect()
    assert(b.toSeq === Seq(7.0))
    // observed rows always carry the input value verbatim
    val obs = got.filter($"observed").orderBy("k", "d")
      .select($"v_interp").as[Double].collect()
    assert(obs.toSeq === Seq(1.0, 2.0, 3.0, 7.0, 4.0, 5.0))
    // partition independence, like the ffill form
    val p7 = Resample.interpolateByKey(series.repartition(7, col("v")), "k", "d", "v")
    assert(got.exceptAll(p7).isEmpty && p7.exceptAll(got).isEmpty)
  }

  test("q_resample_by_key yields one row per (key, grid day) and starts observed") {
    val df = Resample.qResampleByKey(spark, sf).cache()
    try {
      assert(df.count() > 0)
      assert(df.groupBy("k", "d").count().filter($"count" > 1).isEmpty)
      // first grid row of every key is an observation (ffill never null)
      assert(df.filter($"total_ffill".isNull).isEmpty)
      val firsts = df.withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("d")))
        .filter($"rn" === 1)
      assert(firsts.filter(!$"observed").isEmpty)
    } finally { df.unpersist(); () }
  }
}
