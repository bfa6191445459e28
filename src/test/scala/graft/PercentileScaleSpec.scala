package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational3

/** Scale modes for the exact-percentile consumers (SURVEY §5):
  * q_winsorize / q_outliers / q_rfm default to exact `percentile()`
  * (the oracle-checked form) whose single aggregation buffer holds
  * every group value — executor-OOM at 100×. The approx mode
  * (`exactBoundaries = false`) swaps the boundary aggregates for the
  * bounded-memory `approx_percentile(..., 10000)` sketch. These
  * specs pin that the swap moves results only within the sketch's
  * documented rank-error band — i.e. the approx mode is a faithful
  * stand-in for the statistics these operators exist to compute, not
  * a different operator.
  */
class PercentileScaleSpec extends SparkSpec {

  // sf0.001 lineitem is ~6k rows over 3 returnflag groups; with
  // accuracy 10000 the sketch's rank error bound is N/10000 ≈ 1 row
  // per group at this SF, so tolerances below are intentionally a few
  // rows wide of that bound (ties at the threshold can move too).
  private def tol(n: Long): Long = math.max(4L, n / 1000L)

  test("winsorize approx mode: clip counts stay within sketch rank error") {
    val exact = Relational3.qWinsorize(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Relational3.qWinsorize(spark, sf, exactBoundaries = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet, "same groups in both modes")
    exact.foreach { case (g, e) =>
      val a = approx(g)
      val n = e.getLong(1)
      assert(a.getLong(1) === n, s"group $g row count mode-independent")
      assert(math.abs(a.getLong(3) - e.getLong(3)) <= tol(n),
        s"group $g low-clip count drift ${a.getLong(3)} vs ${e.getLong(3)}")
      assert(math.abs(a.getLong(4) - e.getLong(4)) <= tol(n),
        s"group $g high-clip count drift ${a.getLong(4)} vs ${e.getLong(4)}")
      // clipped sum moves by at most (rows that changed clip state) ×
      // (boundary shift); a 1 % relative band is far outside what the
      // sketch can move at p01/p99
      assert(math.abs(a.getDouble(2) - e.getDouble(2)) <= 0.01 * math.abs(e.getDouble(2)),
        s"group $g clipped sum within 1% of exact")
    }
  }

  test("outliers approx mode: flag counts stay within sketch rank error") {
    val exact = Relational3.qOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Relational3.qOutliers(spark, sf, exactBoundaries = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (g, e) =>
      val a = approx(g)
      val n = e.getLong(1)
      assert(a.getLong(1) === n)
      // med/MAD are rank statistics: sketch keeps them within 0.5 %
      assert(math.abs(a.getDouble(2) - e.getDouble(2)) <= 0.005 * e.getDouble(2),
        s"group $g median drift")
      assert(math.abs(a.getDouble(3) - e.getDouble(3)) <= 0.005 * e.getDouble(3),
        s"group $g MAD drift")
      // the 3·MAD threshold sits in the tail, where a tiny threshold
      // shift crosses few rows — 1 % of the group bounds it generously
      assert(math.abs(a.getLong(4) - e.getLong(4)) <= math.max(4L, n / 100L),
        s"group $g outlier count drift ${a.getLong(4)} vs ${e.getLong(4)}")
    }
  }

  test("rfm approx mode: scores change only near quartile cuts") {
    val exact = Relational3.qRfm(spark, sf)
      .select("o_custkey", "r_score", "f_score", "m_score")
    val approx = Relational3.qRfm(spark, sf, exactBoundaries = false)
      .select(col("o_custkey"),
        col("r_score").as("ra"), col("f_score").as("fa"), col("m_score").as("ma"))
    val joined = exact.join(approx, "o_custkey")
    val total = joined.count()
    val changed = joined.filter(
      col("r_score") =!= col("ra") || col("f_score") =!= col("fa") ||
        col("m_score") =!= col("ma")).count()
    assert(total > 0)
    // only customers inside the sketch's rank-error band of a cut can
    // move, and integral metrics (freq) tie heavily at the cut — 5 %
    // is a loose ceiling for accuracy 10000 at any N
    assert(changed.toDouble / total <= 0.05,
      s"$changed of $total customers changed score in approx mode")
  }
}
