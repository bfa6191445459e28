package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{SparkSession}

/** Segmented (per-key) time-series resampling with forward-fill — the
  * partitioned generalization of ComplexTypes.qResample: one series per
  * customer / sensor / symbol instead of one global series.
  *
  * Scale design: the naive shape (per-key spine from per-key min/max,
  * left join, windowed fill) costs FOUR shuffles (grain agg, bounds agg,
  * spine⋈series join, fill window). Here the spine, join and fill are
  * fused into a single gap-fill pass: lead() gives each observation its
  * successor's timestamp, and exploding sequence(d, next_d - step, step)
  * emits exactly the grid rows that observation is responsible for, with
  * the value already "carried" — TWO shuffles total (the grain aggregate
  * and one window over partitionBy(key)), no join, no global window.
  * Each key's window partition is its own observation count (bounded by
  * its date range at the chosen grain), so at 100 TB the work
  * distributes across keys; nothing single-partition anywhere.
  */
object Resample {

  /** Re-grid `series` — one row per (key, d) observation — onto each
    * key's complete [min(d), max(d)] grid at `step`, carrying the last
    * observed `v` forward across gaps. Output: (key, d, observed,
    * s"${v}_ffill"). Precondition: (key, d) unique (an upstream groupBy
    * grain aggregate guarantees this).
    */
  def resampleByKey(series: DataFrame, key: String, d: String, v: String,
      step: String = "1 day"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(d)
    series
      .withColumn("__next_d", lead(col(d), 1).over(w))
      // the last observation owns exactly its own grid point; earlier
      // ones own [d, next_d) — adjacent observations explode to a
      // single row, so total output = grid size, never more
      .withColumn("__grid",
        when(col("__next_d").isNull, array(col(d)))
          .otherwise(sequence(col(d),
            col("__next_d") - expr(s"INTERVAL $step"), expr(s"INTERVAL $step"))))
      .select(col(key), col(d).as("__obs_d"), col(v),
        explode(col("__grid")).as("__grid_d"))
      .select(col(key), col("__grid_d").as(d),
        (col("__grid_d") === col("__obs_d")).as("observed"),
        col(v).as(s"${v}_ffill"))
  }

  /** Per-priority daily order totals, forward-filled onto each
    * priority's own complete daily grid.
    */
  def qResampleByKey(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("k"), col("o_orderdate").cast("date").as("d"))
      .agg(sumMoney(col("o_totalprice")).as("total"))
    resampleByKey(daily, "k", "d", "total")
  }

  /** LINEAR interpolation onto each key's daily grid — the gap-fill
    * sibling of [[resampleByKey]] for quantities where carrying the
    * last value forward is wrong (sensor readings, prices): a missing
    * day between observations at d₀→v₀ and d₁→v₁ gets
    * v₀ + (v₁−v₀)·(d−d₀)/(d₁−d₀). Same fused two-shuffle shape as
    * resampleByKey (lead + sequence explode, no spine join, no global
    * window); daily grain only (the fraction is a datediff ratio).
    * The arithmetic is one fixed IEEE op chain (sub, int-ratio
    * divide, mul, add — identical in the oracle) so results are
    * engine-exact; rounded to 6 at the output edge like the cosine
    * paths. Observed grid points emit their value verbatim.
    */
  def interpolateByKey(series: DataFrame, key: String, d: String,
      v: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(d)
    val step = "1 day"
    series
      .withColumn("__next_d", lead(col(d), 1).over(w))
      .withColumn("__next_v", lead(col(v), 1).over(w))
      .withColumn("__grid",
        when(col("__next_d").isNull, array(col(d)))
          .otherwise(sequence(col(d),
            col("__next_d") - expr(s"INTERVAL $step"), expr(s"INTERVAL $step"))))
      .select(col(key), col(d).as("__obs_d"), col(v), col("__next_d"), col("__next_v"),
        explode(col("__grid")).as("__grid_d"))
      .select(col(key), col("__grid_d").as(d),
        (col("__grid_d") === col("__obs_d")).as("observed"),
        round(when(col("__grid_d") === col("__obs_d"), col(v))
          .otherwise(col(v) + (col("__next_v") - col(v)) *
            (datediff(col("__grid_d"), col("__obs_d")).cast("double") /
              datediff(col("__next_d"), col("__obs_d")).cast("double"))), 6)
          .as(s"${v}_interp"))
  }

  /** Per-user daily event-value totals, linearly interpolated across
    * each user's missing days.
    */
  def qInterpolate(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .groupBy(col("user_id").as("k"), col("ts").cast("date").as("d"))
      .agg(sumMoney(col("value")).as("total"))
    interpolateByKey(daily, "k", "d", "total")
  }
}
