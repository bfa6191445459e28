package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object operators {

  type Query = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    core.Tables.load(spark, dir, name)

  /** Money/measure sums are computed over DECIMAL(18,4) (exact,
    * order-independent) and only then cast to DOUBLE, so the result is
    * bit-identical regardless of partitioning / aggregation order —
    * and identical to the DuckDB oracle using the same cast chain.
    * Plain sum(double) would drift in the last ulp with partition
    * count, which is both a correctness-gate hazard and a real
    * reproducibility concern at 100 TB.
    */
  def sumMoney(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact average with the same determinism property. */
  def avgMoney(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(lit(1)))

  def cnt: Column = count(lit(1)).cast("long")

  /** Fan out an under-parallel scan without paying for it at scale:
    * repartition ONLY when the planned scan yields fewer partitions
    * than the session parallelism (the single-file test tables → one
    * split → per-row kernels run on one core). On a real cluster the
    * scan already produces thousands of splits, so an unconditional
    * repartition would shuffle the entire corpus — text payloads and
    * all — for nothing; this guard makes it a no-op there. Inspecting
    * `df.rdd.getNumPartitions` compiles the plan but runs no job.
    */
  def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
