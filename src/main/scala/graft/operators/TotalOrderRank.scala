package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking — the library primitive behind
  * `q_ntile`. A global `Window.orderBy` with no PARTITION BY funnels
  * every row through ONE task (Spark logs the warning; at 100 TB it
  * simply doesn't run). This computes the same 1-based global rank in
  * parallel:
  *
  *  1. range-partition by the sort key (the parallel total-sort
  *     primitive, sampled bounds — survives skew);
  *  2. per-partition row counts (one row per partition) cumulated into
  *     partition OFFSETS with a tiny nPart-row window, broadcast back;
  *  3. per-partition `row_number` windows (parallel) + offset = the
  *     global rank.
  *
  * For a UNIQUE sort key the result is bit-equal to the
  * single-partition `row_number`/`rank` and independent of the
  * partition count (pinned by the 3-CPU verify probe). With ties,
  * rank assignment within the tie group follows partition placement —
  * supply a tiebreaker column for determinism, as every graft query
  * does.
  */
object TotalOrderRank {

  /** Adds `rankCol` (1-based global rank) ordered by `keys`. Appends
    * internal `_pid`/`_off`/`_n` columns are dropped; pass
    * `keepTotal = true` to also keep `_n` (the total row count) for
    * derived statistics (ntile, percent_rank, cume_dist).
    */
  def withGlobalRank(spark: SparkSession, df: DataFrame, keys: Seq[Column],
      rankCol: String, keepTotal: Boolean = false): DataFrame = {
    // materialize the range partitioning ONCE (eager localCheckpoint):
    // the offsets subtree and the ranked join are two consumers of
    // this exchange, and correctness requires they see the SAME
    // partition placement. Exchange reuse usually guarantees that, but
    // it is an optimization, not a contract — RangePartitioner's
    // sampled bounds incorporate the RDD id, so two independent
    // executions of the exchange could place a row differently and
    // corrupt every downstream rank. The checkpoint is the barrier a
    // consistent global rank inherently needs; its blocks die with the
    // returned plan's RDD.
    val sorted = df
      .repartitionByRange(spark.sparkContext.defaultParallelism, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val parts = sorted.groupBy("_pid").agg(cnt.as("_cnt"))
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("_off", coalesce(sum("_cnt").over(wOff), lit(0L)))
      .select("_pid", "_off")
    val wLocal = Window.partitionBy("_pid").orderBy(keys: _*)
    val ranked = sorted.join(broadcast(offsets), "_pid")
      .withColumn(rankCol, row_number().over(wLocal).cast("long") + col("_off"))
      .drop("_pid", "_off")
    // the 1-row total (and its crossJoin) only exists when asked for
    if (keepTotal) ranked.crossJoin(broadcast(parts.agg(sum("_cnt").as("_n"))))
    else ranked
  }

  /** ntile bucket from a global rank: the first n % k buckets hold
    * n/k + 1 rows, positional arithmetic only (matches SQL NTILE).
    * floor-of-double division is exact for counts < 2^53 and, unlike
    * integer DIV, cannot raise on the unreachable base=0 branch when
    * n < k (the `when` arm already covers every rank there).
    */
  def ntileFromRank(rank: Column, n: Column, k: Int): Column = {
    val base = floor(n / k).cast("long")
    val rem = n % k
    val cutoff = rem * (base + 1)
    when(rank <= cutoff, floor((rank - 1) / (base + 1)).cast("long") + 1)
      .otherwise(rem + floor((rank - 1 - cutoff) / base).cast("long") + 1)
  }


  /** percent_rank from a global rank over n rows (rank semantics equal
    * row_number under a unique key): (r-1)/(n-1) as double — the exact
    * arithmetic SQL engines use, so it hash-compares across engines.
    * n=1 is 0.0 (the SQL definition), not the 0/0 NaN the raw division
    * would produce.
    */
  def percentRankFromRank(rank: Column, n: Column): Column =
    when(n === 1, lit(0.0))
      .otherwise((rank - 1).cast("double") / (n - 1).cast("double"))
}
