package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side layout helpers (SURVEY.md §2.7).
  *
  * At 100 TB the cheapest scan is the one that never happens: after
  * partition pruning, the next IO lever is ROW-GROUP pruning — parquet
  * stores min/max statistics per row group, and a range predicate on a
  * column the file is sorted by skips every group whose range misses.
  * An unsorted fact table interleaves all values everywhere, so every
  * group overlaps every predicate and nothing skips. Sorting is paid
  * once at write time, on the writer's existing partitioning (
  * `sortWithinPartitions` — a narrow local sort, no shuffle).
  */
object Sinks {

  /** Parquet write clustered for range-predicate IO pruning: rows are
    * sorted within each output file by `cols`, so row-group min/max
    * stats become selective for filters on those columns. Pair with
    * `partitionBy` for the coarse level (directory pruning) and this
    * for the fine level (row-group skipping inside surviving files).
    * `rowGroupBytes` trades skip granularity against scan efficiency —
    * smaller groups skip more precisely but cost more footer overhead.
    *
    * Sort-key type caveats (measured on Spark 4.1): TIMESTAMP_NTZ
    * predicates are never converted to parquet filter predicates (the
    * scan lists them as PushedFilters but no row group is skipped),
    * and INT96-written timestamps carry no usable stats — store
    * range-scan keys as TIMESTAMP_LTZ with
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (every
    * graft session sets it), or as date/long. Longs and dates prune
    * unconditionally.
    */
  def writeSorted(df: DataFrame, path: String, cols: Seq[Column],
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.sortWithinPartitions(cols: _*)
      .write
      .option("parquet.block.size", rowGroupBytes)
      .mode("overwrite")
      .parquet(path)
}
