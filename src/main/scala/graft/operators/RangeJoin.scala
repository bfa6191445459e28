package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: each probe row joined to every interval
  * containing its timestamp — `probe.t >= i.start AND probe.t < i.end`
  * with no equi-key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoop (or a
  * cartesian product), O(|I|·|P|) — off the table at 100 TB. This
  * implementation rewrites it as an equi-join on a time BIN: intervals
  * explode into the fixed-width bins they overlap, probes map to their
  * single bin, the join keys on the bin, and the exact range predicate
  * runs as a post-join filter inside the same stage. Cost is one
  * shuffle of |P| + |I|·(span/bin) rows, partitioned by bin. Partition
  * load tracks ROW DENSITY per bin, not wall-clock: a burst that packs
  * much of |P| into one bin still makes a hot partition — salt the bin
  * key (bin, hash(row)%S) for bursty probes. Pick `binSeconds` ≈ the
  * typical interval width (each interval then lands in ≤ 2–3 bins).
  */
object RangeJoin {

  /** Join `probe` rows into `intervals` over `[start, end)`.
    * Output: one row per (interval, contained probe row) pair with
    * columns `_id` (interval id), `_t` (probe time) and the named
    * probe payload columns. NULL times/bounds never match, like the
    * inequality join this replaces.
    */
  def rangeJoin(intervals: DataFrame, intervalId: Column, start: Column, end: Column,
      probe: DataFrame, probeTime: Column, probePayload: Seq[(String, Column)],
      binSeconds: Long, maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def binOf(c: Column) = floor(unix_timestamp(c) / binSeconds.toDouble).cast("long")
    // unix_timestamp floors to the second, so a probe inside [s, e) can
    // share e's bin even though t < e — the end bin is inclusive here
    // and the exact predicate below culls the overshoot.
    // fail fast on dirty bounds: ONE interval parsed as year 9999
    // would otherwise explode into ~10^8 bin rows inside one task.
    // The guard lives inside the sequence bound so column pruning
    // can't eliminate it.
    val startBin = binOf(col("_s"))
    val endBin = binOf(col("_e"))
    val guardedEnd = when(endBin - startBin >= maxBinsPerInterval.toLong,
      raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxBinsPerInterval bins of ${binSeconds}s (id="),
        col("_id").cast("string"),
        lit(") — widen binSeconds or clean the bounds")))).otherwise(endBin)
    val iv = intervals
      .select(intervalId.as("_id"), start.as("_s"), end.as("_e"))
      .filter(col("_s").isNotNull && col("_e").isNotNull && col("_s") < col("_e"))
      .withColumn("_bin", explode(sequence(startBin, guardedEnd.cast("long"))))
    val p = probe
      .select((probeTime.as("_t") +: probePayload.map { case (n, c) => c.as(n) }): _*)
      .filter(col("_t").isNotNull)
      .withColumn("_pbin", binOf(col("_t")))
    // a probe row has exactly ONE bin, so no (interval, probe) pair can
    // join twice even though the interval spans several bins
    p.join(iv, p("_pbin") === iv("_bin") &&
        col("_t") >= col("_s") && col("_t") < col("_e"))
      .drop("_pbin", "_bin", "_s", "_e")
  }

  /** Incident-window analysis: for every high-value purchase, the
    * count and total value of ALL events (any user) inside the
    * ±15-minute window around it. Pure range join — no equi-key.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val windows = ev
      .filter(col("event_type") === "purchase" && col("value") > 200.0)
      .select(col("event_id").as("win_id"),
        (col("ts") - expr("INTERVAL 15 MINUTES")).as("w_start"),
        (col("ts") + expr("INTERVAL 15 MINUTES")).as("w_end"))
    rangeJoin(
      windows, col("win_id"), col("w_start"), col("w_end"),
      ev, col("ts"), Seq("value" -> col("value")),
      binSeconds = 900L)
      .groupBy(col("_id").as("win_id"))
      .agg(cnt.as("n_events"), sumMoney(col("value")).as("total_value"))
  }
}
