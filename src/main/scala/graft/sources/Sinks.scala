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

  /** Parquet write clustered on TWO dimensions at once: rows are
    * range-partitioned and sorted by the Morton interleave of the two
    * key columns ([[graft.plans.ZValue]]), so row-group min/max stats
    * prune range predicates on EITHER column — the lakehouse
    * OPTIMIZE-ZORDER layout. A single-column sort makes the second
    * dimension uniformly interleaved (nothing skips); the z-curve
    * keeps both locally dense at the cost of neither being perfectly
    * sorted. The range repartition is the one shuffle any re-layout
    * pays; the per-partition sort is narrow.
    *
    * Both keys are first scaled to equal-width 16-bit buckets from
    * their observed [min, max] — interleaving RAW values hands the
    * wider-ranged column all the significant bits and the narrow
    * column never prunes (measured: partkey ~2000 values × suppkey
    * ~100 → zero suppkey skipping without scaling). The min/max agg is
    * one tiny job whose 4-value result joins the plan as literals —
    * the centroid-handoff pattern, not a data collect. Bucket math is
    * floor((v-lo)·2^16 / span) in DOUBLE — bit-exact for spans below
    * ~2^37 (the scaled numerator stays under 2^53); beyond that the
    * boundaries can wobble by a value but stay MONOTONE, which is all
    * a clustering key needs. Rank-compress wider, float, or
    * heavily-skewed keys first (the curve needs order, not values —
    * and min/max scaling keeps skewed value clusters in few buckets,
    * where a true rank would spread them). An empty input degenerates
    * to a plain empty write.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions.{floor, lit, max, min}
    val r = df.agg(min(a.cast("long")), max(a.cast("long")),
      min(b.cast("long")), max(b.cast("long"))).collect()(0)
    val sorted =
      if (r.isNullAt(0)) df // no rows (or all-null keys): nothing to cluster
      else {
        def bucket(c: Column, lo: Long, hi: Long): Column = {
          val span = math.max(hi - lo + 1, 1L)
          floor((c.cast("long") - lit(lo)) * lit(65536L) / lit(span)).cast("long")
        }
        val z = graft.plans.ZValue.zvalue(
          bucket(a, r.getLong(0), r.getLong(1)), bucket(b, r.getLong(2), r.getLong(3)))
        df.repartitionByRange(z).sortWithinPartitions(z)
      }
    sorted.write
      .option("parquet.block.size", rowGroupBytes)
      .mode("overwrite")
      .parquet(path)
  }

  /** Small-file compaction — the table-maintenance job every
    * streaming/append-heavy lakehouse table needs: micro-batch
    * ingest and per-key appends leave thousands of KB-sized files,
    * and at 100 TB the scan cost becomes footer-and-open dominated
    * (one task per tiny file) instead of IO dominated.
    *
    * Partition-aware: each LEAF directory holding parquet files (a
    * `k=v` partition, or the root for a flat table) is compacted
    * independently — the directory layout, and with it every
    * reader's partition pruning, is preserved, and leaves are sized
    * from their ACTUAL on-disk bytes (compressed), not a row-count
    * guess. Data is hash-redistributed (`repartition(n)`) so output
    * files are even regardless of how skewed the input files were;
    * optional `sortBy` re-sorts within files so compaction restores
    * the row-group pruning appends destroyed.
    *
    * Each leaf is rewritten to a sibling temp dir then swapped via
    * two renames. The swap is NOT atomic — a reader racing the
    * rename can see the leaf briefly missing (a real lakehouse table
    * format commits snapshots instead; this is the plain-filesystem
    * trade, stated rather than papered over). A crash between the
    * renames is recoverable: the next call restores a stranded
    * `.compact-old` before doing anything else. Returns
    * (filesBefore, filesAfter) summed over leaves.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[Column] = Nil): (Int, Int) = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    def ls(p: Path): Seq[Path] =
      Using.resource(Files.list(p))(_.iterator().asScala.toSeq)
    def rmDir(p: Path): Unit =
      Using.resource(Files.walk(p))(_.iterator().asScala.toSeq.reverse.foreach(Files.delete))
    // crash recovery from a previous run that died mid-swap: restore
    // (or discard) stranded swap dirs BEFORE they can be mistaken for
    // partitions of the tree walk
    def recover(p: Path): Unit = {
      for (c <- ls(p) if c.getFileName.toString.endsWith(".compact-old")) {
        val orig = Paths.get(c.toString.stripSuffix(".compact-old"))
        if (!Files.exists(orig)) Files.move(c, orig) // died between renames
        else rmDir(c) // died after the second rename, before cleanup
      }
      for (c <- ls(p) if c.getFileName.toString.endsWith(".compact-tmp"))
        rmDir(c) // incomplete rewrite, discard
    }
    // leaves: directories that directly hold parquet files
    def leaves(p: Path): Seq[Path] = {
      recover(p)
      val children = ls(p)
      if (children.exists(_.getFileName.toString.endsWith(".parquet"))) Seq(p)
      else children.filter(Files.isDirectory(_)).flatMap(leaves)
    }
    // the root itself may be stranded from a crash between renames
    val rootOld = Paths.get(path + ".compact-old")
    if (!Files.exists(Paths.get(path)) && Files.exists(rootOld))
      Files.move(rootOld, Paths.get(path))
    var beforeTotal = 0
    var afterTotal = 0
    for (leaf <- leaves(Paths.get(path))) {
      val files = ls(leaf).filter(_.getFileName.toString.endsWith(".parquet"))
      val nOut = math.max(1,
        math.ceil(files.map(Files.size).sum.toDouble / targetBytes).toInt)
      val df = spark.read.parquet(leaf.toString)
      val redistributed = df.repartition(nOut)
      val clustered =
        if (sortBy.isEmpty) redistributed else redistributed.sortWithinPartitions(sortBy: _*)
      val tmp = Paths.get(leaf.toString + ".compact-tmp")
      clustered.write.mode("overwrite").parquet(tmp.toString)
      val old = Paths.get(leaf.toString + ".compact-old")
      Files.move(leaf, old)
      Files.move(tmp, leaf)
      rmDir(old)
      beforeTotal += files.size
      afterTotal += ls(leaf).count(_.getFileName.toString.endsWith(".parquet"))
    }
    (beforeTotal, afterTotal)
  }
}
