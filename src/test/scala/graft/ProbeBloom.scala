package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-index measured constants (SURVEY §5's artifact-per-claim
  * rule): what the per-file bloom sidecars COST at write time and BUY
  * at read time, on the layout they exist for — a 10⁶-row table whose
  * key is hash-scattered across 32 files, so every file's zone-map
  * interval spans the whole key domain and an equality probe without
  * the index opens all 32.
  *
  * MEASURED (local[32], 1,000,000 rows × (k BIGINT, payload STRING),
  * 32 scattered files of ~31k rows, fpp 0.001, write path warmed):
  *
  *   append  undeclared     1.13 s   (stage + stats + manifest)
  *   append  declared       1.53 s   (+0.40 s = the one extra
  *                                    groupBy(file) bloom job: 1.35×,
  *                                    amortized over every later probe)
  *   backfill (setBloomIndex
  *     over the snapshot)   0.55 s   (one distributed pass, 32 files)
  *   sidecar bytes          1.82 MB total = 57 KB/file = 4.9% of the
  *                          37.5 MB data (14.4 bits/key at fpp 0.001;
  *                          the RATIO shrinks with row width — this
  *                          probe's rows are 40 B, a real corpus row
  *                          is KBs, pushing it well under 1%)
  *   filesForPoints probe   17.7 ms  driver-side (33 sidecar reads +
  *                          mightContain tests; kept 1/33)
  *   point SELECT k = x     0.33 s → 0.08 s  (readIndexed + filter;
  *                          numFiles 33 → 1, 4.1× wall — the gap is
  *                          pure scan avoidance and widens linearly
  *                          with file count: at 100 TB / 10⁵ files the
  *                          unindexed probe reads the table, the
  *                          indexed one reads ~fpp·files + matches)
  *
  * READING: the index costs ~5% storage on these deliberately tiny
  * rows (sub-1% on realistic KB rows) and ~35% extra write time on
  * the batch that stages it, and turns an unclustered point lookup
  * from O(table) into O(matching files) — the trade every
  * Delta bloom-index deployment makes. The write overhead is ONE
  * extra aggregation whose shuffle carries file-count × bloom-size
  * bytes (not rows); the probe cost is driver-side sidecar reads of
  * the ZONE-MAP SURVIVORS only, so a clustered-plus-indexed layout
  * pays even less.
  *
  * Run: `tools/runmain.sh graft.ProbeBloom` (self-contained synthetic
  * table under ./tmp/bloomprobe, deleted on exit).
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-probe-bloom")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.VersionedTable

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val root = java.nio.file.Paths.get("tmp/bloomprobe")
    def wipe(): Unit = if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(root))(
        _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
    }
    wipe()

    val n = 1000000L
    // hash-scattered: each of the 32 files spans ~the full key domain
    def batch(): DataFrame = spark.range(0, n).select(col("id").as("k"),
      concat(lit("payload-"), md5(col("id").cast("string"))).as("payload"))
      .repartition(32, col("payload"))

    // 0. warm the write path (codegen, parquet writers, JIT) so the
    // undeclared-vs-declared compare below is not a cold-start compare
    val tW = s"$root/warm"
    VersionedTable.overwrite(spark, tW, batch())

    // 1. write overhead: the same 1M-row append, undeclared vs declared
    val tU = s"$root/undeclared"
    VersionedTable.overwrite(spark, tU, batch().limit(1))
    val (_, appendPlain) = timed(VersionedTable.append(spark, tU, batch()))

    val tD = s"$root/declared"
    VersionedTable.overwrite(spark, tD, batch().limit(1))
    VersionedTable.setBloomIndex(spark, tD, Seq(("k", 0.001)))
    val (_, appendBloom) = timed(VersionedTable.append(spark, tD, batch()))
    println(f"append undeclared: $appendPlain%.2f s   declared: $appendBloom%.2f s" +
      f"   overhead ${appendBloom / appendPlain}%.2fx")

    // 2. backfill cost: declare over the already-written snapshot
    val (_, backfill) = timed(
      VersionedTable.setBloomIndex(spark, tU, Seq(("k", 0.001))))
    println(f"backfill over the 1M snapshot: $backfill%.2f s")

    // 3. sidecar vs data bytes
    import scala.jdk.CollectionConverters._
    val (side, data) = scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(tD))) { w =>
      val fs = w.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toSeq
      (fs.filter(_.toString.endsWith(".bloom")).map(java.nio.file.Files.size).sum,
        fs.filter(_.toString.endsWith(".parquet")).map(java.nio.file.Files.size).sum)
    }
    println(f"sidecars ${side / 1e6}%.2f MB over data ${data / 1e6}%.2f MB " +
      f"(${100.0 * side / data}%.2f%%)")

    // 4. probe: driver-side file selection, then the full read
    val key = 123457L
    val ((kept, total), probeS) = timed(
      VersionedTable.filesForPoints(tD, "k", Seq(key)))
    println(f"filesForPoints: kept ${kept.size}/$total in ${probeS * 1000}%.1f ms")

    def lookup(t: String): (Long, Double) = {
      val df = VersionedTable.readIndexed(spark, t).filter(col("k") === key)
      val (rows, s) = timed(df.collect())
      require(rows.length == 1 && rows.head.getLong(0) == key)
      (rows.length.toLong, s)
    }
    // warm both paths once (codegen + footer caches), then measure
    lookup(tD); lookup(tU)
    VersionedTable.setBloomIndex(spark, tU, Nil) // undeclared baseline again
    val (_, coldU) = lookup(tU)
    val (_, coldD) = lookup(tD)
    println(f"point SELECT: undeclared $coldU%.2f s   declared $coldD%.2f s" +
      f"   (${coldU / coldD}%.1fx)")

    wipe()
    spark.stop()
  }
}
