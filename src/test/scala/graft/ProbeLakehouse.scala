package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Driver-side cost of the lakehouse metadata layer vs SNAPSHOT FILE
  * COUNT — the scaling axis every O(files) claim in SURVEY §2.7 rides
  * on (manifest reads, zone-map probes, metadata COUNT(*), history,
  * commit publish). A 100 TB table is ~100k × 1 GiB files; this probe
  * measures the per-file driver cost directly so that claim is a
  * multiplication, not an assertion.
  *
  * Run: `sbt "Test/runMain graft.ProbeLakehouse"` (fast, driver-bound;
  * the data itself is tiny — file COUNT is the variable, so each
  * append stages many small files via repartition).
  */
object ProbeLakehouse {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timedMs(label: String, reps: Int = 3)(f: => Any): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[probe] $label median=${ts(reps / 2)}%.1f ms")
      ts(reps / 2)
    }

    for (nFiles <- Seq(100, 1000, 3000)) {
      val t = java.nio.file.Files
        .createTempDirectory(s"graft-lh-probe-$nFiles").toString + "/t"
      val filesPerCommit = math.max(1, nFiles / 10)
      println(s"[probe] ---- target $nFiles files (10 commits x $filesPerCommit) ----")
      val tCommit = timedMs(s"n=$nFiles commit (stage+stats+publish, per commit)", 1) {
        for (i <- 0 until 10) {
          val df = spark.range(i * 10000L, (i + 1) * 10000L)
            .repartition(filesPerCommit)
            .select(col("id").as("k"), (col("id") % 97).cast("decimal(12,2)").as("v"))
          if (i == 0) VersionedTable.overwrite(spark, t, df)
          else VersionedTable.append(spark, t, df)
        }
      } / 10
      println(f"[probe] n=$nFiles per-commit cost ${tCommit}%.1f ms")
      val total = VersionedTable.snapshotFiles(t).size
      println(s"[probe] n=$nFiles actual files=$total")
      timedMs(s"n=$nFiles filesForRange probe") {
        VersionedTable.filesForRange(t, "k", 15000d, 25000d)
      }
      timedMs(s"n=$nFiles rowCount (metadata-only COUNT(*))") {
        VersionedTable.rowCount(spark, t)
      }
      timedMs(s"n=$nFiles history") {
        VersionedTable.history(spark, t).collect()
      }
      timedMs(s"n=$nFiles readIndexed plan+prune+collect (selective range)") {
        VersionedTable.readIndexed(spark, t)
          .filter(col("k").between(15000, 15999)).count()
      }
      timedMs(s"n=$nFiles versionAsOf resolution") {
        VersionedTable.versionAsOf(t, System.currentTimeMillis())
      }
      timedMs(s"n=$nFiles vacuum (nothing to drop, full reference scan)", 1) {
        VersionedTable.vacuum(t, retain = 10, graceMs = 0)
      }
    }
    spark.stop()
  }
}
