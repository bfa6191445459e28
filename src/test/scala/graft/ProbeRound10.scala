package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, VersionedTable}

/** Measured constants for the round-10 capabilities (SURVEY §5's
  * artifact-per-claim rule):
  *
  *  1. BUCKETED MV STATE (the round-9 advisory's top item): the
  *     bucketed refresh's cost must be FLAT in total group count for a
  *     fixed delta — the state write is O(touched buckets), while the
  *     unbucketed refresh's whole-state rewrite grows linearly with
  *     groups. Measured at 10^5 vs 10^7 groups with the SAME 10k-row
  *     delta touching 10 group keys.
  *
  * Run: `tools/runmain.sh graft.ProbeRound10` (self-contained
  * synthetic tables).
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-r10-$tag").toString + "/t"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- 1. bucketed MV: refresh cost vs TOTAL group count ----
    // one row per group (worst case for state size: |state| = |groups|),
    // a payload so state bytes are realistic, delta fixed at 10k rows
    // over 10 group keys
    def srcRows(groups: Long) = spark.range(0, groups).select(
      col("id").as("k"),
      (col("id") % 997).cast("decimal(12,2)").as("v"),
      concat(lit("grp-"), col("id").cast("string"), lit("-" + "x" * 128)).as("tag"))
    def deltaRows(groups: Long) = spark.range(0, 10000).select(
      (col("id") % 10).as("k"), // 10 keys -> <= 10 of 512 buckets
      lit(1).cast("decimal(12,2)").as("v"),
      lit("delta").as("tag"))

    // warm the JVM/codegen paths so the first measured cell isn't cold
    {
      val src = fresh("mv-warm"); val view = fresh("mvv-warm")
      VersionedTable.overwrite(spark, src, srcRows(10000L))
      MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"), buckets = 512)
      VersionedTable.append(spark, src, deltaRows(10000L))
      MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    }

    for (groups <- Seq(100000L, 10000000L)) {
      for ((mode, buckets) <- Seq("bucketed" -> 512, "unbucketed" -> 0)) {
        val src = fresh(s"mv-$mode-$groups")
        val view = fresh(s"mvv-$mode-$groups")
        VersionedTable.overwrite(spark, src, srcRows(groups))
        val tFull = timed {
          MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"),
            buckets = buckets)
        }
        VersionedTable.append(spark, src, deltaRows(groups))
        val tInc = timed {
          MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
        }
        val stateFiles = VersionedTable.snapshotFiles(view).size
        println(f"PROBE mv_state groups=$groups%-9d mode=$mode%-10s " +
          f"first=$tFull%6.2fs incremental=$tInc%6.2fs stateFiles=$stateFiles%d")
      }
    }
    spark.stop()
  }
}
