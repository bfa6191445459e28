package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Measures the COW-vs-MERGE-ON-READ mutation trade the scaladocs
  * assert (SURVEY §2.7): a NARROW delete (0.01% of rows, one cluster)
  * should be near-free under MoR and pay one cluster's rewrite under
  * COW; a WIDE delete (~30%, every cluster) should favor COW, whose
  * reads stay join-free while MoR readers drag a large deletion
  * vector through a broadcast anti-join until the next rewrite.
  * Reports write wall, bytes written, and post-mutation full-read
  * wall for each quadrant.
  *
  * Run: `sbt "Test/runMain graft.ProbeMutations"` (self-contained,
  * ~4M-row synthetic table, key-clustered commits).
  */
object ProbeMutations {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = 4000000L
    val clusters = 8
    def build(): String = {
      val t = java.nio.file.Files.createTempDirectory("graft-mut-probe").toString + "/t"
      val per = n / clusters
      for (c <- 0 until clusters) {
        val df = spark.range(c * per, (c + 1) * per)
          .select(col("id").as("k"), (col("id") % 997).cast("double").as("v"))
        if (c == 0) VersionedTable.overwrite(spark, t, df)
        else VersionedTable.append(spark, t, df)
      }
      t
    }
    def dirBytes(t: String): Long = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(t)))(
        _.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum)
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // narrow: 0.01% of rows, inside ONE cluster; wide: ~30%, all clusters
    val narrowHi = n / clusters / 1000 // first cluster's first 0.1%... of its rows
    for ((label, cond) <- Seq(
        ("narrow (0.0125% rows, 1 cluster)", col("k") < narrowHi),
        ("wide (~33% rows, all clusters)", col("k") % 3 === 0L))) {
      for ((mode, run) <- Seq(
          ("COW", (t: String) => VersionedTable.delete(spark, t, cond)),
          ("MoR", (t: String) => VersionedTable.deleteMoR(spark, t, cond)))) {
        val t = build()
        val before = dirBytes(t)
        val w = timed { run(t) }
        val written = dirBytes(t) - before
        val r = timed { VersionedTable.read(spark, t).count() }
        println(f"[probe] $label / $mode: write ${w}%.2f s, " +
          f"bytes written ${written / 1048576.0}%.1f MiB, post-read ${r}%.2f s")
      }
    }
    spark.stop()
  }
}
