package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: recall of ivf/ivfpq at the 10x corpus for candidate probe
  * widths, to size nProbeFor's engaged fraction before changing it.
  */
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = "tmp/scale10"
    val bf = SparkEntry.queries("ann_bruteforce")(spark, out)
      .select(col("q_id"), col("neighbor_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nP <- Seq(40, 60, 80)) {
      for ((nm, f) <- Seq(
          ("ivf", () => graft.similarity.Ann.ivfTopK(spark, out, nProbe = nP)),
          ("ivfpq", () => graft.similarity.Ann.ivfpqTopK(spark, out, nProbe = nP)))) {
        val t0 = System.nanoTime()
        val got = f().select(col("q_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[probe] $nm nProbe=$nP: recall=${(bf & got).size.toDouble / bf.size}%.3f time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
