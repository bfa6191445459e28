// Scratch probe: bucket-size distribution of the simhash bands at sf0.1.
// Run: sbt -batch "Test/runMain graft.ProbeSimhash"
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val sig = dedup.Dedup.simhashSignatures(
      core.Tables.load(spark, d, "documents").repartition(16))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xffffL)): _*)))
      .toDF("doc_id", "band", "chunk")
    println("== top bucket sizes ==")
    banded.groupBy("band", "chunk").count().orderBy(col("count").desc).show(10)
    println("== distinct simhashes over docs ==")
    println(sig.select(countDistinct("simhash")).head.getLong(0) + " / " + sig.count())
    spark.stop()
  }
}
