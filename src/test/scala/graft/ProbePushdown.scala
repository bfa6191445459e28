package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does Spark push a deterministic (expensive) projection below a
  * round-robin repartition? If yes, fanOut's parallelism rescue is
  * silently defeated for every expensive kernel above it.
  */
object ProbePushdown {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("pushdown").toString
    spark.range(0, 1000, 1, 1).selectExpr("id", "repeat('x', 100) as s")
      .write.parquet(dir + "/t")
    val slow = udf { (s: String) => { Thread.sleep(2); s.length } }
    val df = spark.read.parquet(dir + "/t").repartition(32)
      .select(col("id"), slow(col("s")).as("n"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      df.agg(sum("n")).collect()
      println(f"[push] pass$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        "(parallel ~0.1s, serial ~2s)")
    }
    println(df.queryExecution.executedPlan.toString.take(1500))
    spark.stop()
  }
}
