package graft

import org.apache.spark.sql.SparkSession

/** Dump the executed plan of dedup_ngram_jaccard to find why the
  * shingle kernel runs in the 2-task scan stage at sf1.
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.dedup.Dedup.ngramJaccard(spark, sfDir)
    q.collect()
    println("=== EXECUTED ===")
    println(q.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
