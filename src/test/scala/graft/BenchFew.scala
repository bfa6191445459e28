package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc subset benchmark for iterating on individual queries:
  * `sbt "Test/runMain graft.BenchFew q_ntile dedup_ngram_jaccard"`.
  * Same session shape as graft.Bench; median of 3 noop-sink runs.
  */
object BenchFew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // same data-scaled parallelism knob as graft.Bench (round-6 item 4)
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt
    // same session-state hygiene as graft.Bench (round-3 lesson: cache
    // and localCheckpoint debris inflates LATER queries), periodic GC
    var sinceGc = 0
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      sinceGc += 1
      if (sinceGc >= 8) { System.gc(); sinceGc = 0 }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          println(s"[benchfew] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }.sorted
      println(f"[benchfew] $name min=${times.head}%.2f median=${times(n / 2)}%.2f " +
        s"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
