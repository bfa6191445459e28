package graft

import org.apache.spark.sql.SparkSession

/** Generic stage-level perf audit: runs named SparkEntry queries with
  * a stage listener and reports stages whose wall time is large but
  * whose task count is small — the signature of work that lost its
  * parallelism (e.g. a broadcast build planning a 1-split scan with
  * no fan-out exchange, the lshTopK round-7 find — see ProbeLsh).
  *
  * Run: `SPARK_GRAFT_SF_DIR=<sf dir, default /root/testdata/sf0.1> sbt "Test/runMain graft.ProbeStages q1 q2 ..."`.
  */
object ProbeStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val details = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        stages.put(i.stageId,
          (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L), i.numTasks))
        details.put(i.stageId,
          i.rddInfos.map(r => r.name + ":" + r.numPartitions).mkString("|").take(200))
      }
    })
    import scala.jdk.CollectionConverters._
    for (name <- args) {
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val all = stages.asScala.values.toSeq
      val narrow = all.filter { case (ms, nt) => nt <= 4 && ms > 1000 }
      println(f"[stages] $name wall=$wall%.1f s stages=${all.size} " +
        f"narrowSlow=${narrow.size} narrowSlowWall=${narrow.map(_._1).sum / 1000.0}%.1f s")
      stages.asScala.toSeq.sortBy(-_._2._1).take(5).foreach { case (id, (ms, nt)) =>
        println(f"[stages]   stage $id%5d ${ms / 1000.0}%7.2f s tasks=$nt " +
          details.getOrDefault(id, ""))
      }
    }
    spark.stop()
  }
}
