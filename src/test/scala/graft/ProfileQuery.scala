package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for one (or a few) bench queries — the
  * guide-§1 "empirical" loop without the UI: runs the named queries
  * through the same session shape as [[Bench]] (noop sink, cleanup
  * between reps) and prints, for the LAST (warm) rep, every stage's
  * wall duration, task count and input/shuffle byte totals, so the
  * expensive exchange/scan is attributable before and after a change.
  *
  * Run: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "Test/runMain graft.ProfileQuery <query> [reps]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, ms: Long, tasks: Int,
      inputMB: Double, srMB: Double, swMB: Double, rows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (collecting) {
        val si = e.stageInfo
        val m = si.taskMetrics
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n'), ms, si.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.outputMetrics.recordsWritten))
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        jobs.add((e.jobId, e.time, Option(e.properties.getProperty("spark.job.description")).getOrElse("")))
      }
    })

    val fn = SparkEntry.queries(name)
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    var dt = 0.0
    val wantPlan = args.length > 2 && args(2) == "plan"
    for (r <- 1 to reps) {
      if (r == reps) collecting = true
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (wantPlan && r == reps) {
        // execute through the df's own QueryExecution so the printed
        // plan is the AQE-FINAL one (a noop write plans separately)
        df.foreach(_ => ())
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else df.write.format("noop").mode("overwrite").save()
      dt = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name rep $r: $dt%.3f s")
      collecting = false
      if (r < reps) cleanup()
    }
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq.sortBy(-_.ms)
    println(f"[profile] $name warm total ${dt}%.3f s; ${all.size} stages, ${jobs.size} jobs")
    println(f"  ${"ms"}%7s ${"tasks"}%5s ${"inMB"}%8s ${"srMB"}%8s ${"swMB"}%8s  stage")
    for (s <- all.take(40))
      println(f"  ${s.ms}%7d ${s.tasks}%5d ${s.inputMB}%8.1f ${s.srMB}%8.1f ${s.swMB}%8.1f  [${s.id}] ${s.name.take(110)}")
    val sumMs = all.map(_.ms.max(0L)).sum
    println(f"[profile] sum of stage wall: ${sumMs / 1000.0}%.2f s (overlap possible); gap to total = scheduling/driver work")
    spark.stop()
  }
}
