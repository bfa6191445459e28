package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes plans/r13/<query>_<tag>.txt — the `.explain("formatted")`
  * evidence for every query this optimization round touches, captured
  * with the bench's session shape. For queries whose outer frame is a
  * driver-local copy (the lakehouse withRoot hygiene rule), the inner
  * executed plan is captured via -Dgraft.dump.inner (the DumpPlans
  * mechanism).
  *
  * Run: sbt "Test/runMain graft.DumpPlanR13 <before|after> <q1,q2,...>"
  */
object DumpPlanR13 {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    System.setProperty("graft.dump.inner", "true")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(Paths.get("plans/r13"))
    for (n <- names) {
      graft.operators.VersionedQueries.lastInnerPlan.set("")
      val df = SparkEntry.queries(n)(spark, sf)
      val outer = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute so AQE-final / withRoot-inner evidence exists
      df.write.format("noop").mode("overwrite").save()
      val inner = graft.operators.VersionedQueries.lastInnerPlan.get()
      val plan = if (inner.nonEmpty) inner else outer
      Files.write(Paths.get(s"plans/r13/${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[dumpplan] wrote plans/r13/${n}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
