package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Phase breakdown for the q_standardize sf1 audit (round-6 verdict
  * item 5: 8.3× at 10× data was the heaviest non-graph ratio without
  * a written cost story). Measured at sf1 (6M rows):
  *   A. the ROUND-6 moments pass (per-row DECIMAL(38,0) sums —
  *      precision 38 is past the 18-digit compact-long Decimal
  *      representation, so every row pays a BigDecimal add): 10.6 s,
  *      i.e. ~77% of the round-6 query's 13.7 s;
  *   B'. the same moments with plain double sums: 1.35 s — the
  *      scan + shuffle floor, isolating the decimal premium;
  *   B. the CURRENT full query (exact hi/lo long-split moments in
  *      codegen, decimal only over the 3×P partial rows, plus the
  *      second scan, 3-row broadcast join, per-row z chain and
  *      O(input) noop materialization): 4.2 s — the fix this audit
  *      produced (13.7 s → 4.2 s at sf1).
  * Run: `SPARK_GRAFT_SF_DIR=tmp/sf1 sbt "Test/runMain graft.ProbeStandardize"`.
  */
object ProbeStandardize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("x"))
    println(s"[probe] rows=${li.count()}")
    def timed(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label median=${ts(1)}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // phase A: the ROUND-6 moments chain, kept as the before-side of
    // the comparison (per-row DECIMAL(38,0) sums)
    timed("A moments-only") {
      li.groupBy("l_returnflag").agg(
        operators.cnt.as("n"),
        sum(round(col("x") * 1e4).cast(DecimalType(38, 0))).cast("double").as("sx"),
        sum((round(col("x") * 1e4) * round(col("x") * 1e4)).cast(DecimalType(38, 0)))
          .cast("double").as("sx2"))
        .write.format("noop").mode("overwrite").save()
    }
    // phase A': same moments with plain double sums — the scan+shuffle
    // floor, isolating the DECIMAL(38,0) exactness premium
    timed("A' moments-double") {
      li.groupBy("l_returnflag").agg(
        operators.cnt.as("n"),
        sum(round(col("x") * 1e4)).as("sx"),
        sum(round(col("x") * 1e4) * round(col("x") * 1e4)).as("sx2"))
        .write.format("noop").mode("overwrite").save()
    }
    // phase B: the full driver query (second scan + broadcast join +
    // per-row z chain + O(input) noop materialization)
    timed("B full-query") {
      SparkEntry.queries("q_standardize")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    SparkEntry.queries("q_standardize")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
