package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis probe for the sf10 (100×) bench decade — the round-9
  * verdict's item 7 asked for the >3×-per-decade outliers WITH
  * diagnoses, and dedup_embedding is the big one (48 s at sf1 →
  * 853 s at sf10, 17.8× per 10×). This probe pins the diagnosis to
  * the CANDIDATE-VOLUME FORMULA rather than a vague "it's slower":
  *
  *   candidates ≈ N · cellSize · (bits+1) · tables / 2
  *
  * where cellSize = N/2^bits ∈ [63,125] by the srpBitsFor rounding
  * and (bits+1) is the hamming-1 probe fan-out — so candidates/N
  * grows by BOTH the probe fan-out (log N) and the cell-size phase
  * (≤2×), a log-linear decade ratio of (12/9)·(98/78)·10 ≈ 16.7×,
  * which is what the wall clock measured (17.8× incl. the deeper
  * distinct). The probe computes the REAL banded/capped/probed
  * candidate count per corpus and prints it against the formula.
  *
  * Run AFTER Sf10Build: tools/runmain.sh graft.ProbeSf10 [dirs…]
  */
object ProbeSf10 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.Ann
    val nTables = graft.dedup.Dedup.EmbTables
    for (dir <- dirs) {
      val e = Ann.emb(spark, dir)
        .select(col("vec_id"), Ann.srpBuckets(col("v"), nTables,
          graft.dedup.Dedup.srpBitsFor(Ann.emb(spark, dir).count())).as("buckets"))
        .localCheckpoint()
      val n = e.count()
      val bits = graft.dedup.Dedup.srpBitsFor(n)
      val banded = e.select(col("vec_id"), posexplode(col("buckets")))
        .toDF("vec_id", "tbl", "bucket")
      val sizes = banded.groupBy("tbl", "bucket").agg(count(lit(1)).as("bsz"))
      val capRow = sizes.agg(greatest(lit(64.0),
        (sum("bsz").cast("double") / (nTables.toLong * (1L << bits))) * 16).as("cap"))
      val ok = sizes.crossJoin(broadcast(capRow))
        .filter(col("bsz") <= col("cap")).select("tbl", "bucket")
      val bounded = banded.join(ok, Seq("tbl", "bucket"))
      val probed = bounded.select(col("vec_id"), col("tbl"),
        explode(Ann.hamming1Probes(col("bucket"), bits)).as("bucket"))
      val rawPairs = probed.as("a").join(bounded.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id")).count()
      val cell = n.toDouble / (1L << bits)
      val predicted = n * cell * (bits + 1) * nTables / 2.0
      println(f"[probe-sf10] dir=$dir n=$n bits=$bits cell=$cell%.1f " +
        f"rawPairs=$rawPairs predictedPairs=$predicted%.3g " +
        f"ratioPerVec=${rawPairs.toDouble / n}%.0f")
      e.unpersist()
    }
    spark.stop()
  }
}
