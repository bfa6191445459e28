package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 probe for the sampled-Lloyd trainer (SURVEY round-11 gap
  * #1, closed in-round): kCentroids ~ N/125 made quantizer training
  * O(N²/125) — measured 45-53× per decade at sf10. With Lloyd capped
  * at min(N, 50k) smallest-xxhash64 rows the per-iteration cost is
  * cap × K dots, so the decade ratio should collapse to ~K-growth
  * (≤10×, flattening entirely once K hits its 4096 cap), while the
  * engaged-sample quantizer must keep serving: ivf recall vs
  * bruteforce at N=200k (sample = 25% of corpus) is the honest check
  * that a 50k draw still places 1600 centroids well.
  *
  * Corpora: the Sf10Build embedding recipe (circular shifts, negated
  * past r=64 — norm-preserving isometries) over sf0.1's 2000 vectors,
  * at 10 and 100 replicas (20k / 200k).
  */
object ProbeKmeansSample {
  private def mk(spark: SparkSession, reps: Int, out: String): Unit = {
    val src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val dim = src.select(size(col("embedding")).as("d")).head.getInt(0)
    val repl = spark.range(reps).select(col("id").as("r"))
    src.crossJoin(repl).select(
      (col("vec_id") + col("r") * 10000000L).as("vec_id"),
      expr(s"""transform(
        |  concat(slice(embedding, CAST(r % $dim AS INT) + 1, $dim - CAST(r % $dim AS INT)),
        |         slice(embedding, 1, CAST(r % $dim AS INT))),
        |  x -> IF(r >= $dim, -x, x))""".stripMargin).cast("array<float>").as("embedding"),
      col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.Ann

    for ((reps, tag) <- Seq(10 -> "20k", 100 -> "200k")) {
      val dir = s"tmp/kmprobe/$tag"
      mk(spark, reps, dir)
      val corpus = Ann.emb(spark, dir).cache()
      val n = corpus.count()
      val k = Ann.kCentroidsFor(n)
      for ((cap, nm) <- Seq(Ann.TrainSampleCap -> "sampled", Int.MaxValue -> "full")) {
        val t0 = System.nanoTime()
        val cs = Ann.trainQuantizer(corpus, k, 2, sampleCap = cap)
        println(f"[probe] train n=$n k=$k mode=$nm: ${(System.nanoTime() - t0) / 1e9}%.1f s (${cs.length} centroids)")
      }
      corpus.unpersist()
    }

    // serving check at the engaged scale: ivf (default = sampled
    // trainer) recall vs bruteforce ground truth on the 200k corpus
    val dir = "tmp/kmprobe/200k"
    val bf = Ann.bruteforceTopK(spark, dir)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val got = Ann.ivfTopK(spark, dir)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[probe] ivf@200k sampled-trainer: recall=${(bf & got).size.toDouble / bf.size}%.3f time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
