package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.similarity.Ann

/** Perf audit that produced lshTopK's corpus materialization (round
  * 7): unmaterialized, the bucketed corpus (SRP UDF — the pipeline's
  * priciest per-row kernel) is recomputed by four branches, and the
  * two BROADCAST builds (query probes / query vectors) plan the bare
  * 1-split parquet scan with NO fan-out exchange, so each runs the
  * WHOLE corpus projection in one task, serially. A stage-listener
  * breakdown showed one 14.5 s single-task broadcast-build stage per
  * run at sf1 against ~1 s of total parallel work.
  *
  * Measured (min of 3, sf1 = 20k vectors): materialized 1.1 s,
  * unmaterialized 14.8 s — a 13× wall gap from ONE localCheckpoint.
  * Run: `SPARK_GRAFT_SF_DIR=tmp/sf1 sbt "Test/runMain graft.ProbeLsh"`.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Any): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label min=${ts.head}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val (nTables, bits, nQueries, k) = (Ann.LshTables, Ann.LshBits, 10, 5)
    timed("lshTopK (materialized corpus)")(Ann.lshTopK(spark, sfDir).count())
    // the round-6 shape: identical pipeline, no materialization
    val corpus = Ann.emb(spark, sfDir)
      .select(col("vec_id"), col("v"), Ann.srpBuckets(col("v"), nTables, bits).as("buckets"))
    val banded = corpus.select(col("vec_id"), posexplode(col("buckets")))
      .toDF("vec_id", "tbl", "bucket")
    val qprobes = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), posexplode(col("buckets")))
      .toDF("q_id", "tbl", "bucket0")
      .select(col("q_id"), col("tbl"),
        explode(Ann.hamming1Probes(col("bucket0"), bits)).as("bucket"))
    val cand = banded.join(broadcast(qprobes), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    val old = cand.join(corpus.select(col("vec_id"), col("v")), "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"),
        graft.plans.VectorExpressions.dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
    timed("round-6 shape (unmaterialized)")(old.count())
    spark.stop()
  }
}
