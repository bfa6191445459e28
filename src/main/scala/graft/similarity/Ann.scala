package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions.dotNative

/** Similarity search over the embeddings table (SURVEY.md §2.4).
  *
  * Scale shape: the query set is always the small side → broadcast;
  * the corpus is scanned once, never shuffled, for the brute-force
  * path. The LSH path buckets the corpus a single time (a reusable
  * partitioning at 100 TB) and probes buckets only.
  */
object Ann {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism) // single-file table → fan out
      .select(col("vec_id"), col("label"), normalized(col("embedding")).as("v"))

  /** Exact brute-force cosine top-k: broadcast the query rows against
    * the corpus scan, window-rank per query. Baseline + recall oracle
    * for the ANN paths.
    */
  def bruteforceTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val corpus = emb(spark, dir)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  val Planes = 5

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): splitmix64 → [-1, 1). No RNG state, so the "model" is
    * reproducible across runs/executors by construction.
    */
  private[similarity] def planeComponent(p: Int, d: Int): Double = {
    var z = (p.toLong * 131L + d.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    (java.lang.Math.floorMod(z, 100000L).toDouble / 50000.0) - 1.0
  }

  /** Random-hyperplane (SRP) LSH bucket id — one JVM pass per vector
    * (HOF evaluation is interpreted; a tight loop is ~100× cheaper).
    */
  private val srpUdf = udf { (v: Seq[Double]) =>
    var bucket = 0L
    var p = 0
    while (p < Planes) {
      var proj = 0.0
      var d = 0
      while (d < v.length) { proj += v(d) * planeComponent(p, d); d += 1 }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def srpBucket(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = srpUdf(v)

  /** SRP-LSH approximate top-k with multi-probe: each query probes its
    * own bucket plus every bucket at hamming distance 1 (one flipped
    * hyperplane), via an EXPLODE of probe buckets so the join stays an
    * equi-join — never a nested-loop hamming scan. (Planes+1)× probe
    * cost for a large recall gain; the corpus is bucketed once and
    * never re-shuffled — the 100 TB path where brute force is off the
    * table.
    */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val corpus = emb(spark, dir).withColumn("bucket", srpBucket(col("v")))
    val probes = array((lit(0L) +: (0 until Planes).map(p => lit(1L << p))).map(
      flip => col("q_bucket0").bitwiseXOR(flip)): _*)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket").as("q_bucket0"))
      .withColumn("q_bucket", explode(probes))
      .drop("q_bucket0")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      // no dedup needed: the 6 probe buckets are distinct values and a
      // corpus row has exactly one bucket → at most one match per pair
      .select(col("q_id"), col("vec_id"), dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** IVF (inverted-file) ANN — the other classic scale path next to
    * LSH: a small coarse quantizer (spherical k-means centroids)
    * partitions the corpus into K inverted lists; a query scans only
    * the `nProbe` lists whose centroids are nearest.
    *
    * Scale shape: centroids are tiny (K·dim doubles) and live
    * broadcast; corpus assignment is one narrow pass (reusable — at
    * 100 TB you'd persist `cid` as a partition column); the query
    * probe is an equi-join on `cid`, never a nested loop. Lloyd
    * iterations aggregate per-dim DECIMAL sums of quantized values, so
    * the centroids — and therefore every downstream assignment — are
    * bit-identical under any partitioning (avg(double) would drift
    * with partition order).
    */
  def ivfTopK(spark: SparkSession, dir: String, nQueries: Int = 10, k: Int = 5,
      kCentroids: Int = 16, lloydIters: Int = 2, nProbe: Int = 4): DataFrame = {
    val dim = 64
    // the quantizer makes several passes (seeds, Lloyd, final assign) —
    // cache the normalized corpus so each is a memory scan, not a
    // re-read+renormalize. At 100 TB the analog is persisting the
    // assigned `cid` as a partition column of the index table.
    val corpus = emb(spark, dir).cache()

    // deterministic seeds: evenly spaced vec_ids
    val n = corpus.count()
    val stride = math.max(1L, n / kCentroids)
    var centroids: Array[Array[Double]] = corpus
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(kCentroids)
      .select("v").collect().map(_.getSeq[Double](0).toArray)

    def nearestUdf(cs: Array[Array[Double]]) = udf { (v: Seq[Double]) =>
      var best = 0; var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cs.length) {
        var s = 0.0; var i = 0
        val cv = cs(c)
        while (i < v.length) { s += v(i) * cv(i); i += 1 }
        if (s > bestDot) { bestDot = s; best = c } // first index wins ties
        c += 1
      }
      best
    }

    for (_ <- 1 to lloydIters) {
      // exact per-dim sums: quantize to 1e-9 grid, sum as DECIMAL
      val sums = (0 until dim).map(i =>
        sum(round(col("v").getItem(i) * 1e9).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double").as(s"s$i"))
      val means = corpus.withColumn("cid", nearestUdf(centroids)(col("v")))
        .groupBy("cid").agg(sums.head, sums.tail: _*)
        .collect()
        .map { r =>
          val cid = r.getInt(0)
          val vec = (0 until dim).map(i => r.getDouble(i + 1) / 1e9).toArray
          val norm = math.sqrt(vec.map(x => x * x).sum)
          cid -> vec.map(_ / math.max(norm, 1e-12)) // spherical: re-normalize
        }.toMap
      // clusters that lost every vector keep their previous centroid
      centroids = centroids.indices.map(c => means.getOrElse(c, centroids(c))).toArray
    }

    val assigned = corpus.withColumn("cid", nearestUdf(centroids)(col("v")))
    val probesUdf = udf { (v: Seq[Double]) =>
      centroids.indices.map { c =>
        var s = 0.0; var i = 0
        val cv = centroids(c)
        while (i < v.length) { s += v(i) * cv(i); i += 1 }
        (-s, c) // sort by descending dot, index tiebreak
      }.sorted.take(nProbe).map(_._2)
    }
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        explode(probesUdf(col("v"))).as("q_cid"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    assigned.join(broadcast(queries),
        col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }

  /** Batch k-NN join: one query set × corpus, k nearest per query —
    * the shape used for dataset-vs-dataset contamination checks.
    */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val corpus = emb(spark, dir).filter(col("label") =!= 0)
    val queries = emb(spark, dir).filter(col("label") === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id").asc)
    corpus.crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"), dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id").as("neighbor_id"), col("cosine"))
  }
}
