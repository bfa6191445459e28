package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Results are materialized through the noop sink so every projected
  * column is actually computed (a bare count() would let Catalyst
  * prune the expensive expressions out of per-row transforms).
  *
  * Harness design (round-4 rework — the round-3 run timed out):
  *  - reps are bounded by a WALL-CLOCK BUDGET, not a fixed N: pass 1
  *    always runs every query once (the driver must always get
  *    numbers), extra passes up to SPARK_GRAFT_BENCH_N run only while
  *    SPARK_GRAFT_BENCH_BUDGET_S remains. Per-query value = median of
  *    its collected samples.
  *  - all queries share one JVM, so cache/localCheckpoint blocks left
  *    by a query (the dedup/ANN family persists intermediates by
  *    design) would otherwise survive until the driver GCs the plan
  *    references — round 3 measured up to 166x inflation on queries
  *    that merely ran AFTER the dedup block. cleanup() between
  *    queries drops the cache manager, unpersists every registered
  *    RDD, and periodically forces a GC so the ContextCleaner frees
  *    checkpoint blocks promptly.
  */
object Bench {
  private val heavyPrefixes =
    Seq("dedup", "ann_", "knn", "pipeline", "mr_pagerank", "multimodal")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the deliberate single-partition windows (daily-grain series in
    // q_moving_avg/q_resample, the nPart-row offsets table in
    // TotalOrderRank) each emit a WARN; across 113 queries x N passes
    // that flood displaced the result line from the driver's 2000-char
    // tail in round 3. They are documented-bounded, so drop them here.
    // Likewise the WARNs cleanup() itself provokes (unpersisting a
    // localCheckpoint'd RDD after its query fully materialized, and the
    // clearCache/unpersist remove-block race) — benign by construction,
    // and a tail full of them would hide the result line again.
    for (noisy <- Seq(
        "org.apache.spark.sql.execution.window",
        "org.apache.spark.rdd",
        "org.apache.spark.storage.BlockManager",
        "org.apache.spark.ContextCleaner"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        noisy, org.apache.logging.log4j.Level.ERROR)

    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "3").toInt.max(1)
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "240").toDouble
    val benchT0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - benchT0) / 1e9

    // Free the block-manager state a query left behind so the next
    // query's time measures its own plan, not its predecessor's debris.
    var sinceGc = 0
    def cleanup(afterName: String): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      sinceGc += 1
      // GC promptly after known block-heavy families (their
      // localCheckpoint blocks are only freed once the RDD reference
      // is collected), and every 16 queries as a backstop; an
      // every-query GC would cost more than the debris it frees.
      if (heavyPrefixes.exists(afterName.startsWith) || sinceGc >= 16) {
        System.gc()
        sinceGc = 0
      }
    }

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        cleanup(name)
        return -1.0
      }
      val dt = (System.nanoTime() - t0) / 1e9
      cleanup(name)
      dt
    }

    // JVM/codegen warmup (untimed): the flagship join/agg shape plus
    // one query from each kernel family (hash signatures, vector
    // codegen expressions) so pass-1 numbers don't carry first-codegen
    // cost — at N=1 under a tight budget that noise would be reported.
    for (w <- Seq("q3_topk", "dedup_simhash", "ann_bruteforce")) {
      SparkEntry.queries.get(w).foreach { fn =>
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        cleanup(w)
      }
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> scala.collection.mutable.ArrayBuffer.empty[Double]): _*)
    var pass = 0
    var continue = true
    while (continue) {
      pass += 1
      for (name <- names if !samples(name).lastOption.exists(_ < 0)) {
        samples(name) += runOnce(name, SparkEntry.queries(name))
      }
      // pass 1 is unconditional; later passes only start while budget
      // remains, so the driver ALWAYS receives a full set of numbers
      continue = pass < benchN && elapsedS < budgetS
    }

    val results = names.map { n =>
      val ts = samples(n)
      val v = if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(ts.length / 2)
      n -> v
    }
    // tail defense: the driver records only the LAST ~2000 chars of
    // this line, so order the per-query map fastest→slowest and put
    // the total + top-5 summary at the very end — the truncated view
    // always retains the expensive block being graded
    val byTime = results.sortBy(_._2)
    val qs = byTime.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val top5 = byTime.reverse.take(5)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failures must survive the tail truncation too: a failed query
    // sorts to the truncated HEAD (-1.0) and is excluded from the
    // total, so without this field a breakage would read as a speedup
    val failed = results.filter(_._2 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    println(s"""{"queries":$qs,"metric":"total","unit":"sec","sf":"$sfDir","passes":$pass,"wall":$elapsedS,"top5":$top5,"failed":$failed,"value":$total}""")
    spark.stop()
  }
}
