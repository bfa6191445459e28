package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.{MaterializedView, VersionedTable}

/** Measured constants for the round-10 capabilities (SURVEY §5's
  * artifact-per-claim rule):
  *
  *  1. BUCKETED MV STATE (the round-9 advisory's top item): the
  *     bucketed refresh's cost must be FLAT in total group count for a
  *     fixed delta — the state write is O(touched buckets), while the
  *     unbucketed refresh's whole-state rewrite grows linearly with
  *     groups. Measured at 10^5 vs 10^7 groups with the SAME 10k-row
  *     delta touching 10 group keys.
  *  2. PRODUCTION-VOCABULARY BPE ENCODE: the kernel's per-token encode
  *     cost must be ~FLAT in merge count k (the chain form is linear
  *     in k and un-compilable at a real 32k vocabulary). Measured at
  *     k = 128 / 1024 / 8192 real merges (fast trainer over sf0.01),
  *     chain at k = 128 as the reference point.
  *
  * Run: `tools/runmain.sh graft.ProbeRound10` (self-contained
  * synthetic tables).
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-r10-$tag").toString + "/t"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- 1. bucketed MV: refresh cost vs TOTAL group count ----
    // one row per group (worst case for state size: |state| = |groups|),
    // a payload so state bytes are realistic, delta fixed at 10k rows
    // over 10 group keys
    def srcRows(groups: Long) = spark.range(0, groups).select(
      col("id").as("k"),
      (col("id") % 997).cast("decimal(12,2)").as("v"),
      concat(lit("grp-"), col("id").cast("string"), lit("-" + "x" * 128)).as("tag"))
    def deltaRows(groups: Long) = spark.range(0, 10000).select(
      (col("id") % 10).as("k"), // 10 keys -> <= 10 of 512 buckets
      lit(1).cast("decimal(12,2)").as("v"),
      lit("delta").as("tag"))

    // warm the JVM/codegen paths so the first measured cell isn't cold
    {
      val src = fresh("mv-warm"); val view = fresh("mvv-warm")
      VersionedTable.overwrite(spark, src, srcRows(10000L))
      MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"), buckets = 512)
      VersionedTable.append(spark, src, deltaRows(10000L))
      MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    }

    for (groups <- Seq(100000L, 10000000L)) {
      for ((mode, buckets) <- Seq("bucketed" -> 512, "unbucketed" -> 0)) {
        val src = fresh(s"mv-$mode-$groups")
        val view = fresh(s"mvv-$mode-$groups")
        VersionedTable.overwrite(spark, src, srcRows(groups))
        val tFull = timed {
          MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"),
            buckets = buckets)
        }
        VersionedTable.append(spark, src, deltaRows(groups))
        val tInc = timed {
          MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
        }
        val stateFiles = VersionedTable.snapshotFiles(view).size
        println(f"PROBE mv_state groups=$groups%-9d mode=$mode%-10s " +
          f"first=$tFull%6.2fs incremental=$tInc%6.2fs stateFiles=$stateFiles%d")
      }
    }

    // ---- 2. BPE encode: per-token cost vs merge count k ----
    // the synthetic sf corpora's word vocabulary exhausts at 89 merges,
    // so the production-k probe builds its own corpus with a REAL
    // vocabulary shape: 50k distinct words, 2M word instances
    {
      val dir = java.nio.file.Files.createTempDirectory("graft-r10-bpe").toString
      val nVocab = 50000
      val rnd = new scala.util.Random(42)
      val vocabArr = Array.fill(nVocab)(
        (0 until (6 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val bVocab = spark.sparkContext.broadcast(vocabArr)
      val mkText = udf((d: Long) => {
        val sb = new StringBuilder
        var s = d * 6364136223846793005L + 1442695040888963407L
        var i = 0
        while (i < 100) {
          s = s * 6364136223846793005L + 1442695040888963407L
          if (i > 0) sb.append(' ')
          sb.append(bVocab.value(((s >>> 33) % nVocab).toInt))
          i += 1
        }
        sb.toString
      }).asNondeterministic()
      spark.range(0, 20000).select(col("id").as("doc_id"), mkText(col("id")).as("text"))
        .write.parquet(s"$dir/documents.parquet")
      var trained: Seq[(Long, String, String, Long)] = Nil
      val tTrain = timed { trained = Bpe.trainMergesLocal(spark, dir, 8192) }
      println(f"PROBE bpe_train_fast k_supported=${trained.size}%d " +
        f"train=$tTrain%6.2fs (driver-side, one corpus aggregate)")
      def encTokens(merges: Seq[(Long, String, String, Long)],
          kernel: Boolean): (Double, Long) = {
        var total = 0L
        val t = timed {
          total = Bpe.encodeWith(spark, dir, merges, useKernel = kernel)
            .agg(sum("n_tokens")).head.getLong(0)
        }
        (t, total)
      }
      encTokens(trained.take(128), kernel = true) // warm
      for (k <- Seq(128, 1024, 8192); if k <= trained.size) {
        val (t, total) = encTokens(trained.take(k), kernel = true)
        println(f"PROBE bpe_encode mode=kernel k=$k%-5d wall=$t%6.2fs " +
          f"tokens=$total%d ns_per_token=${t * 1e9 / total}%8.1f")
      }
      val (tc, totc) = encTokens(trained.take(128), kernel = false)
      println(f"PROBE bpe_encode mode=chain  k=128   wall=$tc%6.2fs " +
        f"tokens=$totc%d ns_per_token=${tc * 1e9 / totc}%8.1f")
    }
    spark.stop()
  }
}
