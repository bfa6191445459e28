package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Measured constants for the round-11 capabilities (SURVEY §5's
  * artifact-per-claim rule):
  *
  *  2. NATIVE NEAREST-CENTROID ASSIGNMENT: the N×K ANN build pass
  *     (SURVEY's named residual ANN cost) as a codegen Expression vs
  *     the ScalaUDF it replaces — same flop count, no Seq boxing or
  *     catalyst↔scala conversion per row. Measured on a synthetic
  *     256k × dim-64 corpus against a 1024-centroid codebook.
  *
  *  1. ZONE-MAP-SCOPED KEYED MERGE (the round-10 verdict's top item):
  *     on a key-clustered UNPARTITIONED table, the cost of a narrow
  *     upsert must track the TOUCHED FILES, not the table size — the
  *     whole-snapshot path rewrites everything and grows linearly
  *     with the table. Measured with the SAME 1k-row, 1k-key-band
  *     upsert against 1M and 10M row tables (64 clustered files
  *     each): the scoped merge's time and rewritten-file count should
  *     be ~flat across the decade while the whole path's time grows
  *     ~10x.
  *
  * Run: `tools/runmain.sh graft.ProbeRound11` (self-contained
  * synthetic tables).
  */
object ProbeRound11 {
  // handoff slot so the trainer's wall time is measurable around a
  // multi-value return (probe-local plumbing, not library surface)
  var twoLevelState: (Array[Array[Double]], Array[Double], Int) = _

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-r11-$tag").toString + "/t"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // a key-clustered layout (the OPTIMIZE-maintained shape): 64 files,
    // each spanning a contiguous k range; a ~128-byte payload so the
    // rewrite cost is bytes-realistic, not schema-trivial
    def clustered(rows: Long) = spark.range(0, rows)
      .select(col("id").as("k"), (col("id") * 2).as("v"),
        concat(lit("pad-"), col("id").cast("string"), lit("-" + "x" * 128)).as("tag"))
      .repartitionByRange(64, col("k"))
      .sortWithinPartitions("k")
    def upd(rows: Long) = spark.range(0, 1000).select(
      col("id").as("k"), lit(-1L).as("v"), lit("upd").as("tag"))

    // warm the JVM/codegen paths
    {
      val t = fresh("warm")
      VersionedTable.overwrite(spark, t, clustered(100000L))
      VersionedTable.upsert(spark, t, upd(100000L), "k")
      VersionedTable.merge(spark, t, upd(100000L), (cur, u) =>
        cur.join(u, Seq("k"), "left_anti").unionByName(u))
    }

    for (rows <- Seq(1000000L, 10000000L)) {
      val t = fresh(s"zoned-$rows")
      VersionedTable.overwrite(spark, t, clustered(rows))
      val before = VersionedTable.snapshotFiles(t).toSet
      val tZoned = timed { VersionedTable.upsert(spark, t, upd(rows), "k") }
      val after = VersionedTable.snapshotFiles(t).toSet
      val rewritten = (before -- after).size
      val carried = (before & after).size
      // the honest comparison point: the SAME merge through the
      // whole-snapshot path (what every non-partition-key merge cost
      // before this round)
      val tW = fresh(s"whole-$rows")
      VersionedTable.overwrite(spark, tW, clustered(rows))
      val tWhole = timed {
        VersionedTable.merge(spark, tW, upd(rows), (cur, u) => {
          val cols = cur.columns
          cur.as("t").join(u.as("u"), Seq("k"), "full_outer")
            .select(cols.map(c =>
              if (c == "k") col("k")
              else coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)
        })
      }
      println(f"PROBE merge_zoned rows=$rows%-9d zoned=$tZoned%6.2fs " +
        f"whole=$tWhole%6.2fs rewrittenFiles=$rewritten%d carriedFiles=$carried%d " +
        f"of=${before.size}%d")
    }

    // ---- 3. two-level coarse quantizer: recall + bounded assignment ----
    // Synthetic clustered corpus: 5000 latent centers, per-vector noise,
    // normalized — the regime where IVF recall is meaningful. The probe
    // measures (a) recall@5 of the two-level pipeline vs brute force at
    // N = 1M (past the 512k engagement point), and (b) the per-row
    // assignment cost staying bounded as N crosses the flat cap.
    {
      import graft.plans.VectorExpressions.{dotNative, normalizeNative}
      import graft.similarity.Ann
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val dim = 64
      val latent = 5000
      def synth(n: Long): DataFrame = spark.range(0, n).select(
        col("id").as("vec_id"),
        normalizeNative(array((0 until dim).map(d =>
          (pmod(hash(col("id") % latent * dim + d), lit(1000)).cast("double")
            / 500.0 - 1.0) +
          (pmod(hash(col("id") * dim + d + 7), lit(1000)).cast("double")
            / 2500.0 - 0.2)): _*)).as("v"))

      val nQ = 20
      val kTop = 5
      def topIds(scored: DataFrame): Map[Long, Seq[Long]] = {
        val w = Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)
        scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= kTop)
          .select("q_id", "vec_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
      }

      val n1 = 1000000L
      val corpus = synth(n1).cache()
      corpus.count()
      val queries = corpus.filter(col("vec_id") < nQ)
        .select(col("vec_id").as("q_id"), col("v").as("qv")).cache()
      val brute = topIds(corpus.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          dotNative(col("v"), col("qv")).as("cosine")))

      val tTrain = timed {
        val (coarse, books, k2) = Ann.trainTwoLevel(corpus, 2, knownN = n1)
        ProbeRound11.twoLevelState = (coarse, books, k2)
      }
      val (coarse, books, k2) = ProbeRound11.twoLevelState
      val lists = Ann.unflatten(books, dim)
      var assigned: DataFrame = null
      val tAssign1M = timed {
        assigned = Ann.assignTwoLevel(corpus, coarse, books, k2).localCheckpoint()
      }
      val nP = Ann.nProbeTwoLevel(lists.length)
      val probed = queries.select(col("q_id"), col("qv"),
          explode(graft.plans.VectorExpressions.probesNative(col("qv"), lists, nP))
            .as("q_cid"))
      val ann = topIds(assigned.join(broadcast(probed),
          col("cid") === col("q_cid") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          dotNative(col("v"), col("qv")).as("cosine")))
      val recall = brute.keys.toSeq.map { q =>
        val b = brute(q).toSet
        ann.getOrElse(q, Nil).count(b.contains).toDouble / b.size
      }.sum / brute.size
      queries.unpersist()

      // flat-cap comparison point: full assignment at N = 512k against
      // the 4096-list flat books (what the one-level path would pay)
      val n0 = 512000L
      val corpus0 = synth(n0).cache()
      corpus0.count()
      val flatBooks = Ann.trainQuantizer(corpus0, 4096, 1,
        sampleCap = Ann.TrainSampleCap, knownN = n0)
      val tAssignFlat = timed {
        corpus0.select(graft.plans.VectorExpressions
            .nearestNative(col("v"), flatBooks).as("cid"))
          .agg(sum("cid")).head
      }
      corpus0.unpersist()
      corpus.unpersist()
      println(f"PROBE two_level n=$n1%d lists=${lists.length}%d k2=$k2%d " +
        f"nProbe=$nP%d recall@5=$recall%5.3f train=$tTrain%6.2fs " +
        f"assign1M=$tAssign1M%6.2fs perRowUs=${tAssign1M * 1e6 / n1}%6.3f " +
        f"flatAssign512k=$tAssignFlat%6.2fs perRowUsFlat=${tAssignFlat * 1e6 / n0}%6.3f")
    }

    // ---- 2. native vs ScalaUDF nearest-centroid assignment ----
    {
      val dim = 64
      val k = 1024
      val n = 256000L
      val cs = Array.tabulate(k, dim)((c, d) =>
        graft.similarity.Ann.planeComponent(c, d))
      val corpus = spark.range(0, n).select(col("id").as("vec_id"),
        array((0 until dim).map(i =>
          (pmod(hash(col("id") * dim + i), lit(1000)).cast("double") / 500.0 - 1.0)
        ): _*).as("v")).cache()
      corpus.count() // materialize the cache outside both timings
      def forceNative(): Long = corpus
        .select(graft.plans.VectorExpressions.nearestNative(col("v"), cs).as("cid"))
        .agg(sum("cid")).head.getLong(0)
      def forceUdf(): Long = corpus
        .select(graft.similarity.Ann.nearestUdf(cs)(col("v")).as("cid"))
        .agg(sum("cid")).head.getLong(0)
      forceNative(); forceUdf() // codegen/JIT warm
      var sNative = 0L; var sUdf = 0L
      val tNative = (1 to 3).map(_ => timed { sNative = forceNative() }).min
      val tUdf = (1 to 3).map(_ => timed { sUdf = forceUdf() }).min
      require(sNative == sUdf, s"assignment checksum mismatch: $sNative vs $sUdf")
      // the other two N-row ScalaUDF passes, same corpus: PQ coding
      // (every PQ build/index) and SRP bucketing (ann_lsh +
      // embedding dedup)
      val books = Array.tabulate(8, 64, 8)((m, c, i) =>
        graft.similarity.Ann.planeComponent(m * 64 + c, i))
      def forcePq(native: Boolean): Long = corpus
        .select((if (native)
          graft.plans.VectorExpressions.pqCodesNative(col("v"), books)
        else graft.similarity.Ann.pqCodesUdf(books, 8)(col("v"))).as("codes"))
        .select(element_at(col("codes"), 1).as("c0"))
        .agg(sum("c0")).head.getLong(0)
      forcePq(true); forcePq(false)
      var pqN = 0L; var pqU = 0L
      val tPqN = (1 to 3).map(_ => timed { pqN = forcePq(true) }).min
      val tPqU = (1 to 3).map(_ => timed { pqU = forcePq(false) }).min
      require(pqN == pqU, s"pq codes checksum mismatch: $pqN vs $pqU")
      def forceSrp(native: Boolean): Long = corpus
        .select((if (native)
          graft.similarity.Ann.srpBuckets(col("v"), 8, 5)
        else graft.similarity.Ann.srpBucketsUdf(8, 5)(col("v"))).as("b"))
        .select(element_at(col("b"), 1).as("b0"))
        .agg(sum("b0")).head.getLong(0)
      forceSrp(true); forceSrp(false)
      var srpN = 0L; var srpU = 0L
      val tSrpN = (1 to 3).map(_ => timed { srpN = forceSrp(true) }).min
      val tSrpU = (1 to 3).map(_ => timed { srpU = forceSrp(false) }).min
      require(srpN == srpU, s"srp checksum mismatch: $srpN vs $srpU")
      corpus.unpersist()
      println(f"PROBE ann_assign n=$n%d k=$k%d dim=$dim%d " +
        f"native=$tNative%6.2fs udf=$tUdf%6.2fs speedup=${tUdf / tNative}%4.2fx")
      println(f"PROBE pq_codes n=$n%d nSub=8 ksub=64 native=$tPqN%6.2fs " +
        f"udf=$tPqU%6.2fs speedup=${tPqU / tPqN}%4.2fx")
      println(f"PROBE srp_buckets n=$n%d tables=8 bits=5 native=$tSrpN%6.2fs " +
        f"udf=$tSrpU%6.2fs speedup=${tSrpU / tSrpN}%4.2fx")
    }

    spark.stop()
  }
}
