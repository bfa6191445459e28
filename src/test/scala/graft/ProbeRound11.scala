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
      corpus.unpersist()
      println(f"PROBE ann_assign n=$n%d k=$k%d dim=$dim%d " +
        f"native=$tNative%6.2fs udf=$tUdf%6.2fs speedup=${tUdf / tNative}%4.2fx")
    }

    spark.stop()
  }
}
