package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{CatAppend, MaterializedView, VersionedTable}

/** Measured constants for the round-9 capabilities (SURVEY §5's
  * artifact-per-claim rule — each new surface ships oracle + battery +
  * a measured scale row; this is the measurement):
  *
  *  1. CHAIN MV (3 tables): incremental refresh after a 0.1% fact
  *     append vs the full 3-way join recompute — the telescoping
  *     decomposition's claim is that refresh cost tracks Δfact ⋈ dims,
  *     never snapshot ⋈ snapshot.
  *  2. PARTITION-ALIGNED LEFT JOIN: aligned plan vs the plain left
  *     join at a dim covering half the fact's partition values — the
  *     aligned plan must win by never opening the matched-pair scan
  *     wide and never scanning the dim for unmatched fact values.
  *  3. CATALOG VACUUM with watermark carry: per-manifest driver cost
  *     of the high-water scan over a deep catalog log, and proof the
  *     replay horizon survives (the round-8 advisory's fix, measured).
  *  4. ID COLUMN MAPPING: write + full-scan read throughput, id mode
  *     vs name mode — the mapping is a projection-time rename, so the
  *     measured overhead should be noise.
  *
  * Run: `sbt "Test/runMain graft.ProbeRound9"` (self-contained
  * synthetic tables, 16M-row fact).
  */
object ProbeRound9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-r9-$tag").toString + "/t"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val nFact = 16000000L
    val nMid = 100000L
    // payload gives the fact a real scan cost so "incremental never
    // scans the snapshot" is visible above the refresh floor
    def factRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"), (col("id") % nMid).as("cid"),
      (col("id") % 9973).cast("decimal(12,2)").as("v"),
      concat(lit("payload-"), col("id").cast("string"),
        lit("-" + "x" * 160)).as("body"))
    def midRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("cid"), (col("id") % 100).as("gid"))
    def dimRows() = spark.range(0, 100).select(
      col("id").as("gid"), concat(lit("G"), (col("id") % 25).cast("string")).as("gname"))

    // ---- 1. chain MV: incremental vs full 3-way recompute ----
    {
      val fact = fresh("cf"); val mid = fresh("cm"); val dim = fresh("cd")
      val view = fresh("cv")
      VersionedTable.overwrite(spark, fact, factRows(0, nFact))
      VersionedTable.overwrite(spark, mid, midRows(0, nMid))
      VersionedTable.overwrite(spark, dim, dimRows())
      def refreshIt(): Unit = MaterializedView.refreshJoinChain(spark, view,
        Seq(fact, mid, dim), Seq(Seq("cid"), Seq("gid")), Seq("gname"), Seq("v"))
      val tFull = timed { refreshIt() }
      VersionedTable.append(spark, fact, factRows(nFact, nFact + nFact / 1000))
      val tInc = timed { refreshIt() }
      val tRecompute = timed {
        VersionedTable.read(spark, fact)
          .join(VersionedTable.read(spark, mid), "cid")
          .join(VersionedTable.read(spark, dim), "gid")
          .groupBy("gname").agg(count(lit(1)), sum(col("v").cast("decimal(28,4)")))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[probe-r9] chain-mv: first-full=$tFull%.2fs incremental(0.1%% fact append)=$tInc%.2fs full-recompute=$tRecompute%.2fs ratio=${tRecompute / tInc}%.1fx")
    }

    // ---- 1b. mid-table delta: raw chain vs FACTORED (higher-order)
    // — the raw term joins Δmid against the 16M fact; the factored
    // form joins it against the 100k-row inner aggregate state ----
    {
      val fact = fresh("hf"); val mid = fresh("hm"); val dim = fresh("hd")
      val rawView = fresh("hraw"); val inner = fresh("hin"); val outer = fresh("hout")
      VersionedTable.overwrite(spark, fact, factRows(0, nFact))
      VersionedTable.overwrite(spark, mid, midRows(0, nMid))
      VersionedTable.overwrite(spark, dim, dimRows())
      def refreshRaw(): Unit = MaterializedView.refreshJoinChain(spark, rawView,
        Seq(fact, mid, dim), Seq(Seq("cid"), Seq("gid")), Seq("gname"), Seq("v"))
      def refreshFactored(): Unit = {
        MaterializedView.refresh(spark, inner, fact, Seq("cid"), Seq("v"), viewKey = "fagg")
        MaterializedView.refreshJoinChain(spark, outer,
          Seq(inner, mid, dim), Seq(Seq("cid"), Seq("gid")),
          Seq("gname"), Seq("mv_count", "mv_sum_v"), viewKey = "fchain")
      }
      refreshRaw(); refreshFactored()
      VersionedTable.delete(spark, mid, col("cid") % 100 === 0) // 1% of keys
      val tRawMid = timed { refreshRaw() }
      VersionedTable.delete(spark, mid, col("cid") % 100 === 1)
      val tFactoredMid = timed { refreshFactored() }
      println(f"[probe-r9] mid-delta: raw-chain=$tRawMid%.2fs (joins the 16M fact) factored=$tFactoredMid%.2fs (joins the 100k inner state) ratio=${tRawMid / tFactoredMid}%.1fx")
    }

    // ---- 2. partition-aligned join: where pruning pays and where
    // the union overhead costs (both directions, honestly) ----
    {
      val fact = fresh("pf"); val dim = fresh("pd")
      val nVals = 16
      VersionedTable.overwritePartitioned(spark, fact,
        factRows(0, nFact).withColumn("p",
          concat(lit("P"), (col("k") % nVals).cast("string"))), Seq("p"))
      // dim covers HALF the fact's values
      VersionedTable.overwritePartitioned(spark, dim,
        spark.range(0, nVals / 2).select(
          concat(lit("P"), col("id").cast("string")).as("p"),
          (col("id") * 10).as("w")), Seq("p"))
      def materialize(df: org.apache.spark.sql.DataFrame): Unit =
        df.select(count(lit(1)), sum(col("v").cast("decimal(28,4)")),
          sum(col("w"))).head
      def minOf2(f: => Unit): Double = math.min(timed(f), timed(f))
      // INNER: the aligned plan opens only the 8 matched value dirs of
      // the fact — manifest-level pruning the plain join cannot see
      val tPlainI = minOf2 { materialize(VersionedTable.read(spark, fact)
        .join(VersionedTable.read(spark, dim), Seq("p"))) }
      val tAlignedI = minOf2 {
        materialize(VersionedTable.joinPartitioned(spark, fact, dim, Seq("p"))) }
      // LEFT: every fact row survives, so there is NOTHING to prune —
      // the aligned plan pays its union-of-pairs overhead for free
      // pair-local broadcasts only; measured to bound the overhead
      val tPlainL = minOf2 { materialize(VersionedTable.read(spark, fact)
        .join(VersionedTable.read(spark, dim), Seq("p"), "left_outer")) }
      val tAlignedL = minOf2 { materialize(
        VersionedTable.joinPartitioned(spark, fact, dim, Seq("p"), "left")) }
      val rowsP = VersionedTable.read(spark, fact)
        .join(VersionedTable.read(spark, dim), Seq("p"), "left_outer").count()
      val rowsA = VersionedTable.joinPartitioned(spark, fact, dim, Seq("p"), "left").count()
      require(rowsP == rowsA, s"row mismatch: plain=$rowsP aligned=$rowsA")
      println(f"[probe-r9] aligned-join inner(8/16 values): plain=$tPlainI%.2fs aligned=$tAlignedI%.2fs ratio=${tPlainI / tAlignedI}%.2fx; left(nothing prunable): plain=$tPlainL%.2fs aligned=$tAlignedL%.2fs ratio=${tPlainL / tAlignedL}%.2fx rows=$rowsA")
    }

    // ---- 3. catalog vacuum: watermark-carry scan cost ----
    {
      val a = fresh("va"); val cat = fresh("vcat")
      VersionedTable.overwrite(spark, a, spark.range(0, 10).select(col("id").as("k")))
      val nTxns = 100
      val one = spark.range(0, 1).select(col("id").as("k"))
      val tCommit = timed {
        (1 to nTxns).foreach(i => VersionedTable.commitAll(spark, cat,
          Seq(CatAppend(a, one)), Some("probe" -> i.toLong)))
      }
      val tVacuum = timed {
        val dropped = VersionedTable.catalogVacuum(cat, retain = 2)
        require(dropped.nonEmpty, "the vacuum must drop history")
      }
      require(VersionedTable.lastCatalogTxn(cat, "probe").contains(nTxns.toLong),
        "the high-water mark must survive the vacuum")
      // a replay from below the vacuumed horizon stays a no-op
      val head = VersionedTable.catalogVersions(cat).last
      require(VersionedTable.commitAll(spark, cat,
        Seq(CatAppend(a, one)), Some("probe" -> 1L)) == head,
        "deep replay must be a no-op after the vacuum")
      println(f"[probe-r9] catalog-vacuum: $nTxns txns committed in $tCommit%.2fs (${tCommit / nTxns * 1000}%.0fms/txn), vacuum+carry=$tVacuum%.3fs (${tVacuum / nTxns * 1e6}%.0fus/manifest scanned)")
    }

    // ---- 4. id column mapping: write/read overhead vs name mode ----
    // min-of-2 per side, id first then name, so JVM warm-up cannot
    // flatter the id path
    {
      def writeId(): Double = {
        val t = fresh("idi")
        timed { VersionedTable.overwriteIdMapped(spark, t, factRows(0, nFact)) }
      }
      def writeName(): Double = {
        val t = fresh("idn")
        timed { VersionedTable.overwrite(spark, t, factRows(0, nFact)) }
      }
      def scan(t: String): Double = timed {
        VersionedTable.read(spark, t)
          .select(sum(col("v").cast("decimal(28,4)")), count(col("body"))).head }
      val tWriteId = math.min(writeId(), writeId())
      val tWriteName = math.min(writeName(), writeName())
      val ti = fresh("idi-scan"); val tn = fresh("idn-scan")
      VersionedTable.overwriteIdMapped(spark, ti, factRows(0, nFact))
      VersionedTable.overwrite(spark, tn, factRows(0, nFact))
      val tReadId = math.min(scan(ti), scan(ti))
      val tReadName = math.min(scan(tn), scan(tn))
      println(f"[probe-r9] id-mapping: write name=$tWriteName%.2fs id=$tWriteId%.2fs (${tWriteId / tWriteName}%.2fx), scan name=$tReadName%.2fs id=$tReadId%.2fs (${tReadId / tReadName}%.2fx)")
    }

    spark.stop()
  }
}
