package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, VersionedTable}

/** Measured constants for the four round-8 capabilities (SURVEY §5's
  * artifact-per-claim rule: each new surface ships oracle + battery +
  * a measured scale row — this is the measurement):
  *
  *  1. JOINED MV: incremental delta-join refresh after a small fact
  *     append vs the full join recompute it replaces — the DBToaster
  *     claim is that refresh cost tracks the DELTA, not the snapshot.
  *  2. MIN/MAX MV: pure-append refresh (semilattice, no source
  *     rescan) vs extremum-delete refresh (delta-scoped recompute of
  *     only the touched groups) vs full recompute.
  *  3. DROP PARTITION: wall + bytes written vs the COW delete of the
  *     same rows — the metadata-only claim in numbers.
  *  4. appendAll: two-table atomic transaction vs two separate
  *     appends of the same batches — what atomicity costs.
  *
  * Run: `sbt "Test/runMain graft.ProbeRound8"` (self-contained
  * synthetic tables, ~4M-row fact).
  */
object ProbeRound8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fresh(tag: String): String =
      java.nio.file.Files.createTempDirectory(s"graft-r8-$tag").toString + "/t"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def dirBytes(t: String): Long = {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(java.nio.file.Paths.get(t)))(
        _.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size(_)).sum)
    }

    val nFact = 16000000L
    val nDim = 100000L
    // a payload column gives the fact a real scan cost (3+ GB), so
    // "recompute scans the snapshot, incremental doesn't" is visible
    // above the refresh floor
    def factRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"), (col("id") % nDim).as("fk"),
      (col("id") % 9973).cast("decimal(12,2)").as("v"),
      concat(lit("payload-"), col("id").cast("string"),
        lit("-" + "x" * 160)).as("body"))
    def dimRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("fk"), (col("id") % 25).as("seg"))

    // ---- 1. joined MV: incremental vs full recompute ----
    {
      val fact = fresh("jf"); val dim = fresh("jd"); val view = fresh("jv")
      VersionedTable.overwrite(spark, fact, factRows(0, nFact))
      VersionedTable.overwrite(spark, dim, dimRows(0, nDim))
      val tFull = timed { MaterializedView.refreshJoin(spark, view, fact, dim,
        Seq("fk"), Seq("seg"), Seq("v")) }
      // 0.1% fact append — the nightly-increment shape
      VersionedTable.append(spark, fact, factRows(nFact, nFact + nFact / 1000))
      val tInc = timed { MaterializedView.refreshJoin(spark, view, fact, dim,
        Seq("fk"), Seq("seg"), Seq("v")) }
      // the recompute the incremental refresh replaces
      val tRecompute = timed {
        VersionedTable.read(spark, fact).join(VersionedTable.read(spark, dim), "fk")
          .groupBy("seg").agg(count(lit(1)), sum(col("v").cast("decimal(28,4)")))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[probe-r8] joined-mv: first-full=$tFull%.2fs incremental(0.1%% fact append)=$tInc%.2fs full-recompute=$tRecompute%.2fs ratio=${tRecompute / tInc}%.1fx")
    }

    // ---- 2. min/max MV: append vs extremum-delete vs recompute ----
    {
      val src = fresh("mmsrc"); val view = fresh("mmview")
      // key-clustered layout: the narrow delete's tombstones land in
      // few files, so the MoR CDC fast path and the delta-scoped
      // recompute both stay file-local (the production table shape —
      // an OPTIMIZE-clustered fact)
      VersionedTable.overwrite(spark, src,
        factRows(0, nFact).repartitionByRange(64, col("fk")))
      MaterializedView.refreshMinMax(spark, view, src, Seq("fk"), Seq("v"))
      VersionedTable.append(spark, src, factRows(nFact, nFact + nFact / 1000))
      val tAppend = timed { MaterializedView.refreshMinMax(spark, view, src,
        Seq("fk"), Seq("v")) }
      // narrow MoR delete OF some groups' maxima: the changesBetween
      // MoR fast path hands the refresh just the tombstoned rows (no
      // snapshot diff) and only the touched groups recompute
      VersionedTable.deleteMoR(spark, src,
        col("fk") < 1000 && col("v") > lit(BigDecimal("9000.00")))
      val tMor = timed { MaterializedView.refreshMinMax(spark, view, src,
        Seq("fk"), Seq("v")) }
      // the same shape as a COW delete: rewritten files carry no row
      // journal, so delta extraction inherently pays the symmetric
      // difference — the honest cost of COW mutations to incremental
      // consumers
      VersionedTable.delete(spark, src,
        col("fk") >= 99000 && col("v") < lit(BigDecimal("1000.00")))
      val tCow = timed { MaterializedView.refreshMinMax(spark, view, src,
        Seq("fk"), Seq("v")) }
      val tRecompute = timed {
        VersionedTable.read(spark, src).groupBy("fk")
          .agg(count(lit(1)), min("v"), max("v"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[probe-r8] minmax-mv: append-refresh=$tAppend%.2fs mor-extremum-delete-refresh=$tMor%.2fs cow-extremum-delete-refresh=$tCow%.2fs full-recompute=$tRecompute%.2fs")
    }

    // ---- 3. DROP PARTITION vs COW delete of the same rows ----
    {
      def build(): String = {
        val t = fresh("part")
        val df = spark.range(0, nFact).select(
          col("id").as("k"),
          concat(lit("P"), (col("id") % 16).cast("string")).as("p"),
          (col("id") % 9973).cast("double").as("v"))
        VersionedTable.overwritePartitioned(spark, t, df.repartition(8), Seq("p"))
        t
      }
      val t1 = build()
      val files0 = VersionedTable.snapshotFiles(t1).size
      val b0 = dirBytes(t1)
      val tDrop = timed { VersionedTable.dropPartition(spark, t1, "p", "P3") }
      val dropWritten = dirBytes(t1) - b0
      val files1 = VersionedTable.snapshotFiles(t1).size
      val t2 = build()
      val b1 = dirBytes(t2)
      val tCow = timed { VersionedTable.delete(spark, t2, col("p") === "P3") }
      val cowWritten = dirBytes(t2) - b1
      println(f"[probe-r8] drop-partition: wall=${tDrop * 1000}%.0fms bytes-written=$dropWritten (files $files0->$files1) vs COW-delete wall=$tCow%.2fs bytes-written=${cowWritten / 1e6}%.1fMB")
    }

    // ---- 4. appendAll vs two separate appends ----
    {
      val a = fresh("cata"); val b = fresh("catb"); val cat = fresh("catlog")
      VersionedTable.overwrite(spark, a, factRows(0, 100000))
      VersionedTable.overwrite(spark, b, factRows(0, 100000))
      val n = 10
      val tSeparate = timed {
        for (i <- 0 until n) {
          VersionedTable.append(spark, a, factRows(200000L + i * 1000, 200000L + i * 1000 + 1000))
          VersionedTable.append(spark, b, factRows(200000L + i * 1000, 200000L + i * 1000 + 1000))
        }
      }
      val tAtomic = timed {
        for (i <- 0 until n) {
          VersionedTable.appendAll(spark, cat, Seq(
            a -> factRows(400000L + i * 1000, 400000L + i * 1000 + 1000),
            b -> factRows(400000L + i * 1000, 400000L + i * 1000 + 1000)))
        }
      }
      println(f"[probe-r8] multi-commit: $n separate two-table rounds=$tSeparate%.2fs atomic appendAll rounds=$tAtomic%.2fs per-txn-overhead=${(tAtomic - tSeparate) / n * 1000}%.0fms")
    }

    spark.stop()
  }
}
