package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The streaming READ over the commit log
  * (sources.VersionedStreamSource): offsets are version numbers,
  * append commits stream their staged files, row-preserving rewrites
  * emit nothing, non-append rewrites fail (or skip, opted in), and
  * checkpoint recovery resumes exactly-once.
  */
class VersionedStreamSpec extends SparkSpec {

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vstream-$tag").toString + "/t"

  private def dfRange(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"), (col("id") * 10).as("v"))

  test("tails appends, ignores compaction, fails on upsert") {
    val t = fresh("tail")
    VersionedTable.overwrite(spark, t, dfRange(0, 100))
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("vtail").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from vtail").count() === 100)
      VersionedTable.append(spark, t, dfRange(100, 250))
      q.processAllAvailable()
      assert(spark.sql("select * from vtail").count() === 250)
      // a compaction rewrites every byte and changes no rows: the
      // stream must deliver NOTHING for it
      VersionedTable.compact(spark, t, nFiles = 2)
      q.processAllAvailable()
      assert(spark.sql("select * from vtail").count() === 250)
      assert(spark.sql("select distinct k from vtail").count() === 250,
        "no row may be delivered twice across the compaction")
      // an upsert is not expressible as inserts: the query must FAIL,
      // not silently duplicate the snapshot
      VersionedTable.upsert(spark, t,
        dfRange(0, 10).withColumn("v", lit(-1L)), "k")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("upsert") || Option(e.getCause)
        .exists(_.getMessage.contains("upsert")))
    } finally q.stop()
  }

  test("refreshViewStream keeps a chain view continuously fresh; restart replays are no-ops") {
    import graft.sources.MaterializedView
    val fact = fresh("rvs-fact")
    val mid = fresh("rvs-mid")
    val dim = fresh("rvs-dim")
    val view = fresh("rvs-view")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rvs-ckpt").toString
    def factRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("k"), (col("id") % 20).as("cid"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))
    VersionedTable.overwrite(spark, fact, factRows(0, 100))
    VersionedTable.overwrite(spark, mid, spark.range(0, 20)
      .select(col("id").as("cid"), (col("id") % 4).as("gid")))
    VersionedTable.overwrite(spark, dim, spark.range(0, 4)
      .select(col("id").as("gid"), concat(lit("G"), col("id")).as("gname")))
    def doRefresh(): Long = MaterializedView.refreshJoinChain(spark, view,
      Seq(fact, mid, dim), Seq(Seq("cid"), Seq("gid")), Seq("gname"), Seq("v"))
    def recompute() = VersionedTable.read(spark, fact)
      .join(VersionedTable.read(spark, mid), "cid")
      .join(VersionedTable.read(spark, dim), "gid")
      .groupBy("gname").agg(
        count(lit(1)).cast("long").as("mv_count"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
    def assertFresh(clue: String): Unit = {
      val got = MaterializedView.read(spark, view)
      val want = recompute()
      assert(got.except(want).isEmpty && want.except(got).isEmpty, clue)
    }
    val q = graft.streaming.Streams.refreshViewStream(spark, fact, ckpt)(doRefresh _)
    try {
      q.processAllAvailable() // initial-snapshot trigger: full refresh
      assertFresh("the initial trigger materializes the view")
      VersionedTable.append(spark, fact, factRows(100, 160))
      q.processAllAvailable()
      assertFresh("a fact append refreshes through the stream")
      // a DIM delete between triggers rides the NEXT fact trigger —
      // the refresh picks up every source's delta, not just the
      // watched one
      VersionedTable.delete(spark, mid, col("cid") % 5 === 0)
      VersionedTable.append(spark, fact, factRows(160, 200))
      q.processAllAvailable()
      assertFresh("a mid delete rides the next trigger's refresh")
    } finally q.stop()
    // restart on the same checkpoint: the replayed/empty trigger's
    // refresh is a NO-OP (the view cursor is the exactly-once
    // authority, not the stream checkpoint)
    val vHead = VersionedTable.versions(view).last
    val q2 = graft.streaming.Streams.refreshViewStream(spark, fact, ckpt)(doRefresh _)
    try {
      q2.processAllAvailable()
      assert(VersionedTable.versions(view).last === vHead,
        "a restart with no new source commits must not move the view")
      assertFresh("still exact after the restart")
      VersionedTable.append(spark, fact, factRows(200, 210))
      q2.processAllAvailable()
      assertFresh("the restarted stream keeps refreshing")
    } finally q2.stop()
  }

  test("refreshViewStreamMulti: a dim-only mutation triggers the refresh by itself") {
    import graft.sources.MaterializedView
    val fact = fresh("rvm-fact")
    val mid = fresh("rvm-mid")
    val dim = fresh("rvm-dim")
    val view = fresh("rvm-view")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rvm-ckpt").toString
    VersionedTable.overwrite(spark, fact, spark.range(0, 100).select(
      col("id").as("k"), (col("id") % 20).as("cid"),
      (col("id") + 1).cast("decimal(12,2)").as("v")))
    VersionedTable.overwrite(spark, mid, spark.range(0, 20)
      .select(col("id").as("cid"), (col("id") % 4).as("gid")))
    VersionedTable.overwrite(spark, dim, spark.range(0, 4)
      .select(col("id").as("gid"), concat(lit("G"), col("id")).as("gname")))
    def doRefresh(): Long = MaterializedView.refreshJoinChain(spark, view,
      Seq(fact, mid, dim), Seq(Seq("cid"), Seq("gid")), Seq("gname"), Seq("v"))
    def assertFresh(clue: String): Unit = {
      val want = VersionedTable.read(spark, fact)
        .join(VersionedTable.read(spark, mid), "cid")
        .join(VersionedTable.read(spark, dim), "gid")
        .groupBy("gname").agg(
          count(lit(1)).cast("long").as("mv_count"),
          sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
      val got = MaterializedView.read(spark, view)
      assert(got.except(want).isEmpty && want.except(got).isEmpty, clue)
    }
    val q = graft.streaming.Streams.refreshViewStreamMulti(
      spark, Seq(fact, mid), ckpt)(doRefresh _)
    try {
      q.processAllAvailable()
      assertFresh("initial trigger")
      // a MID-ONLY COW delete — the fact log never moves, and a
      // delete is not append-expressible — must still wake the
      // refresh through the union's second leg (the watcher skips
      // rewrite content; the refresh reads the real delta itself)
      VersionedTable.delete(spark, mid, col("cid") % 5 === 0)
      q.processAllAvailable()
      assertFresh("a dim-side-only mutation refreshed the view")
      // and fact commits still trigger through the first leg
      VersionedTable.append(spark, fact, spark.range(100, 140).select(
        col("id").as("k"), (col("id") % 20).as("cid"),
        (col("id") + 1).cast("decimal(12,2)").as("v")))
      q.processAllAvailable()
      assertFresh("fact appends keep triggering")
    } finally q.stop()
  }

  test("a clone carrying live MoR deletion vectors streams without resurrecting rows") {
    val src = fresh("clonesrc")
    val dst = fresh("clonedst")
    VersionedTable.overwrite(spark, src, dfRange(0, 100))
    VersionedTable.deleteMoR(spark, src, col("k") < 20)
    // cloneTable republishes the source's manifest as dst's v1 —
    // deletion vectors INCLUDED; the stream's initial-snapshot batch
    // must subtract them (the round-7 advisory resurrection path)
    VersionedTable.cloneTable(spark, src, dst)
    assert(VersionedTable.deletionVectors(dst).nonEmpty,
      "precondition: the clone's v1 carries the source's deletion vectors")
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", dst).load()
      .writeStream.format("memory").queryName("vclonedv").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from vclonedv").count() === 80,
        "the v1 snapshot batch must subtract the inherited deletion vectors")
      assert(spark.sql("select * from vclonedv where k < 20").count() === 0,
        "no MoR-deleted row may be resurrected")
      // appends after the clone still stream normally alongside the fix
      VersionedTable.append(spark, dst, dfRange(100, 110))
      q.processAllAvailable()
      assert(spark.sql("select * from vclonedv").count() === 90)
    } finally q.stop()
  }

  test("skipRewrites skips non-append commits; startingVersion bounds the tail") {
    val t = fresh("skip")
    VersionedTable.overwrite(spark, t, dfRange(0, 50))
    VersionedTable.append(spark, t, dfRange(50, 80))
    VersionedTable.upsert(spark, t, dfRange(0, 5).withColumn("v", lit(-1L)), "k")
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", t).option("skipRewrites", "true")
      .option("startingVersion", "1") // skip the v1 snapshot: tail only
      .load()
      .writeStream.format("memory").queryName("vskip").outputMode("append").start()
    try {
      q.processAllAvailable()
      // v2's 30 appended rows; the upsert commit is skipped
      assert(spark.sql("select * from vskip").count() === 30)
      VersionedTable.append(spark, t, dfRange(80, 90))
      q.processAllAvailable()
      assert(spark.sql("select * from vskip").count() === 40)
    } finally q.stop()
  }

  test("checkpoint recovery resumes exactly-once") {
    val t = fresh("ckpt")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vstream-ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft-vstream-out").toString + "/o"
    VersionedTable.overwrite(spark, t, dfRange(0, 100))
    def start() = spark.readStream
      .format("graft.sources.VersionedStreamProvider").option("path", t).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // commits land while NO stream is running
    VersionedTable.append(spark, t, dfRange(100, 160))
    VersionedTable.append(spark, t, dfRange(160, 200))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === 200, "missed or duplicated rows across restart")
    assert(got.select("k").distinct().count() === 200)
    assert(got.agg(sum("v")).head.getLong(0) === (0L until 200L).map(_ * 10).sum)
  }

  test("Trigger.AvailableNow: each run drains exactly to the head and terminates (incremental batch)") {
    // the Delta "streaming as incremental batch" pattern: a scheduled
    // job runs the stream with AvailableNow, consumes every version
    // committed since its checkpoint, and EXITS — no long-running
    // cluster, exactly-once across runs
    val t = fresh("avnow")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-avnow-ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft-avnow-out").toString + "/o"
    VersionedTable.overwrite(spark, t, dfRange(0, 100))
    VersionedTable.append(spark, t, dfRange(100, 150))
    def runOnce(): Unit = {
      val q = spark.readStream
        .format("graft.sources.VersionedStreamProvider").option("path", t).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "AvailableNow must self-terminate")
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 150, "first run drains to the head")
    // commits land between runs; the next run consumes ONLY the delta
    VersionedTable.append(spark, t, dfRange(150, 210))
    VersionedTable.compact(spark, t) // row-preserving rewrite: no rows
    runOnce()
    val got = spark.read.parquet(out)
    assert(got.count() === 210, "second run drains the delta, nothing twice")
    assert(got.select("k").distinct().count() === 210)
  }

  test("a stream starts over a CDC-sink table: v1 is a snapshot whatever op created it") {
    // the CDC sink's FIRST commit lands as op 'merge' via initOrMerge;
    // v1 is the table's initial snapshot regardless of op name, so a
    // consumer must be able to start there — only LATER merges rewrite
    // rows and must fail the insert-only stream
    val t = fresh("cdcv1")
    val lww = (cur: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =>
      cur.unionByName(b).groupBy("k").agg(max("v").as("v"))
    VersionedTable.initOrMerge(spark, t, dfRange(0, 80), lww)
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("cdcv1").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from cdcv1").head.getLong(0) === 80,
        "v1 'merge' snapshot must stream as inserts")
      VersionedTable.initOrMerge(spark, t, dfRange(0, 10), lww) // a REAL merge
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("a column renamed TWICE mid-stream still delivers values under the stream's start-time name") {
    val t = fresh("ren2")
    VersionedTable.overwrite(spark, t, dfRange(0, 50)) // (k, v)
    VersionedTable.renameColumn(spark, t, "v", "metric")
    // stream starts AFTER the first rename: its pinned schema says
    // 'metric', an INTERMEDIATE logical once the second rename lands
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("ren2").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select sum(metric) from ren2").head.getLong(0) ===
        (0L until 50L).map(_ * 10).sum)
      VersionedTable.renameColumn(spark, t, "metric", "score")
      VersionedTable.append(spark, t,
        spark.range(50, 60).select(col("id").as("k"), (col("id") * 10).as("score")))
      q.processAllAvailable()
      // the appended batch must arrive with VALUES (resolved through
      // the rename chain to the stable physical name), not nulls
      assert(spark.sql("select sum(metric) from ren2").head.getLong(0) ===
        (0L until 60L).map(_ * 10).sum,
        "twice-renamed column must not silently read as NULL mid-stream")
    } finally q.stop()
  }

  test("an ADD COLUMN commit mid-stream emits nothing and the stream survives") {
    // round 12: add_column is a metadata-only commit (files carried by
    // reference) — like rename/drop/constraint commits it must emit
    // zero rows, not kill a live consumer with a rewrite error
    val t = fresh("addc")
    VersionedTable.overwrite(spark, t, dfRange(0, 50)) // (k, v)
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .option("path", t).load()
      .writeStream.format("memory").queryName("addc").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select count(*) from addc").head.getLong(0) === 50)
      VersionedTable.addColumn(spark, t, "w", org.apache.spark.sql.types.LongType)
      q.processAllAvailable() // must not throw, must not re-emit
      assert(spark.sql("select count(*) from addc").head.getLong(0) === 50,
        "a metadata-only ADD COLUMN must emit zero rows")
      // appends after the add still deliver (the stream's pinned
      // start-time schema simply never sees the new column)
      VersionedTable.append(spark, t,
        spark.range(50, 60).select(col("id").as("k"), (col("id") * 10).as("v"),
          lit(1L).as("w")))
      q.processAllAvailable()
      assert(spark.sql("select count(*) from addc").head.getLong(0) === 60)
    } finally q.stop()
  }

  test("atomic fan-out: one micro-batch into TWO tables via a catalog txn, exactly-once across restart") {
    val bronze = fresh("fan-bronze")
    val evens = fresh("fan-evens")
    val odds = fresh("fan-odds")
    val cat = fresh("fan-cat")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fan-ck").toString
    VersionedTable.overwrite(spark, bronze, dfRange(0, 100))
    // targets must exist before enrollment (catalog contract)
    VersionedTable.overwrite(spark, evens, dfRange(0, 2).filter(col("k") % 2 === 0))
    VersionedTable.overwrite(spark, odds, dfRange(0, 2).filter(col("k") % 2 === 1))
    def start() = {
      val in = spark.readStream
        .format("graft.sources.VersionedStreamProvider")
        .option("path", bronze).option("startingVersion", "1").load()
      graft.streaming.Streams.fanoutStreamCatalog(in, cat, Seq(
        evens -> ((b: org.apache.spark.sql.DataFrame) => b.filter(col("k") % 2 === 0)),
        odds -> ((b: org.apache.spark.sql.DataFrame) => b.filter(col("k") % 2 === 1))),
        ckpt, "fanout-test")
    }
    val q1 = start()
    try {
      VersionedTable.append(spark, bronze, dfRange(100, 160))
      q1.processAllAvailable()
      assert(VersionedTable.read(spark, evens).count() === 1 + 30)
      assert(VersionedTable.read(spark, odds).count() === 1 + 30)
      // both tables' pins advanced in the SAME catalog transactions
      val pins = VersionedTable.catalogSnapshot(cat).toMap
      assert(pins.keySet === Set(evens, odds))
    } finally q1.stop()
    // bronze advances while no stream runs; the restart replays from
    // the checkpoint and the catalog watermark absorbs the replay —
    // exactly-once across BOTH tables simultaneously
    VersionedTable.append(spark, bronze, dfRange(160, 200))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(VersionedTable.read(spark, evens).count() === 1 + 50,
        "missed or duplicated even rows across restart")
      assert(VersionedTable.read(spark, odds).count() === 1 + 50,
        "missed or duplicated odd rows across restart")
      assert(VersionedTable.lastCatalogTxn(cat, "fanout-test").nonEmpty,
        "catalog txn watermark recorded")
      val pins = VersionedTable.catalogSnapshot(cat).toMap
      assert(pins(evens) === VersionedTable.versions(evens).last &&
        pins(odds) === VersionedTable.versions(odds).last,
        "catalog pins sit at both member heads")
    } finally q2.stop()
  }

  test("medallion hop: versioned read -> transform -> idempotent versioned append, exactly-once across restart") {
    // bronze -> silver entirely over the commit log: the stream READS
    // bronze versions (replayable — batches are pure functions of
    // immutable manifests) and APPENDS to silver through the (appId,
    // batchId) txn watermark, so the restart's replayed batch cannot
    // double-append. Silver must equal the batch transform of bronze
    // at every quiescent point.
    val bronze = fresh("bronze")
    val silver = fresh("silver")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-medallion-ck").toString
    VersionedTable.overwrite(spark, bronze, dfRange(0, 100))
    def silverExpected = VersionedTable.read(spark, bronze)
      .filter(col("k") % 2 === 0).select(col("k"), (col("v") + 1).as("v1"))
    def start() = {
      val in = spark.readStream
        .format("graft.sources.VersionedStreamProvider").option("path", bronze).load()
        .filter(col("k") % 2 === 0).select(col("k"), (col("v") + 1).as("v1"))
      graft.streaming.Streams.appendStreamVersioned(in, silver, ckpt, "medallion-test")
    }
    val q1 = start()
    try {
      q1.processAllAvailable()
      VersionedTable.append(spark, bronze, dfRange(100, 180))
      q1.processAllAvailable()
      val got = VersionedTable.read(spark, silver)
      assert(got.count() === 90 && got.except(silverExpected).isEmpty &&
        silverExpected.except(got).isEmpty, "silver == transform(bronze)")
    } finally q1.stop()
    // bronze advances while no stream runs; restart resumes from the
    // checkpoint and the txn watermark guards any batch replay
    VersionedTable.append(spark, bronze, dfRange(180, 240))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = VersionedTable.read(spark, silver)
      assert(got.count() === 120, "missed or duplicated rows across restart")
      assert(got.except(silverExpected).isEmpty && silverExpected.except(got).isEmpty)
      assert(VersionedTable.lastTxn(silver, "medallion-test").nonEmpty,
        "txn watermark recorded in the silver log")
    } finally q2.stop()
  }

  test("short name and user schema: format('graft-versioned') would need registration; class name works with explicit schema") {
    val t = fresh("schema")
    VersionedTable.overwrite(spark, t, dfRange(0, 10))
    // user-pinned schema narrows the stream to a column subset
    val q = spark.readStream.format("graft.sources.VersionedStreamProvider")
      .schema(new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType))
      .option("path", t).load()
      .writeStream.format("memory").queryName("vproj").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select * from vproj")
      assert(rows.columns.toSeq === Seq("k") && rows.count() === 10)
    } finally q.stop()
  }
}
