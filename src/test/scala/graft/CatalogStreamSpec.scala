package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{CatAppend, InMemoryCommitStore, VersionedTable, VersionedTableOps}

/** The catalog-level streaming READ (sources.CatalogStreamProvider):
  * offsets are CATALOG versions, so a multi-table atomic commit
  * arrives as ONE cross-table-consistent micro-batch — the read half
  * of fanoutStreamCatalog's atomicity — with exactly-once replay
  * across restart, on BOTH commit-store backends.
  */
class CatalogStreamSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cstream-$tag").toString

  private def orders(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("o_id"), (col("id") * 100).as("amount"))

  private def items(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("i_id"),
      concat(lit("sku"), col("id")).as("sku"))

  /** Collect batches through foreachBatch so BATCH BOUNDARIES are
    * observable: (batchId, table, catalogVersion, rowCount) per group.
    */
  private class BatchLog {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long)]
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val groups = batch.groupBy("_table", "_catalog_version")
        .count().collect() // bounded: #tables × #catalog-versions rows
      rows.synchronized {
        groups.foreach(r => rows +=
          ((batchId, r.getString(0), r.getLong(1), r.getLong(2))))
      }
      ()
    }
  }

  private def battery(ops: VersionedTableOps, opsName: String): Unit = {
    val base = freshDir(s"cat-$opsName")
    val cat = s"$base/warehouse"
    val tOrders = s"$cat/orders"
    val tItems = s"$cat/items"
    val ckpt = s"$base/ckpt"

    // member tables exist (v1), then ONE atomic two-table transaction
    ops.overwrite(spark, tOrders, orders(0, 50))
    ops.overwrite(spark, tItems, items(0, 20))
    ops.commitAll(spark, cat, Seq(
      CatAppend(tOrders, orders(50, 80)),
      CatAppend(tItems, items(20, 30))))

    val log = new BatchLog
    def start() = spark.readStream
      .format("graft.sources.CatalogStreamProvider")
      .option("path", cat)
      .option("ops", opsName)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(log.sink _)
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      // catalog v1 must arrive as ONE batch carrying BOTH deltas —
      // each delta including the member's initial snapshot (tversion
      // 0 → pinned), so the consumer can cold-start from the stream
      val v1 = log.rows.filter(_._3 == 1L)
      assert(v1.map(_._2).toSet ===
        Set(tOrders, tItems).map(t => t),
        s"catalog v1 must deliver both members, got $v1")
      assert(v1.map(_._1).distinct.size === 1,
        s"both members' deltas must share ONE batch, got $v1")
      assert(v1.collectFirst { case (_, t, _, n) if t == tOrders => n }
        .contains(80L), "orders delta = initial 50 + appended 30")
      assert(v1.collectFirst { case (_, t, _, n) if t == tItems => n }
        .contains(30L), "items delta = initial 20 + appended 10")

      // a second transaction touching ONE member emits only that delta
      ops.commitAll(spark, cat, Seq(CatAppend(tOrders, orders(80, 95))))
      q.processAllAvailable()
      val v2 = log.rows.filter(_._3 == 2L)
      assert(v2.map(r => (r._2, r._4)).toSet === Set((tOrders, 15L)),
        s"catalog v2 touched only orders, got $v2")
    } finally q.stop()

    // restart on the same checkpoint: nothing replays (exactly-once),
    // and a post-restart transaction arrives whole
    val seen = log.rows.size
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(log.rows.size === seen, "a restart with no new commits replays nothing")
      ops.commitAll(spark, cat, Seq(
        CatAppend(tOrders, orders(95, 100)),
        CatAppend(tItems, items(30, 33))))
      q2.processAllAvailable()
      val v3 = log.rows.filter(_._3 == 3L)
      assert(v3.map(_._1).distinct.size === 1 &&
        v3.map(r => (r._2, r._4)).toSet === Set((tOrders, 5L), (tItems, 3L)),
        s"post-restart transaction arrives whole, got $v3")
    } finally q2.stop()
  }

  test("catalog stream battery — POSIX-link backend") {
    battery(VersionedTable, "")
  }

  test("catalog stream battery — object-store backend") {
    val ops = new VersionedTableOps(new InMemoryCommitStore)
    VersionedTable.registerOps("cstream-mem", ops)
    battery(ops, "cstream-mem")
  }

  test("rows are null-extended onto the by-name union schema") {
    val base = freshDir("cat-union")
    val cat = s"$base/w"
    val tA = s"$cat/a"
    val tB = s"$cat/b"
    VersionedTable.overwrite(spark, tA, orders(0, 10))
    VersionedTable.overwrite(spark, tB, items(0, 5))
    VersionedTable.commitAll(spark, cat, Seq(
      CatAppend(tA, orders(10, 12)), CatAppend(tB, items(5, 6))))
    val got = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = spark.readStream
      .format("graft.sources.CatalogStreamProvider").option("path", cat).load()
      .writeStream.option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect() }; ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(got.toSeq),
      got.head.schema)
    // a's rows carry null sku/i_id; b's rows carry null o_id/amount
    assert(df.columns.toSet ===
      Set("_catalog_version", "_table", "o_id", "amount", "i_id", "sku"))
    assert(df.filter(col("_table") === tA)
      .filter(col("sku").isNotNull || col("i_id").isNotNull).count() === 0)
    assert(df.filter(col("_table") === tB)
      .filter(col("o_id").isNotNull || col("amount").isNotNull).count() === 0)
    assert(df.filter(col("_table") === tA).count() === 12)
    assert(df.filter(col("_table") === tB).count() === 6)
  }

  test("conflicting member types refuse loudly at schema time") {
    val base = freshDir("cat-conflict")
    val cat = s"$base/w"
    VersionedTable.overwrite(spark, s"$cat/x",
      spark.range(3).select(col("id").as("k")))
    VersionedTable.overwrite(spark, s"$cat/y",
      spark.range(3).select(col("id").cast("string").as("k")))
    VersionedTable.commitAll(spark, cat, Seq(
      CatAppend(s"$cat/x", spark.range(3, 4).select(col("id").as("k"))),
      CatAppend(s"$cat/y",
        spark.range(3, 4).select(col("id").cast("string").as("k")))))
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.CatalogStreamProvider")
        .option("path", cat).load()
    }
    assert(e.getMessage.contains("conflict"))
  }
}
