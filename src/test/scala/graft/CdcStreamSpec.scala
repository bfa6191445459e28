package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming CDC apply (SURVEY.md §2.8): the foreachBatch MERGE sink
  * must converge to EXACTLY the batch q_cdc_apply collapse over the
  * same change log — including the tombstone rule (a key whose last
  * op is a delete is absent), and regardless of how the log is split
  * across micro-batches.
  */
class CdcStreamSpec extends SparkSpec {

  test("streamed foreachBatch merge == batch q_cdc_apply collapse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-stream").toString
    // the same change-log derivation q_cdc_apply uses, split into 4
    // files so maxFilesPerTrigger=1 yields 4 distinct micro-batches
    val log = core.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"),
        when(col("event_type") === "purchase", "delete").otherwise("upsert").as("op"))
    log.repartition(4).write.parquet(s"$dir/log")

    val stream = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/log")
    val q = Streams.cdcIngest(stream, s"$dir/snapshot", s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()

    val streamed = Streams.cdcSnapshotView(spark, s"$dir/snapshot")
      .collect().map(_.toSeq).toSet
    val batch = operators.ComplexTypes.qCdcApply(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
    // tombstone retention is load-bearing: at least one key must have
    // been deleted (absent from the view, present in raw state)
    val raw = spark.read.parquet(s"$dir/snapshot")
    assert(raw.filter(col("op") === "delete").count() > 0,
      "test log must exercise the delete path")
  }
}
