package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val events = Seq(
    Event(1, ts(5), 10, "click", 1.0),
    Event(2, ts(10), 10, "click", 2.0),
    Event(3, ts(65), 11, "view", 3.0),
    Event(4, ts(70), 10, "click", 4.0),
    Event(5, ts(125), 11, "view", 5.0))

  test("streaming windowed counts equal the batch equivalent") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = Streams.windowedCounts(stream.toDS())
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("win")
      .select(col("hour").cast("string"), col("event_type"), col("n"), col("total_value"))
      .collect().map(_.toSeq).toSet

    val batch = events.toDS()
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("hour").cast("string"), col("event_type"), col("n"), col("total_value"))
      .collect().map(_.toSeq).toSet
    assert(got === batch)
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events ++ events.take(3)) // replay 3 duplicates
    val q = stream.toDS()
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() === events.length)
  }

  test("stream-static join enriches events with the broadcast dim") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = core.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment")
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = Streams.streamStaticEnrich(stream.toDS(), dim)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich")
      .select("event_id", "segment").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val batch = Streams.streamStaticEnrich(events.toDS(), dim)
      .select("event_id", "segment").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got === batch)
    assert(got.size === events.length) // left join keeps every event
  }

  test("stream-stream join matches the batch join within the time bound") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sa = MemoryStream[Event]; val sb = MemoryStream[Event]
    sa.addData(events); sb.addData(events)
    val q = Streams.streamStreamJoin(sa.toDS(), sb.toDS())
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = events.toDS().alias("a")
      .join(events.toDS().alias("b"),
        expr("""a.user_id = b.user_id AND a.event_id <> b.event_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"""))
      .select(col("a.event_id"), col("b.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === batch)
    assert(got.nonEmpty) // events data must actually produce pairs
  }

  test("stream-stream LEFT OUTER join null-pads once the watermark proves non-match") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sa = MemoryStream[Event]; val sb = MemoryStream[Event]
    sa.addData(events); sb.addData(events)
    val q = Streams.streamStreamLeftOuter(sa.toDS(), sb.toDS())
      .writeStream.format("memory").queryName("ssloj").outputMode("append").start()
    q.processAllAvailable()
    // unmatched lefts are withheld until the watermark proves no match
    // can still arrive — push it far past every event with sentinels
    val flush = ts(60 * 24 * 40) // 40 days on: beyond every bound + watermark
    sa.addData(Seq(Event(-1, flush, 99, "flush", 0.0)))
    sb.addData(Seq(Event(-2, flush, 98, "flush", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssloj").filter(col("left_id") >= 0)
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    val batch = events.toDS().alias("a")
      .join(events.toDS().alias("b"),
        expr("""a.user_id = b.user_id AND a.event_id <> b.event_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"""),
        "left_outer")
      .select(col("a.event_id"), col("b.event_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got === batch)
    // the outer semantics must actually bite: some left event has no
    // in-window partner and surfaces null-padded
    assert(got.exists(_._2.isEmpty), s"no null-padded rows in $got")
  }

  test("file-source streaming: new parquet files flow through the windowed agg") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.take(3).toDS().write.parquet(s"$dir/batch1")
    // file streaming source reads a directory of files with a fixed schema
    val src = spark.readStream.schema(events.toDS().schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/batch1")
    val q = Streams.windowedCounts(src.as[Event])
      .writeStream.format("memory").queryName("filewin").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val total = spark.table("filewin").agg(sum("n")).head.getLong(0)
    assert(total === 3L)
  }

  test("token chunker composes with a streaming read (stream output == batch output)") {
    import org.apache.spark.sql.functions.col
    // the chunker is a stateless narrow expression chain, so the SAME
    // transform runs on a streaming frame with no watermark/state
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-chunk").toString
    val batchDocs = core.Tables.load(spark, sf, "documents").select("doc_id", "text").limit(50)
    batchDocs.write.parquet(s"$dir/docs")
    val stream = spark.readStream.schema(batchDocs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/docs")
    val q = operators.TextAnalysis.chunkDocs(stream)
      .writeStream.format("memory").queryName("streamchunk").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("streamchunk").collect().map(_.toSeq).toSet
    val batch = operators.TextAnalysis.chunkDocs(spark.read.parquet(s"$dir/docs"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch && batch.nonEmpty)
    assert(spark.table("streamchunk").filter(col("n_tokens") > 32).isEmpty)
  }

  test("streaming corpus ingest: quality-filters then dedups within watermark") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Streams.Doc(1, ts(5), "en", "the quick brown fox jumps"),
      Streams.Doc(2, ts(6), "en", "the quick brown fox jumps"), // exact dup of 1
      Streams.Doc(3, ts(7), "de", "der schnelle braune fuchs springt"),
      Streams.Doc(4, ts(8), "en", "1234 5678 9012"),            // fails alpha gate
      Streams.Doc(5, ts(9), "en", "too short"),                  // fails token gate
      Streams.Doc(6, ts(10), "en", "a completely different document text"))
    val stream = MemoryStream[Streams.Doc]
    stream.addData(docs)
    val q = Streams.corpusIngest(stream.toDS())
      .writeStream.format("memory").queryName("ingest").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ingest")
    // dup collapsed, low-quality rows gone
    assert(got.count() === 3)
    assert(got.select("text").distinct().count() === 3)
    val batch = docs.toDS()
      .withColumn("n_tokens", size(split(col("text"), "\\s+")).cast("long"))
      .filter(col("n_tokens") >= 3 &&
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
          length(col("text")).cast("double") > 0.5)
      .dropDuplicates("text")
    assert(got.select("text").collect().map(_.getString(0)).toSet ===
      batch.select("text").collect().map(_.getString(0)).toSet)
  }

  test("streaming ingest recovers dedup state across a checkpointed restart") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-out").toString
    val stream = MemoryStream[Streams.Doc]
    // memory sink cannot recover from a checkpoint; the file sink can
    def start() = Streams.corpusIngest(stream.toDS())
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    stream.addData(Seq(
      Streams.Doc(1, ts(5), "en", "the quick brown fox jumps"),
      Streams.Doc(2, ts(6), "de", "der schnelle braune fuchs springt")))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint; replay a pre-restart text (dup) and
    // add a genuinely new one — recovered state must drop the dup
    stream.addData(Seq(
      Streams.Doc(3, ts(7), "en", "the quick brown fox jumps"), // dup of doc 1
      Streams.Doc(4, ts(8), "en", "a brand new document arrives here")))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 4L), s"got $got")
  }

  test("native session_window sessionization equals the batch window-lag twin on the events table") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real corpus, not a toy: every event at sf0.001 through the
    // declarative session_window pipeline
    val corpus = core.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val maxTs = corpus.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    stream.addData(corpus)
    val q = Streams.sessionWindowed(stream.toDS())
      .writeStream.format("memory").queryName("sesswin").outputMode("append").start()
    q.processAllAvailable()
    // append mode only emits sessions the watermark has CLOSED — push
    // it past every real session with one far-future sentinel event
    // from a user id the corpus can't contain
    stream.addData(Seq(Event(-1L, new Timestamp(maxTs + 86400L * 1000), -1L, "x", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sesswin").filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    val want = graft.operators.Relational.qSessionize(spark, sf)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session_window stream also matches the custom flatMapGroupsWithState sessionize") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = Streams.sessionWindowed(stream.toDS())
      .writeStream.format("memory").queryName("sesswin2").outputMode("append").start()
    q.processAllAvailable()
    stream.addData(Seq(Event(-1L, ts(60 * 24), -1L, "x", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sesswin2").filter(col("user_id") >= 0)
      .select("user_id", "start_s", "end_s", "n_events")
      .collect().map(_.toSeq).toSet
    // the custom-state operator's output on the same five events:
    // user 10 sessions (:05-:10)x2ev + (:70)x1, user 11 (:65)x1 + (2:05)x1
    def s(m: Int) = ts(m).getTime / 1000
    val want = Set(
      Seq[Any](10L, s(5), s(10), 2L), Seq[Any](10L, s(70), s(70), 1L),
      Seq[Any](11L, s(65), s(65), 1L), Seq[Any](11L, s(125), s(125), 1L))
    assert(got === want)
  }

  test("transformWithState running totals converge to the batch aggregate") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState is backed by the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Event]
      val q = Streams.runningTotals(stream.toDS())
        .writeStream.format("memory").queryName("running").outputMode("update").start()
      // two batches so the second proves state carried across batches
      stream.addData(events.take(3))
      q.processAllAvailable()
      stream.addData(events.drop(3))
      q.processAllAvailable()
      q.stop()
      // update mode: the LAST row per key is the converged running total
      val got = spark.table("running")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("n_events").desc)))
        .filter(col("rn") === 1).drop("rn")
        .as[Streams.RunningOut].collect().map(r => r.user_id -> (r.n_events, r.total_value)).toMap
      val want = events.groupBy(_.user_id).map { case (u, es) =>
        u -> (es.size.toLong, es.map(_.value).sum)
      }
      assert(got === want)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful sessionize closes sessions across >30min gaps") {
    import TestSpark.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess").as[Streams.SessionOut].collect()
    // user 10: events at :05,:10 then :70 → first session closed in-batch
    val u10 = closed.filter(_.user_id === 10)
    assert(u10.exists(s => s.n_events === 2))
    // user 11: :65 then 2:05 → gap 60min closes first session
    val u11 = closed.filter(_.user_id === 11)
    assert(u11.exists(s => s.n_events === 1))
  }
}
