package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming pipelines (SURVEY.md §2.8). The batch twin of
  * the windowed aggregation is Relational.qWindowTumbling, which is
  * what the oracle checks; these run in specs against MemoryStream.
  */
object Streams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Event-time tumbling window + watermark aggregation. Works on any
    * streaming Dataset[Event] (MemoryStream in tests, Kafka/file in
    * production — source choice doesn't alter the plan).
    */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Stream-stream inner join: for each left event, right events of
    * the same user within the following hour. Watermarks bound the
    * join state on both sides (without them state grows forever).
    */
  def streamStreamJoin(a: Dataset[Event], b: Dataset[Event]): DataFrame =
    a.withWatermark("ts", "2 hours").alias("a")
      .join(
        b.withWatermark("ts", "2 hours").alias("b"),
        expr("""a.user_id = b.user_id
                AND a.event_id <> b.event_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"""))
      .select(col("a.event_id").as("left_id"), col("b.event_id").as("right_id"),
        col("a.user_id").as("user_id"))

  /** Stream-stream LEFT OUTER time-bounded join — the harder state
    * contract next to [[streamStreamJoin]]: an unmatched left event
    * CANNOT be emitted until the watermark proves no matching right
    * event can still arrive, so null-padded rows surface only after
    * the right watermark passes the join window's upper bound. Both
    * the time-bound in the condition AND the watermarks are mandatory
    * for outer joins (Spark rejects the query otherwise — unbounded
    * state could never prove a non-match).
    */
  def streamStreamLeftOuter(a: Dataset[Event], b: Dataset[Event]): DataFrame =
    a.withWatermark("ts", "2 hours").alias("a")
      .join(
        b.withWatermark("ts", "2 hours").alias("b"),
        expr("""a.user_id = b.user_id
                AND a.event_id <> b.event_id
                AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"""),
        "left_outer")
      .select(col("a.event_id").as("left_id"), col("b.event_id").as("right_id"),
        col("a.user_id").as("user_id"))

  /** Stream-static join: enrich the stream with a dimension table.
    * The static side is planned per micro-batch as an ordinary join —
    * no streaming state at all, which is why this is the right shape
    * for slowly-changing dims at scale. The broadcast decision is the
    * planner's size-checked call (same policy as the batch operators:
    * no forced hint on a caller-supplied table that may scale — a
    * small dim still broadcasts, an outgrown one degrades to a shuffle
    * join instead of an OOM in every micro-batch).
    */
  def streamStaticEnrich(events: Dataset[Event], dim: DataFrame): DataFrame =
    events.join(dim, col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"),
        col("c_mktsegment").as("segment"), col("value"))

  case class Doc(doc_id: Long, ts: Timestamp, lang: String, text: String)

  /** Streaming corpus ingest — the streaming twin of
    * [[graft.operators.Pipeline.corpusBuild]]'s filter+dedup stages:
    * per-document quality gates (pure narrow expressions), then exact
    * dedup on the 8-byte content hash with state BOUNDED BY THE
    * WATERMARK (dropDuplicatesWithinWatermark — a plain dropDuplicates
    * would grow state forever on a long-running ingest). Emits the
    * surviving documents in append mode; downstream aggregation /
    * sinks compose per micro-batch.
    */
  def corpusIngest(docs: Dataset[Doc], minTokens: Int = 3,
      minAlpha: Double = 0.5): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      // gates come from the shared helpers so the streaming twin
      // cannot drift from Pipeline.corpusBuild
      .withColumn("n_tokens", graft.functions.TextFunctions.nTokens(col("text")))
      .withColumn("alpha_ratio", graft.functions.TextFunctions.alphaRatio(col("text")))
      .filter(col("n_tokens") >= minTokens && col("alpha_ratio") > minAlpha)
      // same (hash, length) dedup key the batch dedups use — hash
      // alone widens the collision surface the 16-byte key narrows
      .withColumn("h", xxhash64(col("text")))
      .withColumn("len", length(col("text")))
      .dropDuplicatesWithinWatermark("h", "len")
      .select("doc_id", "ts", "lang", "text", "n_tokens")

  /** Last-writer-wins merge of a CDC snapshot STATE with a change
    * batch — the pure function both the batch operator and the
    * streaming sink share. Tombstones (op='delete') are RETAINED in
    * the state so a late-arriving older upsert cannot resurrect a
    * deleted key; only the read view filters them. Merge is
    * idempotent and order-insensitive (max by (ts_s, event_id) is a
    * semilattice), which is exactly what makes foreachBatch replays
    * after a checkpoint recovery safe.
    */
  def cdcSnapshotMerge(state: DataFrame, batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_s").desc, col("event_id").desc)
    state.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Streaming CDC apply — the streaming twin of the batch
    * q_cdc_apply collapse: a change-log stream is merged per
    * micro-batch into a parquet snapshot via foreachBatch (the
    * engine-agnostic core of `MERGE INTO target USING batch`; a
    * lakehouse table format would make the swap transactional —
    * unreachable in this offline sandbox, same plan otherwise).
    * Input columns: user_id, event_id, ts_s, value, op.
    *
    * Scale notes: each micro-batch shuffles ONLY on user_id (state
    * and batch co-partition before the window), and the snapshot
    * rewrite is the compaction step every CDC sink pays; the
    * localCheckpoint materializes the merge so the overwrite never
    * reads the files it is replacing.
    */
  def cdcIngest(changes: DataFrame, snapshotDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // snapshot existence via the Hadoop FileSystem of the PATH —
        // java.io.File would always say "absent" for hdfs://, s3a://
        // etc., and silently reset the snapshot to the current batch
        val p = new org.apache.hadoop.fs.Path(snapshotDir)
        val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
        val cur =
          if (exists) spark.read.parquet(snapshotDir)
          else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            batch.schema)
        cdcSnapshotMerge(cur, batch).localCheckpoint()
          .write.mode("overwrite").parquet(snapshotDir)
      }
      .start()

  /** [[cdcIngest]] with the snapshot routed THROUGH the
    * [[graft.sources.VersionedTable]] commit log instead of a bare
    * dir-overwrite: every micro-batch's LWW merge lands as one atomic
    * commit (readers see batch N's snapshot or batch N+1's, never a
    * half-written overwrite), each micro-batch is a time-travelable
    * version, and a checkpoint REPLAY of a batch re-merges
    * idempotently (the LWW window rule is a semilattice — replaying
    * changes the version count, never the head's rows, which the spec
    * pins). The first batch initializes the table (version 1).
    */
  def cdcIngestVersioned(changes: DataFrame, table: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // an empty trigger (source started before data, or a replayed
        // empty batch) must not commit: an initializing overwrite that
        // stages ZERO part files would publish an empty manifest the
        // next batch's merge cannot even infer a schema from
        if (!batch.isEmpty) {
          val collapsed = cdcSnapshotMerge(batch.limit(0), batch)
          // initOrMerge commits init and merge through ONE closure, so
          // two streams racing the table's first commit serialize on
          // the fail-if-exists publish instead of clobbering each
          // other's overwrite (round-6 advice)
          graft.sources.VersionedTable.initOrMerge(spark, table, collapsed, cdcSnapshotMerge)
        }
        () // foreachBatch wants Unit, not the committed version
      }
      .start()

  /** EXACTLY-ONCE streaming append into a
    * [[graft.sources.VersionedTable]]: each micro-batch commits
    * through [[graft.sources.VersionedTableOps.appendIdempotent]]
    * with the BATCH ID as the transaction version, so a checkpoint
    * replay of the last batch after a crash/restart re-commits
    * nothing (appends have no semilattice to hide behind — the
    * manifest-recorded (appId, batchId) watermark is what closes
    * exactly-once for them). Composed with
    * [[graft.sources.VersionedStreamSource]] on the read side this
    * is a full bronze → silver hop over the commit log: replayable
    * versioned reads upstream, idempotent versioned appends
    * downstream, each batch atomic and time-travelable.
    */
  def appendStreamVersioned(rows: DataFrame, table: String,
      checkpointDir: String, appId: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // empty triggers commit nothing (same rationale as the CDC
        // sink); skipping cannot break the txn watermark — a replayed
        // batch is empty iff the original was
        if (!batch.isEmpty) {
          graft.sources.VersionedTable.appendIdempotent(
            batch.sparkSession, table, batch, appId, batchId)
        }
        ()
      }
      .start()

  /** Fan ONE micro-batch into N versioned tables ATOMICALLY — the
    * multi-table exactly-once sink: each batch lands as one catalog
    * transaction tagged (appId, batchId)
    * ([[graft.sources.VersionedTableOps.commitAll]]), so a
    * crash-replayed batch commits to ALL routed tables or to none —
    * never to a subset, which per-table idempotent appends alone
    * cannot promise (a crash between two single-table commits leaves
    * the fan-out half-applied until the replay, visible to readers
    * in between). `routes` maps each target to its per-batch
    * transform; the batch is pinned once and shared across routes.
    */
  def fanoutStreamCatalog(rows: DataFrame, catalog: String,
      routes: Seq[(String, DataFrame => DataFrame)],
      checkpointDir: String, appId: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val pinned = batch.localCheckpoint(true) // staged once per route
          try {
            graft.sources.VersionedTable.commitAll(batch.sparkSession, catalog,
              routes.map { case (t, f) => graft.sources.CatAppend(t, f(pinned)) },
              Some(appId -> batchId))
          } finally pinned.unpersist()
        }
        ()
      }
      .start()

  /** Keep a materialized view CONTINUOUSLY fresh against a versioned
    * source: tail the source's commit log
    * ([[graft.sources.VersionedStreamProvider]]) and run `doRefresh`
    * once per micro-batch. The batch CONTENT is deliberately ignored
    * — the commit-log event is only the TRIGGER: the refresh reads
    * its own delta via `changesBetween` from its own cursor, and the
    * cursor commits atomically with the refreshed state, so the VIEW
    * CURSOR (not the stream checkpoint) is the exactly-once
    * authority. A crash-replayed or coalesced trigger re-runs a
    * refresh that is a no-op or a correct catch-up — never a double
    * count; a refresh that dies mid-way publishes nothing and the
    * next trigger retries. This composes every refresh flavor
    * (single-table, join, chain, min/max, stats) into a streaming
    * pipeline with zero new state machinery. For a CHAIN view, tail
    * the FACT table (the high-rate side) and let each trigger pick up
    * whatever the dims did in between — their terms ride the same
    * refresh.
    */
  def refreshViewStream(spark: org.apache.spark.sql.SparkSession,
      source: String, checkpointDir: String)(doRefresh: () => Long)
      : org.apache.spark.sql.streaming.StreamingQuery =
    refreshViewStreamMulti(spark, Seq(source), checkpointDir)(doRefresh)

  /** [[refreshViewStream]] watching SEVERAL sources' commit logs —
    * the shape an N-ary chain view needs when its dim sides commit at
    * their own rates (a fact-only watcher would leave a dim-only
    * mutation unapplied until the next fact commit). Each source's
    * rows collapse to a constant tick column before the union (the
    * tables' schemas differ and the CONTENT is ignored anyway), and
    * the one checkpoint tracks every source's version offsets; the
    * refresh stays the exactly-once authority exactly as in the
    * single-source form.
    */
  def refreshViewStreamMulti(spark: org.apache.spark.sql.SparkSession,
      sources: Seq[String], checkpointDir: String)(doRefresh: () => Long)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(sources.nonEmpty, "watch at least one source")
    // skipRewrites: the watcher must WAKE on every commit — append,
    // delete, update, compaction — and a delete is not expressible as
    // inserts, so a content-reading stream would refuse it. Here the
    // content is discarded anyway: a rewrite commit advances the
    // offset with zero rows, the (empty) micro-batch still fires, and
    // the refresh reads the REAL delta via changesBetween from its
    // own cursor — which handles every mutation kind exactly.
    sources.map(s =>
      spark.readStream.format("graft.sources.VersionedStreamProvider")
        .option("path", s).option("skipRewrites", "true").load()
        .select(lit(1).as("tick")))
      .reduce(_ unionByName _)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) =>
        doRefresh()
        ()
      }
      .start()
  }

  /** The read view over the snapshot: tombstones filtered, the
    * q_cdc_apply output shape.
    */
  def cdcSnapshotView(spark: org.apache.spark.sql.SparkSession,
      snapshotDir: String): DataFrame =
    spark.read.parquet(snapshotDir)
      .filter(col("op") === "upsert")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts_s").as("updated_s"), col("value").as("current_value"))

  /** Declarative gap-based sessionization via Spark's NATIVE
    * `session_window` grouping — the form most users reach for before
    * the custom-state machinery in [[sessionize]]. The engine merges
    * overlapping per-event windows ([ts, ts+gap)) into sessions and
    * bounds state by the watermark; no user state machine at all.
    * `session_window.end` is lastSeen + gap by definition, so end_s
    * subtracts the gap back out to report the last event time —
    * making the output directly comparable to [[sessionize]]'s
    * SessionOut and to the batch window-lag twin
    * (Relational.qSessionize), which the spec pins.
    */
  def sessionWindowed(events: Dataset[Event], gapSeconds: Long = 1800L): DataFrame =
    events
      .withWatermark("ts", "10 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        (unix_timestamp(col("session_window.end")) - gapSeconds).as("end_s"),
        col("n_events"))

  case class RunningOut(user_id: Long, n_events: Long, total_value: Double)

  /** Per-key running totals via `transformWithState` — Spark 4's
    * arbitrary-state API (the successor to flatMapGroupsWithState):
    * typed per-key [[ValueState]] managed by the RocksDB state store,
    * explicit TTL, timers when needed. Each micro-batch emits the
    * key's UPDATED running (count, decimal-exact total) — the
    * stateful-enrichment shape (feature backfill, per-entity
    * counters) that outgrows windowed aggregation. State is O(1) per
    * key; totals accumulate in DECIMAL(18,4) cents-exact longs so the
    * running value is partition- and replay-deterministic (the
    * sumMoney rule applied to streaming state).
    */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Event, RunningOut] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[(Long, Long)](
        "running", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[RunningOut] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { e =>
        n += 1
        cents += math.round(e.value * 10000d) // DECIMAL(18,4)-exact
      }
      state.update((n, cents))
      Iterator.single(RunningOut(key, n, cents / 10000d))
    }
  }

  /** The transformWithState pipeline over an event stream. Requires
    * the RocksDB state-store provider (the API's backing store).
    */
  def runningTotals(events: Dataset[Event]): Dataset[RunningOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n_events: Long)

  /** Stateful gap-based sessionization via flatMapGroupsWithState with
    * EVENT-time timeouts: a session closes either when a later event
    * for the same user arrives past the gap, or when the watermark
    * passes lastSeen+gap. Event-time (not processing-time) timeouts
    * keep the operator deterministic and replayable — no wall-clock in
    * the state machine. Custom state is the piece Structured
    * Streaming's built-in windows can't express; everything else stays
    * declarative.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.lastSeen, s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val ts = e.ts.getTime / 1000
              cur match {
                case Some(s) if ts - s.lastSeen <= gapSeconds =>
                  cur = Some(s.copy(lastSeen = ts, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.start, s.lastSeen, s.nEvents)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastSeen + gapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }
}
