package graft.sources

import org.apache.spark.sql.{DataFrame, GraftStreamingBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming READ over a [[VersionedTable]] commit log —
  * the consumer half of the lakehouse loop (the CDC SINK
  * `Streams.cdcIngestVersioned` writes through the log; this tails
  * it):
  * {{{
  *   spark.readStream
  *     .format("graft.sources.VersionedStreamProvider") // or "graft-versioned"
  *     .option("path", tableDir)
  *     .load()
  * }}}
  *
  * Offsets ARE version numbers: `getOffset` is the manifest head (one
  * O(1) driver-side listing, no data job), and a micro-batch is
  * exactly [[VersionedTableOps.streamBatch]] over `(lastVersion,
  * head]` — append commits stream their staged files (O(added
  * bytes)), row-preserving rewrites (compact / optimize) emit
  * nothing, and non-append rewrites fail the query unless
  * `skipRewrites=true` (see streamBatch's contract). Batches are pure
  * functions of the immutable manifests, so checkpoint recovery
  * replays them byte-identically — exactly-once end to end with an
  * idempotent or transactional sink.
  *
  * Options: `path` (table dir, required); `startingVersion` (exclusive
  * low bound, default 0 = from the table's beginning); `skipRewrites`
  * (default false).
  *
  * Scale: the driver-side cost per trigger is one commit-log listing
  * plus one manifest diff — independent of table size; executors read
  * only the appended files. A 100 TB table with GB-scale appends
  * streams each append once, never rescanning the snapshot.
  */
class VersionedStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  private def tableDir(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned stream needs option 'path' (the table directory)"))

  // Schema resolution happens at every (re)start against the table
  // HEAD: a restart after add-column evolution therefore delivers the
  // evolved schema for all batches, including a replayed one (pre-
  // evolution files read the new columns as null). A long-lived
  // pipeline that needs a byte-stable shape across evolution should
  // pass an explicit .schema(...) — the projection is spec-pinned.
  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val t = tableDir(parameters)
    val s = schema.getOrElse {
      val vs = VersionedTable.versions(t)
      require(vs.nonEmpty,
        s"no commits at $t and no user schema: cannot infer a stream schema")
      VersionedTable.read(sqlContext.sparkSession, t, Some(vs.last)).schema
    }
    (s"graft-versioned:$t", s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = tableDir(parameters)
    val s = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new VersionedStreamSource(sqlContext, t, s,
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("skipRewrites").exists(_.toBoolean))
  }
}

class VersionedStreamSource(sqlContext: SQLContext, table: String,
    override val schema: StructType, startingVersion: Long,
    skipRewrites: Boolean) extends Source {

  // LongOffset round-trips as its decimal string; after checkpoint
  // recovery offsets arrive re-wrapped, so parse the json form rather
  // than pattern-match the class
  private def version(o: V1Offset): Long = o.json.toLong

  override def getOffset: Option[V1Offset] =
    VersionedTable.versions(table).lastOption.map(LongOffset(_))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val vFrom = start.map(version).getOrElse(startingVersion)
    val spark = sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val batch = VersionedTable.streamBatch(
      spark, table, vFrom, version(end), schema, skipRewrites)
    GraftStreamingBridge.streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
