package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one Spark-package bridge graft needs: a DSv1 streaming
  * [[org.apache.spark.sql.execution.streaming.Source]]'s `getBatch`
  * must return a frame flagged `isStreaming = true` (MicroBatchExecution
  * asserts it), and the only constructor for such a frame —
  * `internalCreateDataFrame` — is `private[sql]`. This object lives in
  * `org.apache.spark.sql` purely to re-expose that constructor to
  * [[graft.sources.VersionedStreamSource]]; it contains no other
  * logic and touches no other internals. (The same technique every
  * out-of-tree DSv1 connector uses; the DSv2 MicroBatchStream path
  * avoids it at the cost of reimplementing the parquet reader
  * machinery our batches already get from `spark.read`.)
  */
object GraftStreamingBridge {
  def streamingDataFrame(spark: classic.SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema, isStreaming = true)
}
