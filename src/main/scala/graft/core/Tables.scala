package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's star-schema testdata (TESTDATA.md).
  *
  * One parquet file per table under `\$dir/<name>.parquet`. All graft
  * operators take `(SparkSession, dir)` and pull tables through here so
  * the scan (with pushed filters / pruned columns) is the only IO path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read the raw int64 nanos and truncate to µs —
      // the same conversion DuckDB applies (ns → its µs timestamp), so
      // oracle comparisons agree. Integer DIV keeps full precision
      // (ns-since-epoch overflows double's 53-bit mantissa).
      // CAVEAT: nanosAsLong is session-global and must stay set while
      // the (lazy) scan executes, so it cannot be restored here. It
      // only changes how TIMESTAMP(NANOS) columns parse, and events is
      // the only such table in this schema; a multi-tenant session
      // would need a dedicated reader session instead.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view (for spark.sql usage). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
