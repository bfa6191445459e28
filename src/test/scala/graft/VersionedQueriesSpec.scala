package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** The two commit-log oracle queries (round 6): values must round-trip
  * the manifest machinery unchanged, and the pinned version must
  * survive later commits INCLUDING a compaction that rewrites the
  * head's files.
  */
class VersionedQueriesSpec extends SparkSpec {

  private def target = core.Tables.load(spark, sf, "customer")
    .filter(col("c_custkey") % 3 =!= 0)
    .select(col("c_custkey"), col("c_acctbal"))

  test("q_upsert_versioned == the same merge computed without the commit log") {
    val viaLog = SparkEntry.queries("q_upsert_versioned")(spark, sf)
    val updates = core.Tables.load(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(operators.sumMoney(col("o_totalprice")).as("u_bal"))
    val direct = target.join(updates, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("c_custkey"),
        coalesce(col("u_bal"), col("c_acctbal")).as("c_acctbal"))
    assert(viaLog.except(direct).isEmpty && direct.except(viaLog).isEmpty,
      "manifest-selected read == direct merge")
  }

  test("q_time_travel == the pre-merge slice, and survives a compaction") {
    val pinned = SparkEntry.queries("q_time_travel")(spark, sf)
    assert(pinned.except(target).isEmpty && target.except(pinned).isEmpty,
      "version-1 read == original slice after the upsert landed")
    // the stronger variant the verdict asked for: the pinned snapshot
    // survives a COMPACTION that rewrites the head into new files
    val table = java.nio.file.Files.createTempDirectory("graft-vq-compact").toString + "/t"
    val v1 = VersionedTable.overwrite(spark, table, target)
    VersionedTable.upsert(spark, table,
      spark.range(0, 2).select(col("id").as("c_custkey"), lit(0.0).as("c_acctbal")),
      "c_custkey")
    VersionedTable.compact(spark, table)
    val afterCompact = VersionedTable.read(spark, table, Some(v1))
    assert(afterCompact.except(target).isEmpty && target.except(afterCompact).isEmpty,
      "time travel to v1 intact after compaction rewrote the head")
  }
}
