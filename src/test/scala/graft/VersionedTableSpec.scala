package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Commit-log versioned table (SURVEY §2.7): the three guarantees the
  * round-4 verdict said the independent dir-swapping writers lacked —
  * snapshot isolation across maintenance ops, time travel, and
  * crash-safe atomic commits.
  */
class VersionedTableSpec extends SparkSpec {

  private def freshTable(name: String): String = {
    val p = s"tmp/vt-test/$name"
    val root = Paths.get(p)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq.reverse.foreach(Files.delete))
    }
    p
  }

  private def base = core.Tables.load(spark, sf, "nation")
    .select(col("n_nationkey").as("k"), col("n_name").as("v"))

  test("time travel: every version reads exactly its committed state") {
    val t = freshTable("travel")
    val v1 = VersionedTable.overwrite(spark, t, base)
    val extra = spark.range(100, 103).select(col("id").as("k"), lit("NEW").as("v"))
    val v2 = VersionedTable.append(spark, t, extra)
    val upd = spark.range(0, 2).select(col("id").as("k"), lit("UPDATED").as("v"))
    val v3 = VersionedTable.upsert(spark, t, upd, "k")
    assert(Seq(v1, v2, v3) === Seq(1L, 2L, 3L), "monotone versions")
    val r1 = VersionedTable.read(spark, t, Some(v1))
    assert(r1.except(base).isEmpty && base.except(r1).isEmpty,
      "v1 == original after later commits")
    val r2 = VersionedTable.read(spark, t, Some(v2))
    assert(r2.count() === base.count() + 3, "v2 == v1 + appended rows")
    val r3 = VersionedTable.read(spark, t)
    assert(r3.filter(col("v") === "UPDATED").count() === 2L, "v3 has the upserts")
    assert(r3.count() === r2.count(), "upsert of existing keys adds no rows")
  }

  test("compaction is snapshot-isolated: a pinned reader never sees a mix") {
    val t = freshTable("compact")
    VersionedTable.overwrite(spark, t, base.repartition(8))
    val preVersion = VersionedTable.versions(t).last
    // reader resolves its snapshot BEFORE compaction lands
    val pinned = VersionedTable.read(spark, t, Some(preVersion))
    val before = pinned.collect().toSet
    val v2 = VersionedTable.compact(spark, t, nFiles = 1)
    // the pinned reader's files are untouched: same rows after the
    // "concurrent" commit — the race compactParquet's dir swap loses
    assert(pinned.collect().toSet === before, "pinned snapshot stable through compaction")
    val after = VersionedTable.read(spark, t, Some(v2))
    assert(after.collect().toSet === before, "compaction preserves content exactly")
    // never a mix: each manifest is self-consistent — the union of
    // any two versions' file lists is NOT what any reader resolves
    val f1 = VersionedTable.versions(t).map(v =>
      VersionedTable.read(spark, t, Some(v)).inputFiles.toSet)
    assert(f1(0).intersect(f1(1)).isEmpty,
      "compacted snapshot shares no files with the old one")
  }

  test("racing appends: no lost update — every append's rows survive") {
    // On Linux a rename(2)-based publish silently REPLACES the target,
    // so two racing writers could both "succeed" with one manifest
    // clobbered; and a retry that reuses its pre-race file list drops
    // the winner's files. The hard-link publish + files-from-base
    // closure close both: whatever the interleaving, the final head
    // must contain the base rows plus ALL appended batches.
    val t = freshTable("race")
    VersionedTable.overwrite(spark, t, base)
    val nWriters = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (0 until nWriters).map { i =>
      scala.concurrent.Future {
        VersionedTable.append(spark, t,
          spark.range(1000L + i, 1001L + i).select(col("id").as("k"), lit(s"W$i").as("v")))
      }
    }
    val committed = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures), scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(committed.toSet.size === nWriters, "every writer got a distinct version")
    assert(VersionedTable.versions(t).last === 1L + nWriters, "contiguous log")
    val head = VersionedTable.read(spark, t)
    assert(head.count() === base.count() + nWriters, "no appended batch lost")
    assert(head.filter(col("k") >= 1000).count() === nWriters.toLong)
  }

  test("append/upsert on an uninitialized table fail loudly, not with NoSuchElement") {
    val t = freshTable("uninit")
    val one = spark.range(0, 1).select(col("id").as("k"), lit("X").as("v"))
    val e1 = intercept[IllegalArgumentException](VersionedTable.append(spark, t, one))
    assert(e1.getMessage.contains("uninitialized"))
    val e2 = intercept[IllegalArgumentException](VersionedTable.upsert(spark, t, one, "k"))
    assert(e2.getMessage.contains("uninitialized"))
  }

  test("a crashed mid-commit leaves the old snapshot readable") {
    val t = freshTable("crash")
    VersionedTable.overwrite(spark, t, base)
    val head = VersionedTable.versions(t).last
    // simulate a writer that died after staging data + manifest but
    // BEFORE the atomic rename: orphan data dir + .tmp manifest
    val orphan = Paths.get(t, "data/c9-deadbeef")
    base.limit(1).write.parquet(orphan.toString)
    Files.writeString(Paths.get(t, "_commits/.tmp-dead"),
      "{\"version\": 99, \"op\": \"crashed\", \"files\": []}")
    assert(VersionedTable.versions(t).last === head,
      "in-flight tmp manifest is invisible to the log")
    val r = VersionedTable.read(spark, t)
    assert(r.except(base).isEmpty && base.except(r).isEmpty,
      "old snapshot reads exactly; orphan data is garbage, not corruption")
    // and the log moves on: the next commit takes the next version
    val vNext = VersionedTable.append(spark, t,
      spark.range(500, 501).select(col("id").as("k"), lit("X").as("v")))
    assert(vNext === head + 1, "recovery needs no repair step")
  }
}
