package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, VersionedTable}

/** Incrementally maintained materialized views (SURVEY §2.7): every
  * refresh must land the view EXACTLY at the full recompute of its
  * defining aggregate over the source head — across append, predicate
  * (copy-on-write) delete, MoR delete, upsert, and compaction commits
  * — while the refresh cursor makes replays no-ops.
  */
class MaterializedViewSpec extends SparkSpec {

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mv-$tag").toString + "/t"

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id"),
      (col("id") % 7).as("k"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))

  /** The view's defining aggregate, recomputed from scratch. */
  private def full(source: String): DataFrame =
    VersionedTable.read(spark, source).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))

  private def assertFresh(view: String, source: String, clue: String): Unit = {
    val got = MaterializedView.read(spark, view)
    val want = full(source)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"$clue: view != full recompute")
  }

  test("overflow guards: a 10^24 delta row and a too-wide decimal both fail loudly") {
    val src = fresh("ovf-src")
    val view = fresh("ovf-view")
    VersionedTable.overwrite(spark, src,
      spark.range(0, 10).select((col("id") % 3).as("k"), (col("id") * 1.5).as("v")))
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    val vBefore = VersionedTable.versions(view).last
    // a double beyond DECIMAL(28,4)'s range would cast to NULL per row
    // under non-ANSI semantics — sum() would skip it while mv_count
    // still counted the row, silently diverging from a full recompute
    VersionedTable.append(spark, src,
      spark.range(0, 1).select(lit(99L).as("k"), lit(1e25).as("v")))
    val e = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("overflow"))
    assert(VersionedTable.versions(view).last === vBefore,
      "the refused refresh must publish nothing")
    // a source decimal too wide for the state type is rejected
    // STATICALLY, before any data is scanned
    val src2 = fresh("ovf-wide")
    val view2 = fresh("ovf-wide-view")
    VersionedTable.overwrite(spark, src2, spark.range(0, 5)
      .select((col("id") % 2).as("k"), col("id").cast("decimal(30,0)").as("v")))
    val e2 = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark, view2, src2, Seq("k"), Seq("v"))
    }
    assert(e2.getMessage.contains("decimal(30,0)"))
  }

  test("refresh tracks append, COW delete, MoR delete, upsert, compaction; replay is a no-op") {
    val src = fresh("src")
    val view = fresh("view")
    VersionedTable.overwrite(spark, src, rows(0, 100))
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "initial full refresh")
    assert(MaterializedView.freshAsOf(view) === Some(1L))

    // replay: already fresh — no new view version
    val vBefore = VersionedTable.versions(view).last
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(VersionedTable.versions(view).last === vBefore, "fresh refresh must be a no-op")

    // append: delta is the appended files only (fast path)
    VersionedTable.append(spark, src, rows(100, 160))
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after append")

    // predicate COW delete folds rows OUT of the aggregate
    VersionedTable.delete(spark, src, col("v") < 30.0)
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after COW delete")

    // MoR delete (deletion vector, same file list) must not read as an
    // empty delta
    VersionedTable.deleteMoR(spark, src, col("v") > 150.0)
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after MoR delete")

    // upsert rewrites values: delta carries delete(old)+insert(new)
    VersionedTable.upsert(spark, src,
      rows(0, 160).filter(col("id").between(39, 48))
        .withColumn("v", (col("v") * 2).cast("decimal(12,2)")), "id")
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after upsert")

    // a row-preserving compaction yields an EMPTY delta: the view
    // version may advance its cursor but the state must not change
    val stateBefore = MaterializedView.read(spark, view).collect().toSet
    VersionedTable.compact(spark, src)
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(MaterializedView.read(spark, view).collect().toSet === stateBefore,
      "compaction must not move the view state")
    assertFresh(view, src, "after compaction")
  }

  test("a WHERE-scoped view maintains exactly under append, delete, and upsert") {
    val src = fresh("srcw")
    val view = fresh("vieww")
    def scoped = VersionedTable.read(spark, src).filter(col("v") >= 30.0)
      .groupBy("k").agg(
        count(lit(1)).cast("long").as("mv_count"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
    def refreshIt(): Unit = MaterializedView.refresh(
      spark, view, src, Seq("k"), Seq("v"), where = Some("v >= 30.0"))
    def check(clue: String): Unit = {
      val got = MaterializedView.read(spark, view)
      assert(got.except(scoped).isEmpty && scoped.except(got).isEmpty,
        s"$clue: scoped view != scoped recompute")
    }
    VersionedTable.overwrite(spark, src, rows(0, 100))
    refreshIt(); check("initial")
    VersionedTable.append(spark, src, rows(100, 140))
    refreshIt(); check("after append (some rows out of scope)")
    // a delete of IN-SCOPE rows subtracts; out-of-scope deletes are
    // invisible to the view — both in one commit
    VersionedTable.delete(spark, src, col("v") < 50.0)
    refreshIt(); check("after delete straddling the scope boundary")
    // an upsert that moves rows ACROSS the boundary: the old image
    // leaves the scope (delete side) and the new one enters it
    VersionedTable.upsert(spark, src,
      rows(0, 140).filter(col("id").between(60, 69))
        .withColumn("v", (col("v") * 100).cast("decimal(12,2)")), "id")
    refreshIt(); check("after upsert moving rows across the scope")
  }

  test("a fully deleted key leaves the view; view state is itself time-travelable") {
    val src = fresh("src2")
    val view = fresh("view2")
    // two keys; key 1's rows will all be deleted
    VersionedTable.overwrite(spark, src,
      spark.range(0, 20).select((col("id") % 2).as("k"),
        (col("id") + 1).cast("decimal(12,2)").as("v")))
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(MaterializedView.read(spark, view).count() === 2)
    VersionedTable.delete(spark, src, col("k") === 1L)
    MaterializedView.refresh(spark, view, src, Seq("k"), Seq("v"))
    val got = MaterializedView.read(spark, view)
    assert(got.count() === 1 && got.head.getLong(0) === 0L,
      "key with zero remaining rows must leave the view")
    // the first refresh's state is still readable at its version
    val v1 = MaterializedView.read(spark, view, Some(1L))
    assert(v1.count() === 2, "past refresh states time-travel")
  }
}
