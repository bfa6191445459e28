package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{InMemoryCommitStore, MaterializedView, MaterializedViewOps, VersionedTableOps}

/** Incrementally maintained materialized views (SURVEY §2.7): every
  * refresh must land the view EXACTLY at the full recompute of its
  * defining aggregate over the source head(s) — across append,
  * predicate (copy-on-write) delete, MoR delete, upsert, and
  * compaction commits — while the refresh cursor makes replays
  * no-ops. Backend-abstract: the IDENTICAL battery runs against the
  * POSIX link store and the object-store conditional-put store.
  */
abstract class MaterializedViewBattery(backend: String, mv: MaterializedViewOps)
    extends SparkSpec {

  private val vt = mv.vt

  private def fresh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mv-$backend-$tag").toString + "/t"

  private def rows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id"),
      (col("id") % 7).as("k"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))

  /** The view's defining aggregate, recomputed from scratch. */
  private def full(source: String): DataFrame =
    vt.read(spark, source).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))

  private def assertFresh(view: String, source: String, clue: String): Unit = {
    val got = mv.read(spark, view)
    val want = full(source)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"$clue: view != full recompute")
  }

  test(s"[$backend] overflow guards: a 10^24 delta row and a too-wide decimal both fail loudly") {
    val src = fresh("ovf-src")
    val view = fresh("ovf-view")
    vt.overwrite(spark, src,
      spark.range(0, 10).select((col("id") % 3).as("k"), (col("id") * 1.5).as("v")))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    val vBefore = vt.versions(view).last
    // a double beyond DECIMAL(28,4)'s range would cast to NULL per row
    // under non-ANSI semantics — sum() would skip it while mv_count
    // still counted the row, silently diverging from a full recompute
    vt.append(spark, src,
      spark.range(0, 1).select(lit(99L).as("k"), lit(1e25).as("v")))
    val e = intercept[IllegalArgumentException] {
      mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("overflow"))
    assert(vt.versions(view).last === vBefore,
      "the refused refresh must publish nothing")
    // a source decimal too wide for the state type is rejected
    // STATICALLY, before any data is scanned
    val src2 = fresh("ovf-wide")
    val view2 = fresh("ovf-wide-view")
    vt.overwrite(spark, src2, spark.range(0, 5)
      .select((col("id") % 2).as("k"), col("id").cast("decimal(30,0)").as("v")))
    val e2 = intercept[IllegalArgumentException] {
      mv.refresh(spark, view2, src2, Seq("k"), Seq("v"))
    }
    assert(e2.getMessage.contains("decimal(30,0)"))
  }

  test(s"[$backend] refresh tracks append, COW delete, MoR delete, upsert, compaction; replay is a no-op") {
    val src = fresh("src")
    val view = fresh("view")
    vt.overwrite(spark, src, rows(0, 100))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "initial full refresh")
    assert(mv.freshAsOf(view) === Some(1L))

    // replay: already fresh — no new view version
    val vBefore = vt.versions(view).last
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(vt.versions(view).last === vBefore, "fresh refresh must be a no-op")

    // append: delta is the appended files only (fast path)
    vt.append(spark, src, rows(100, 160))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after append")

    // predicate COW delete folds rows OUT of the aggregate
    vt.delete(spark, src, col("v") < 30.0)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after COW delete")

    // MoR delete (deletion vector, same file list) must not read as an
    // empty delta
    vt.deleteMoR(spark, src, col("v") > 150.0)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after MoR delete")

    // upsert rewrites values: delta carries delete(old)+insert(new)
    vt.upsert(spark, src,
      rows(0, 160).filter(col("id").between(39, 48))
        .withColumn("v", (col("v") * 2).cast("decimal(12,2)")), "id")
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assertFresh(view, src, "after upsert")

    // a row-preserving compaction yields an EMPTY delta: the view
    // version may advance its cursor but the state must not change
    val stateBefore = mv.read(spark, view).collect().toSet
    vt.compact(spark, src)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(mv.read(spark, view).collect().toSet === stateBefore,
      "compaction must not move the view state")
    assertFresh(view, src, "after compaction")
  }

  test(s"[$backend] a WHERE-scoped view maintains exactly under append, delete, and upsert") {
    val src = fresh("srcw")
    val view = fresh("vieww")
    def scoped = vt.read(spark, src).filter(col("v") >= 30.0)
      .groupBy("k").agg(
        count(lit(1)).cast("long").as("mv_count"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
    def refreshIt(): Unit = mv.refresh(
      spark, view, src, Seq("k"), Seq("v"), where = Some("v >= 30.0"))
    def check(clue: String): Unit = {
      val got = mv.read(spark, view)
      assert(got.except(scoped).isEmpty && scoped.except(got).isEmpty,
        s"$clue: scoped view != scoped recompute")
    }
    vt.overwrite(spark, src, rows(0, 100))
    refreshIt(); check("initial")
    vt.append(spark, src, rows(100, 140))
    refreshIt(); check("after append (some rows out of scope)")
    // a delete of IN-SCOPE rows subtracts; out-of-scope deletes are
    // invisible to the view — both in one commit
    vt.delete(spark, src, col("v") < 50.0)
    refreshIt(); check("after delete straddling the scope boundary")
    // an upsert that moves rows ACROSS the boundary: the old image
    // leaves the scope (delete side) and the new one enters it
    vt.upsert(spark, src,
      rows(0, 140).filter(col("id").between(60, 69))
        .withColumn("v", (col("v") * 100).cast("decimal(12,2)")), "id")
    refreshIt(); check("after upsert moving rows across the scope")
  }

  test(s"[$backend] a fully deleted key leaves the view; view state is itself time-travelable") {
    val src = fresh("src2")
    val view = fresh("view2")
    // two keys; key 1's rows will all be deleted
    vt.overwrite(spark, src,
      spark.range(0, 20).select((col("id") % 2).as("k"),
        (col("id") + 1).cast("decimal(12,2)").as("v")))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(mv.read(spark, view).count() === 2)
    vt.delete(spark, src, col("k") === 1L)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    val got = mv.read(spark, view)
    assert(got.count() === 1 && got.head.getLong(0) === 0L,
      "key with zero remaining rows must leave the view")
    // the first refresh's state is still readable at its version
    val v1 = mv.read(spark, view, Some(1L))
    assert(v1.count() === 2, "past refresh states time-travel")
  }

  // ---- min/max views (semilattice + delta-scoped recompute) ----

  private def fullMinMax(source: String): DataFrame =
    vt.read(spark, source).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      min("v").as("mv_min_v"),
      max("v").as("mv_max_v"))

  test(s"[$backend] min/max view == recompute across the COW/MoR delete battery") {
    val src = fresh("mmsrc")
    val view = fresh("mmview")
    def refreshIt(): Long =
      mv.refreshMinMax(spark, view, src, Seq("k"), Seq("v"))
    def check(clue: String): Unit = {
      val got = mv.read(spark, view)
      val want = fullMinMax(src)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$clue: min/max view != full recompute")
    }
    vt.overwrite(spark, src, rows(0, 100))
    refreshIt(); check("initial")

    // pure append: extrema merge as a semilattice — max improves
    vt.append(spark, src, rows(100, 160))
    refreshIt(); check("after append improving maxima")

    // a NULL-valued row: count moves, extrema don't
    vt.append(spark, src, spark.range(0, 1).select(
      lit(900L).as("id"), lit(1L).as("k"),
      lit(null).cast("decimal(12,2)").as("v")))
    refreshIt(); check("after a NULL-valued append")

    // interior COW delete: touches NO extremum — pure state math
    vt.delete(spark, src, col("v").between(50.0, 60.0))
    refreshIt(); check("after interior delete (no extremum touched)")

    // delete OF the minima: the touched groups recompute, delta-scoped
    vt.delete(spark, src, col("v") < 10.0)
    refreshIt(); check("after deleting the minima")

    // MoR delete of the maxima: same rule through a deletion vector
    vt.deleteMoR(spark, src, col("v") > 150.0)
    refreshIt(); check("after MoR-deleting the maxima")

    // upsert that MOVES an extremum (delete old image + insert new)
    vt.upsert(spark, src,
      rows(0, 160).filter(col("id").between(70, 75))
        .withColumn("v", (col("v") * 3).cast("decimal(12,2)")), "id")
    refreshIt(); check("after upsert moving extrema")

    // a fully deleted key leaves the view
    vt.delete(spark, src, col("k") === 3L)
    refreshIt(); check("after deleting every row of one key")
    assert(mv.read(spark, view).filter(col("k") === 3L).count() === 0)

    // compaction: empty delta, state fixed; replay: no-op
    val stateBefore = mv.read(spark, view).collect().toSet
    vt.compact(spark, src)
    refreshIt()
    assert(mv.read(spark, view).collect().toSet === stateBefore)
    val vBefore = vt.versions(view).last
    refreshIt()
    assert(vt.versions(view).last === vBefore, "fresh refresh must be a no-op")
  }

  test(s"[$backend] a WHERE-scoped min/max view recomputes inside its scope only") {
    val src = fresh("mmw-src")
    val view = fresh("mmw-view")
    def scoped = vt.read(spark, src).filter(col("v") >= 20.0)
      .groupBy("k").agg(
        count(lit(1)).cast("long").as("mv_count"),
        min("v").as("mv_min_v"), max("v").as("mv_max_v"))
    def refreshIt(): Unit = mv.refreshMinMax(
      spark, view, src, Seq("k"), Seq("v"), where = Some("v >= 20.0"))
    def check(clue: String): Unit = {
      val got = mv.read(spark, view)
      assert(got.except(scoped).isEmpty && scoped.except(got).isEmpty,
        s"$clue: scoped min/max view != scoped recompute")
    }
    vt.overwrite(spark, src, rows(0, 100))
    refreshIt(); check("initial")
    // the scope boundary IS the stored minimum (v=20 rows): deleting
    // it must recompute against the SCOPED source, not the full one —
    // an unscoped recompute would resurrect v<20 values as minima
    vt.delete(spark, src, col("v").between(20.0, 25.0))
    refreshIt(); check("after deleting the scoped minima")
  }

  // ---- stats views (count/sum/sum-of-squares; derived avg/var/std) ----

  private def fullStats(source: String): DataFrame = {
    val v28 = col("v").cast("decimal(28,4)")
    val s = sum(v28).cast("double")
    val sq = sum((v28 * v28).cast("decimal(28,4)")).cast("double")
    val n = count(col("v")).cast("double")
    val avg = s / n
    vt.read(spark, source).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      sum(v28).as("mv_sum_v"),
      avg.as("mv_avg_v"),
      (sq / n - avg * avg).as("mv_var_v"))
  }

  test(s"[$backend] stats view: derived avg/var == recompute across the mutation battery") {
    val src = fresh("stsrc")
    val view = fresh("stview")
    def refreshIt(): Unit = mv.refreshStats(spark, view, src, Seq("k"), Seq("v"))
    def check(clue: String): Unit = {
      val got = mv.readStats(spark, view, Seq("k"), Seq("v"))
        .select("k", "mv_count", "mv_sum_v", "mv_avg_v", "mv_var_v")
      val want = fullStats(src)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$clue: stats view != full recompute (exact doubles, same op order)")
    }
    vt.overwrite(spark, src, rows(0, 100))
    refreshIt(); check("initial")
    vt.append(spark, src, rows(100, 160))
    refreshIt(); check("after append")
    vt.delete(spark, src, col("v") < 30.0)
    refreshIt(); check("after COW delete")
    vt.deleteMoR(spark, src, col("v") > 150.0)
    refreshIt(); check("after MoR delete")
    vt.upsert(spark, src,
      rows(0, 160).filter(col("id").between(39, 48))
        .withColumn("v", (col("v") * 2).cast("decimal(12,2)")), "id")
    refreshIt(); check("after upsert")
    // replay no-op
    val vBefore = vt.versions(view).last
    refreshIt()
    assert(vt.versions(view).last === vBefore)
    // an all-NULL group derives NULL avg/var, not 0/0
    vt.append(spark, src, spark.range(0, 2).select(
      (col("id") + 700).as("id"), lit(99L).as("k"),
      lit(null).cast("decimal(12,2)").as("v")))
    refreshIt()
    val g99 = mv.readStats(spark, view, Seq("k"), Seq("v"))
      .filter(col("k") === 99L).head
    assert(g99.getLong(1) === 2L && g99.isNullAt(3) && g99.isNullAt(4),
      "all-NULL group: count moves, derived stats stay NULL")
    // floats are refused (quantized squares corrupt small variances)
    val srcF = fresh("stsrc-f")
    vt.overwrite(spark, srcF, spark.range(0, 5)
      .select((col("id") % 2).as("k"), (col("id") * 1.5).as("v")))
    intercept[IllegalArgumentException] {
      mv.refreshStats(spark, fresh("stview-f"), srcF, Seq("k"), Seq("v"))
    }
    // integrals past |v| <= 1e12 are refused (squares would overflow)
    val srcI = fresh("stsrc-i")
    vt.overwrite(spark, srcI, spark.range(0, 3)
      .select((col("id") % 2).as("k"), (col("id") + 2000000000000L).as("v")))
    intercept[IllegalArgumentException] {
      mv.refreshStats(spark, fresh("stview-i"), srcI, Seq("k"), Seq("v"))
    }
  }

  // ---- joined views (delta-join maintenance) ----

  private def lrows(lo: Long, hi: Long) =
    spark.range(lo, hi).select(
      col("id"),
      (col("id") % 10).as("fk"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))

  private def rrows(fks: Seq[Long], segOf: Long => Long) =
    spark.createDataFrame(fks.map(f => (f, segOf(f)))).toDF("fk", "seg")

  private def fullJoin(left: String, right: String): DataFrame =
    vt.read(spark, left).join(vt.read(spark, right), "fk")
      .groupBy("seg").agg(
        count(lit(1)).cast("long").as("mv_count"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))

  test(s"[$backend] joined view: delta-join maintenance across mutations of EITHER side") {
    val left = fresh("jl")
    val right = fresh("jr")
    val view = fresh("jv")
    def refreshIt(): Long =
      mv.refreshJoin(spark, view, left, right, Seq("fk"), Seq("seg"), Seq("v"))
    def check(clue: String): Unit = {
      val got = mv.read(spark, view)
      val want = fullJoin(left, right)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$clue: joined view != full recompute of the join")
    }
    // right starts PARTIAL: left rows with fk 7..9 dangle (inner join)
    vt.overwrite(spark, left, lrows(0, 100))
    vt.overwrite(spark, right, rrows(0L to 6L, _ % 3))
    refreshIt(); check("initial full join")
    // both cursors land atomically in ONE commit
    assert(mv.freshAsOfJoin(view) === (Some(1L), Some(1L)),
      "one refresh commit must carry BOTH source watermarks")

    // replay: fresh against both heads — no new version
    val vBefore = vt.versions(view).last
    refreshIt()
    assert(vt.versions(view).last === vBefore, "fresh refreshJoin must be a no-op")

    // ΔA path: left append joins against right@cursor
    vt.append(spark, left, lrows(100, 150))
    refreshIt(); check("after left append")

    // ΔB path: the dangling fks appear — their left rows must join IN
    vt.append(spark, right, rrows(7L to 9L, _ % 3))
    refreshIt(); check("after right append (dangling rows join in)")

    // signed delete on the left folds joined rows OUT
    vt.delete(spark, left, col("v") < 30.0)
    refreshIt(); check("after left COW delete")

    // an upsert on the RIGHT reclassifies groups: delta carries
    // delete(old seg)+insert(new seg) per touched fk, and every joined
    // left row moves group — the A@new ⋈ ΔB term at work
    vt.upsert(spark, right, rrows(0L to 2L, _ => 99L), "fk")
    refreshIt(); check("after right upsert (group reclassification)")

    // MoR delete on the right: fk 5's rows all leave the join
    vt.deleteMoR(spark, right, col("fk") === 5L)
    refreshIt(); check("after right MoR delete")

    // row-preserving compaction of either side: empty delta, state fixed
    val stateBefore = mv.read(spark, view).collect().toSet
    vt.compact(spark, left)
    vt.compact(spark, right)
    refreshIt()
    assert(mv.read(spark, view).collect().toSet === stateBefore,
      "compaction of either side must not move the view state")
    check("after compaction of both sides")
  }

  test(s"[$backend] joined view: a half-cursor view is refused, overlapping columns are refused") {
    val left = fresh("jrl")
    val right = fresh("jrr")
    vt.overwrite(spark, left, lrows(0, 20))
    vt.overwrite(spark, right, rrows(0L to 9L, _ % 3))
    // a view maintained by the SINGLE-source refresh must not be
    // silently adopted by refreshJoin (its state would not match the
    // join) — the cursor-pair check refuses it
    val view = fresh("jrv")
    mv.refresh(spark, view, left, Seq("fk"), Seq("v"))
    intercept[IllegalArgumentException] {
      mv.refreshJoin(spark, view, left, right, Seq("fk"), Seq("seg"), Seq("v"))
    }
    // shared non-key columns are ambiguous downstream — refused
    val right2 = fresh("jrr2")
    vt.overwrite(spark, right2,
      rrows(0L to 9L, _ % 3).withColumn("v", lit(1L)))
    val view2 = fresh("jrv2")
    intercept[IllegalArgumentException] {
      mv.refreshJoin(spark, view2, left, right2, Seq("fk"), Seq("seg"), Seq("v"))
    }
  }

  test(s"[$backend] 3-table chain view maintains exactly under mutations on every source") {
    // nation-like dim ⋈ customer-like mid ⋈ orders-like fact: the
    // telescoping decomposition must land every refresh exactly at the
    // from-scratch 3-way join aggregate, whichever source(s) moved
    val dim = fresh("c3-dim")
    val mid = fresh("c3-mid")
    val fact = fresh("c3-fact")
    val view = fresh("c3-view")
    def dimRows(ids: Seq[Long]) = spark.createDataFrame(
      ids.map(i => (i, s"G${i % 3}"))).toDF("gid", "gname")
    def midRows(ids: Seq[Long]) = spark.createDataFrame(
      ids.map(i => (i, i % 4))).toDF("cid", "gid")
    def factRows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("oid"), (col("id") % 20).as("cid"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))
    vt.overwrite(spark, dim, dimRows(0L to 3L))
    vt.overwrite(spark, mid, midRows(0L to 19L))
    vt.overwrite(spark, fact, factRows(0, 100))
    def refreshIt(): Unit = mv.refreshJoinChain(spark, view,
      Seq(fact, mid, dim), Seq(Seq("cid"), Seq("gid")),
      Seq("gname"), Seq("v"))
    def check(clue: String): Unit = {
      val want = vt.read(spark, fact)
        .join(vt.read(spark, mid), Seq("cid"))
        .join(vt.read(spark, dim), Seq("gid"))
        .groupBy("gname").agg(
          count(lit(1)).cast("long").as("mv_count"),
          sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
      val got = mv.read(spark, view)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$clue: chain view != full recompute")
    }
    refreshIt(); check("initial full refresh")
    val v0 = vt.versions(view).last
    refreshIt()
    assert(vt.versions(view).last === v0, "fresh chain refresh is a no-op")
    // fact append: the ONLY term is Δfact ⋈ mid ⋈ dim
    vt.append(spark, fact, factRows(100, 160)); refreshIt(); check("fact append")
    // mid delete: customers leave — their fact rows leave the view
    vt.delete(spark, mid, col("cid") % 5 === 0); refreshIt(); check("mid delete")
    // dim delete + SIMULTANEOUS fact append: two terms in one refresh
    vt.delete(spark, dim, col("gid") === 2)
    vt.append(spark, fact, factRows(160, 200))
    refreshIt(); check("dim delete + fact append in one refresh")
    // upsert on the middle table (rewrite commit → sym-diff delta)
    vt.upsert(spark, mid, midRows(3L to 6L)
      .withColumn("gid", col("cid") % 2), "cid")
    refreshIt(); check("mid upsert")
    // all three cursors sit at their source heads
    assert(mv.freshAsOfChain(view, 3).zip(
      Seq(fact, mid, dim).map(s => vt.versions(s).last))
      .forall { case (c, h) => c.contains(h) })
  }

  test(s"[$backend] factored chain: a mid-table delta provably never touches the fact") {
    // higher-order IVM by composition: inner = fact pre-aggregated per
    // join key; outer = chain over (inner, mid, dim). The proof is
    // DESTRUCTIVE: after both views are fresh, the fact's directory is
    // DELETED OUTRIGHT — a mid-side delete's refresh must still
    // succeed and stay exact, because its only term joins Δmid against
    // the inner STATE. The raw chain form would crash here (its
    // mid-delta term opens the fact snapshot).
    val fact = fresh("fc-fact")
    val mid = fresh("fc-mid")
    val dim = fresh("fc-dim")
    val inner = fresh("fc-inner")
    val outer = fresh("fc-outer")
    vt.overwrite(spark, fact, spark.range(0, 2000).select(
      (col("id") % 50).as("cid"),
      (col("id") + 1).cast("decimal(12,2)").as("v")))
    vt.overwrite(spark, mid, spark.range(0, 50)
      .select(col("id").as("cid"), (col("id") % 5).as("gid")))
    vt.overwrite(spark, dim, spark.range(0, 5)
      .select(col("id").as("gid"), concat(lit("G"), col("id")).as("gname")))
    def refreshIt(): Unit = {
      mv.refreshChainFactored(spark, outer, inner, fact, Seq(mid, dim),
        Seq(Seq("cid"), Seq("gid")), Seq("gname"), Seq("v"))
      ()
    }
    refreshIt()
    // expected state is computable from the INNER alone — needed below
    // once the fact is gone
    def expected() = vt.read(spark, inner)
      .join(vt.read(spark, mid), "cid").join(vt.read(spark, dim), "gid")
      .groupBy("gname").agg(
        count(lit(1)).cast("long").as("mv_count"),
        sum(col("mv_count").cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("mv_sum_mv_count"),
        sum(col("mv_sum_v").cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("mv_sum_mv_sum_v"))
    val want0 = expected().collect().toSet
    assert(mv.read(spark, outer).collect().toSet === want0, "fresh baseline")

    // the fact's DATA BYTES cease to exist (manifests stay — the
    // freshness check is metadata-only): any refresh path that opened
    // a fact file would now throw
    val dataDir = java.nio.file.Paths.get(fact, "data")
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dataDir))(
      _.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete))
    // a mid-side delete refreshes the view exactly, fact-data-free —
    // through the PACKAGED entry point (its inner refresh is a no-op
    // at the cursor, its outer term joins the inner state)
    vt.delete(spark, mid, col("cid") % 4 === 0)
    refreshIt()
    assert(mv.read(spark, outer).collect().toSet === expected().collect().toSet,
      "the factored mid-delta refresh must succeed and stay exact " +
        "with every fact data byte physically gone")
  }

  test(s"[$backend] a view over a view composes: the outer folds the inner's state deltas") {
    // the view state is itself a versioned table, so changesBetween
    // over its refresh commits IS a signed delta — the outer view
    // rolls the inner's per-key counts/sums up to coarser keys with no
    // new machinery; counts roll up as a SUM over the inner's mv_count
    val src = fresh("vov-src")
    val inner = fresh("vov-inner")
    val outer = fresh("vov-outer")
    def rows2(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 12).as("k"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))
    vt.overwrite(spark, src, rows2(0, 100))
    // the inner's mv_count rides the outer as a SUM column (counting
    // inner ROWS would count groups, not underlying rows)
    mv.refresh(spark, inner, src, Seq("k"), Seq("v"))
    mv.refresh(spark, outer, inner, Seq("k"), Seq("mv_count", "mv_sum_v"),
      viewKey = "outer")
    def check(clue: String): Unit = {
      val want = vt.read(spark, src).groupBy("k").agg(
        count(lit(1)).cast("decimal(28,4)").as("mv_sum_mv_count"),
        sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_mv_sum_v"))
      val got = mv.read(spark, outer)
        .select(col("k"), col("mv_sum_mv_count"), col("mv_sum_mv_sum_v"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"$clue: outer view != rollup of source")
    }
    check("initial composition")
    vt.append(spark, src, rows2(100, 150))
    mv.refresh(spark, inner, src, Seq("k"), Seq("v"))
    mv.refresh(spark, outer, inner, Seq("k"), Seq("mv_count", "mv_sum_v"),
      viewKey = "outer")
    check("after source append propagated through both views")
    vt.delete(spark, src, col("v") < 40.0)
    mv.refresh(spark, inner, src, Seq("k"), Seq("v"))
    mv.refresh(spark, outer, inner, Seq("k"), Seq("mv_count", "mv_sum_v"),
      viewKey = "outer")
    check("after source delete propagated through both views")
  }

  test(s"[$backend] NULL grouping keys merge null-safely across every refresh flavor") {
    // GROUP BY keeps NULL as one ordinary group, so the state can hold
    // a NULL-keyed row — the round-8 advisory: a non-null-safe merge
    // join would leave the state row and the delta row as TWO view
    // rows, and the min/max recompute would never find the group
    def nrows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"),
      when(col("id") % 5 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 3).as("k"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))
    def fullN(source: String) = vt.read(spark, source).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
    def sameAs(got: DataFrame, want: DataFrame, clue: String): Unit =
      assert(got.except(want).isEmpty && want.except(got).isEmpty, clue)

    val src = fresh("null-src")
    val view = fresh("null-view")
    vt.overwrite(spark, src, nrows(0, 40))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    vt.append(spark, src, nrows(40, 80)) // appends rows INTO the NULL group
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    sameAs(mv.read(spark, view), fullN(src),
      "count/sum: NULL-keyed state and delta rows must merge into ONE view row")
    assert(mv.read(spark, view).filter(col("k").isNull).count() === 1L,
      "exactly one NULL-keyed view row")
    vt.delete(spark, src, col("id") % 10 === 0) // deletes from the NULL group
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    sameAs(mv.read(spark, view), fullN(src), "count/sum after NULL-group delete")

    // min/max: deleting the NULL group's current MAX forces the
    // delta-scoped recompute, whose semi join and key-range scope must
    // both find the NULL-keyed group
    val srcX = fresh("null-xsrc")
    val viewX = fresh("null-xview")
    vt.overwrite(spark, srcX, nrows(0, 60))
    mv.refreshMinMax(spark, viewX, srcX, Seq("k"), Seq("v"))
    val maxNull = vt.read(spark, srcX).filter(col("k").isNull)
      .agg(max(col("v"))).head.getDecimal(0)
    vt.delete(spark, srcX, col("k").isNull && col("v") === maxNull)
    mv.refreshMinMax(spark, viewX, srcX, Seq("k"), Seq("v"))
    val wantX = vt.read(spark, srcX).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      min(col("v")).as("mv_min_v"), max(col("v")).as("mv_max_v"))
    sameAs(mv.read(spark, viewX), wantX,
      "min/max: the recompute must re-derive the NULL group's extremum")

    // stats: the NULL group's derived avg/var must match the recompute
    val srcS = fresh("null-ssrc")
    val viewS = fresh("null-sview")
    vt.overwrite(spark, srcS, nrows(0, 40).withColumn("v", col("id")))
    mv.refreshStats(spark, viewS, srcS, Seq("k"), Seq("v"))
    vt.append(spark, srcS, nrows(40, 70).withColumn("v", col("id")))
    mv.refreshStats(spark, viewS, srcS, Seq("k"), Seq("v"))
    val gotS = mv.readStats(spark, viewS, Seq("k"), Seq("v"))
      .select(col("k"), col("mv_count"), round(col("mv_avg_v"), 6).as("a"))
    val wantS = vt.read(spark, srcS).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      round(avg(col("v")), 6).as("a"))
    sameAs(gotS, wantS, "stats: NULL-keyed group's count/avg must merge into one row")
  }

  private def sameState(got: DataFrame, want: DataFrame, clue: String): Unit =
    assert(got.except(want).isEmpty && want.except(got).isEmpty, clue)

  test(s"[$backend] bucketed state: refresh equals recompute and rewrites ONLY delta-touched buckets") {
    val nB = 8
    val src = fresh("bk-src")
    val view = fresh("bk-view")
    // keys 0..199 spread over all 8 buckets
    def brows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 200).as("k"),
      (col("id") + 1).cast("decimal(12,2)").as("v"))
    def bfull() = vt.read(spark, src).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      sum(col("v").cast("decimal(18,4)")).cast("decimal(28,4)").as("mv_sum_v"))
    vt.overwrite(spark, src, brows(0, 2000))
    mv.refresh(spark, view, src, Seq("k"), Seq("v"), buckets = nB)
    assert(vt.partitionSpec(view).contains(mv.BucketCol),
      "bucketed view state must be partitioned on the bucket column")
    sameState(mv.read(spark, view), bfull(), "bucketed first refresh")
    assert(!mv.read(spark, view).columns.contains(mv.BucketCol),
      "the internal bucket column must not surface in reads")

    // an append touching ONE key → one touched bucket; every file of
    // every OTHER bucket must carry into the new version BY PATH (the
    // copy-on-write identity that makes the state write O(touched))
    val before = vt.snapshotFiles(view).toSet
    val touchedBucket = spark.range(1).select(
      pmod(hash(lit(7L)), lit(nB))).head.getInt(0)
    val seg = s"${mv.BucketCol}__pv=$touchedBucket"
    vt.append(spark, src, spark.range(0, 5).select(
      (col("id") + 90000).as("id"), lit(7L).as("k"),
      lit(1).cast("decimal(12,2)").as("v")))
    mv.refresh(spark, view, src, Seq("k"), Seq("v")) // buckets param omitted: stored wins
    sameState(mv.read(spark, view), bfull(), "bucketed incremental refresh")
    val after = vt.snapshotFiles(view).toSet
    val untouchedBefore = before.filterNot(_.contains(seg))
    assert(untouchedBefore.subsetOf(after),
      s"untouched buckets' files must carry by reference: missing " +
        (untouchedBefore -- after).take(3))
    assert((after -- before).forall(_.contains(seg)),
      s"only the touched bucket may gain files: ${(after -- before).filterNot(_.contains(seg)).take(3)}")

    // deletes fold out; a fully-deleted key leaves the view
    vt.delete(spark, src, col("k") === 3L)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    sameState(mv.read(spark, view), bfull(), "bucketed refresh after COW delete")
    assert(mv.read(spark, view).filter(col("k") === 3L).isEmpty)

    // replay: fresh refresh publishes nothing
    val vB = vt.versions(view).last
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(vt.versions(view).last === vB, "fresh bucketed refresh must be a no-op")

    // the bucket count is view identity: rebucketing is refused
    vt.append(spark, src, brows(2000, 2001))
    val e = intercept[IllegalArgumentException] {
      mv.refresh(spark, view, src, Seq("k"), Seq("v"), buckets = 16)
    }
    assert(e.getMessage.contains("bucketed at 8"))

    // a compaction of the SOURCE yields an empty delta: the cursor
    // must advance without rewriting any state partition
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    val filesB = vt.snapshotFiles(view).toSet
    vt.compact(spark, src)
    mv.refresh(spark, view, src, Seq("k"), Seq("v"))
    assert(vt.snapshotFiles(view).toSet === filesB,
      "an empty delta must advance the cursor with zero state-file churn")
    sameState(mv.read(spark, view), bfull(), "after source compaction")
  }

  test(s"[$backend] bucketed min/max: delete-driven recompute stays bucket-scoped and exact") {
    val nB = 4
    val src = fresh("bkx-src")
    val view = fresh("bkx-view")
    def xrows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id"), (col("id") % 50).as("k"), col("id").cast("double").as("v"))
    def xfull() = vt.read(spark, src).groupBy("k").agg(
      count(lit(1)).cast("long").as("mv_count"),
      min(col("v")).as("mv_min_v"), max(col("v")).as("mv_max_v"))
    vt.overwrite(spark, src, xrows(0, 1000))
    mv.refreshMinMax(spark, view, src, Seq("k"), Seq("v"), buckets = nB)
    sameState(mv.read(spark, view), xfull(), "bucketed min/max first refresh")

    // delete the current MAX of one key: its group needs a rescan, and
    // the state write must still be scoped to the touched bucket
    val before = vt.snapshotFiles(view).toSet
    val touchedBucket = spark.range(1).select(
      pmod(hash(lit(49L)), lit(nB))).head.getInt(0)
    val seg = s"${mv.BucketCol}__pv=$touchedBucket"
    vt.delete(spark, src, col("k") === 49L && col("v") === 999.0)
    mv.refreshMinMax(spark, view, src, Seq("k"), Seq("v"))
    sameState(mv.read(spark, view), xfull(),
      "bucketed min/max after an extremum delete (recompute path)")
    val after = vt.snapshotFiles(view).toSet
    assert(before.filterNot(_.contains(seg)).subsetOf(after),
      "min/max: untouched buckets' files must carry by reference")

    // inserts merge as pure state, still bucket-scoped
    vt.append(spark, src, spark.range(0, 3).select(
      (col("id") + 5000).as("id"), lit(2L).as("k"), lit(-5.0).as("v")))
    mv.refreshMinMax(spark, view, src, Seq("k"), Seq("v"))
    sameState(mv.read(spark, view), xfull(), "bucketed min/max after insert")
  }
}

/** The default POSIX deployment: publish via hard link. */
class MaterializedViewSpec
  extends MaterializedViewBattery("link", MaterializedView)

/** Object-store semantics: the same battery over the conditional-put
  * manifest namespace.
  */
class MaterializedViewObjectStoreSpec
  extends MaterializedViewBattery("objectstore",
    new MaterializedViewOps(new VersionedTableOps(new InMemoryCommitStore)))
