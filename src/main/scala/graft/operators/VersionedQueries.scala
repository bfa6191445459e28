package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{MaterializedView, VersionedTable}

/** Output-boundary convention (round-8): DECIMAL math stays INTERNAL
  * (the zone-map probes and native-literal residuals need the decimal
  * column type in the committed files), but every decimal column that
  * reaches the RETURNED frame is cast to double — the driver's gate
  * hashes Spark output through pyarrow→pandas, where a DECIMAL column
  * lands as dtype `object` (java.math.BigDecimal → decimal.Decimal)
  * while the DuckDB oracle's .df() yields float64: equal values,
  * unequal hash (the round-7 12-query regression class). The oracle
  * SQL mirrors with CAST(... AS DOUBLE) on the same columns.
  */

/** Oracle-checked queries that route the lakehouse-maintenance shapes
  * THROUGH the VersionedTable commit log (round-6: the layer existed
  * but no query path used it — a real user's MERGE wants the
  * atomic-commit path, and time travel had no oracle evidence).
  *
  * Both queries build a throwaway versioned table under a fresh temp
  * dir, commit version(s), and return what a READER of the commit log
  * resolves — so the values the DuckDB oracle checks have actually
  * passed through stageData → manifest publish → manifest-selected
  * read, not just through a DataFrame plan. The oracle replays the
  * MERGE semantics in SQL over the same source parquet tables.
  */
object VersionedQueries {

  /** The localize-and-delete hygiene rule, applied at EVERY temp-root
    * site (round-12 verdict #2 — it was hand-rolled at three q_sql_*
    * sites while the other ~47 leaked their roots every run; one full
    * bench pass left ~50 `graft-vq-*` dirs in /tmp). `body` builds its
    * throwaway versioned table(s) under the fresh root and returns the
    * query's (small) result frame; the helper then COLLECTS that frame
    * into a driver-local copy and walk-deletes the root — so the
    * returned frame never references the deleted files, and a
    * multi-pass bench leaves /tmp exactly as it found it. The localize
    * cost is bounded because every oracle query's result is collected
    * by the driver gate anyway. Temp views the body registered are
    * dropped too (`dropViews`) — session-catalog hygiene, same rule
    * one level up. Deletion runs in `finally`: a failed in-query
    * assert still cleans its root.
    */
  /** Plan-dump hook (-Dgraft.dump.inner=true): the hygiene rule below
    * returns driver-local COPIES, which reduces every lakehouse
    * query's dumped plan to a LocalTableScan — so when the property is
    * set, withRoot records the BODY frame's formatted physical plan
    * here (after execution, before the root deletes) for DumpPlans to
    * substitute. Never set on the bench/verify paths — the capture is
    * an extra explainString per query, not free.
    */
  private[graft] val lastInnerPlan =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  private def withRoot(spark: SparkSession, tag: String, dropViews: String*)(
      body: String => DataFrame): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-vq-$tag").toString
    try {
      val out = body(root)
      // localize via EAGER localCheckpoint, not collect (r13
      // optimization, guide §5 "the driver"): `collect()` +
      // `createDataFrame(asList(rows))` paid two full driver-side row
      // conversions plus a driver materialization — ~8 s of the 21 s
      // q_update_mor run at sf1, where the localized frame is the
      // whole 1.5M-row table. The checkpoint materializes the result
      // into executor blocks IN PARALLEL (no driver roundtrip) and
      // cuts lineage, so the returned frame never references the root
      // deleted below — the same isolation the collect provided. The
      // blocks free when the frame's RDD is GC'd (and the bench's
      // cleanup() unpersists between queries), so a multi-query
      // session does not accumulate them.
      val localized = out.localCheckpoint()
      if (sys.props.get("graft.dump.inner").contains("true"))
        lastInnerPlan.set(out.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      localized
    } finally {
      dropViews.foreach(spark.catalog.dropTempView(_))
      val rootPath = java.nio.file.Paths.get(root)
      scala.util.Using.resource(java.nio.file.Files.walk(rootPath)) { w =>
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      }
    }
  }

  /** The output boundary: every DECIMAL column in the frame a query
    * RETURNS is cast to double (see the file header — representation
    * stability under the driver's pyarrow→pandas hash). Internal
    * frames are never passed through this.
    */
  private def outBoundary(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.DecimalType =>
          d.withColumn(f.name, col(f.name).cast("double"))
        case _ => d
      }
    }

  /** The target dim slice committed as version 1: customer keys not
    * divisible by 3 (so the upsert has genuine INSERTs), with their
    * balances.
    */
  private def target(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), col("c_acctbal"))

  /** The update batch: 1997Q1 order totals per customer, shaped to the
    * target's schema (updates WIN on matched keys — VersionedTable's
    * coalesce(u, t) merge rule — and insert otherwise).
    */
  private def updates(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(sumMoney(col("o_totalprice")).as("c_acctbal"))
      .select(col("o_custkey").as("c_custkey"), col("c_acctbal"))

  /** q_upsert_versioned: MERGE routed through the commit log — v1
    * commits the target slice, v2 commits the upsert (full-outer merge,
    * updates win, inserts land, unmatched target rows kept), and the
    * result is the HEAD SNAPSHOT read back through its manifest.
    * Scale shape: the merge itself is VersionedTable.upsert's ordinary
    * key-partitioned full-outer join; the commit adds one driver-side
    * manifest publish — O(files), no data movement beyond the merge
    * write itself.
    */
  def qUpsertVersioned(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "upsert") { root =>
    val table = root + "/t"
    VersionedTable.overwrite(spark, table, target(spark, dir))
    VersionedTable.upsert(spark, table, updates(spark, dir), "c_custkey")
    VersionedTable.read(spark, table)
  }

  /** q_time_travel: after the same v1 → v2 upsert history, a reader
    * pinned to VERSION 1 must see exactly the pre-merge slice — the
    * manifest selects v1's immutable files even though v2 landed.
    * The oracle is therefore the plain target-slice SQL: if time
    * travel leaked any v2 file (or lost a v1 file), the hash check
    * fails.
    */
  def qTimeTravel(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "travel") { root =>
    val table = root + "/t"
    val v1 = VersionedTable.overwrite(spark, table, target(spark, dir))
    VersionedTable.upsert(spark, table, updates(spark, dir), "c_custkey")
    VersionedTable.read(spark, table, Some(v1))
  }

  /** q_zone_map_read: a key-clustered commit history (three appends
    * with disjoint c_custkey thirds) probed through
    * [[VersionedTable.readRange]] — the manifest zone maps skip the
    * non-matching commits' files (asserted: the probe opens fewer
    * files than the snapshot holds), and the oracle is the plain SQL
    * range filter the skipping must be invisible to.
    */
  def qZoneMapRead(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zone") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    // one-row bound scalars (table parameters, not data)
    val mx = all.agg(max("c_custkey")).head.getLong(0)
    val third = mx / 3
    VersionedTable.overwrite(spark, table, all.filter(col("c_custkey") <= third))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") > third && col("c_custkey") <= 2 * third))
    VersionedTable.append(spark, table, all.filter(col("c_custkey") > 2 * third))
    val lo = third + 1
    val hi = 2 * third
    // version pinned ONCE so the asserted kept/total describes the
    // same snapshot the read below opens (head-resolved twice could
    // disagree under a concurrent commit)
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRange(table, "c_custkey", lo, hi, v)
    require(kept.size < total,
      s"zone maps must skip the disjoint commits (kept ${kept.size}/$total)")
    VersionedTable.readRange(spark, table, "c_custkey", lo, hi, v)
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** q_bloom_skip: the point-lookup layout the ZONE MAPS structurally
    * cannot prune — keys HASH-SCATTERED across every file (each file's
    * [min, max] interval spans ~the whole key domain), the "find one
    * key in 100 TB" shape — served by the per-file BLOOM sidecars
    * ([[VersionedTable.setBloomIndex]]): the probe opens only the
    * files whose filters might hold a probed key (asserted: fewer
    * files than the snapshot), and the RETURNED frame goes through
    * [[VersionedTable.readIndexed]] + a plain IN filter, so the
    * pruning the oracle must not observe happened INSIDE Catalyst
    * planning. False positives re-filter on the survivors — skipping
    * is purely an IO optimization, which is exactly what the DuckDB
    * recompute checks.
    */
  def qBloomSkip(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "bloom") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    // three era commits (keys ≡ era mod 3), each hash-scattered over
    // four files by an UNRELATED column — the adversarial layout: no
    // interval can separate the keys, only per-file membership can
    for (era <- 0 to 2) {
      val slice = all.filter(col("c_custkey") % 3 === era)
        .repartition(4, col("c_acctbal"))
      if (era == 0) VersionedTable.overwrite(spark, table, slice)
      else VersionedTable.append(spark, table, slice)
    }
    VersionedTable.setBloomIndex(spark, table, Seq(("c_custkey", 0.001)))
    val keys = Seq(7L, 310L, 1022L, 1333L)
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForPoints(table, "c_custkey", keys, v)
    require(kept.size < total,
      s"blooms must skip files on the scattered layout (kept ${kept.size}/$total)")
    VersionedTable.readIndexed(spark, table, v)
      .filter(col("c_custkey").isin(keys: _*))
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** q_zone_map_date: the round-6 gap — the suite's dominant scan
    * predicates are date ranges, and DATE columns were conservatively
    * unindexed. Orders are committed in three YEAR-CLUSTERED appends
    * (the natural time-partitioned commit order of an ingest
    * pipeline); a mid-span probe through [[VersionedTable.readRange]]
    * must skip the other eras' files on the days-since-epoch zone
    * maps (asserted), and the probe range deliberately covers only
    * PART of the middle era so the exact residual predicate (native
    * DATE literals — parquet row-group pushdown survives) is
    * exercised too.
    */
  def qZoneMapDate(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonedate") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"))
    VersionedTable.overwrite(spark, table, all.filter(year(col("o_date")) <= 1996))
    VersionedTable.append(spark, table,
      all.filter(year(col("o_date")).between(1997, 1998)))
    VersionedTable.append(spark, table, all.filter(year(col("o_date")) >= 1999))
    val lo = java.time.LocalDate.of(1997, 7, 1).toEpochDay.toDouble
    val hi = java.time.LocalDate.of(1998, 6, 30).toEpochDay.toDouble
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRange(table, "o_date", lo, hi, v)
    require(kept.size < total,
      s"date zone maps must skip the other eras (kept ${kept.size}/$total)")
    VersionedTable.readRange(spark, table, "o_date", lo, hi, v)
  }

  /** q_zone_map_decimal: same gap for money columns. Orders are
    * committed in three PRICE-BAND appends (a clustered OPTIMIZE
    * layout); the probe range sits strictly inside the middle band so
    * the outer bands' files must be skipped on the decimal zone maps
    * (unscaled int64 footer stats decoded via the column's scale),
    * and the survivors are filtered with native DECIMAL(12,2)
    * literals — no double cast on the column, row-group pushdown
    * intact.
    */
  def qZoneMapDecimal(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonedec") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.filter(col("price") < 50000))
    VersionedTable.append(spark, table, all.filter(col("price").between(50000, 150000)))
    VersionedTable.append(spark, table, all.filter(col("price") > 150000))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRange(table, "price", 60000d, 140000d, v)
    require(kept.size < total,
      s"decimal zone maps must skip the outer price bands (kept ${kept.size}/$total)")
    outBoundary(VersionedTable.readRange(spark, table, "price", 60000d, 140000d, v))
  }

  /** q_zone_map_nested: zone maps on STRUCT-NESTED fields — orders
    * committed in three price bands where price lives INSIDE a struct
    * column (`info.price`), then probed two ways: the explicit
    * [[VersionedTable.filesForRange]] on the dotted stats name
    * (files-skipped asserted), and the AUTOMATIC path — a plain
    * `.filter(col("info.price")...)` through
    * [[VersionedTable.readIndexed]], whose GetStructField chain
    * translates to the same dotted interval inside Catalyst planning.
    * Repetition-free nested leaves carry one slot per row, so their
    * footer stats prune with top-level semantics; array/map elements
    * stay unindexed by design. The oracle replays the band over the
    * flat source column.
    */
  def qZoneMapNested(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonenest") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders").select(
      col("o_orderkey"),
      struct(col("o_totalprice").cast("decimal(12,2)").as("price"),
        col("o_orderpriority").as("prio")).as("info"))
    VersionedTable.overwrite(spark, table, all.filter(col("info.price") < 50000))
    VersionedTable.append(spark, table,
      all.filter(col("info.price").between(50000, 150000)))
    VersionedTable.append(spark, table, all.filter(col("info.price") > 150000))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRange(
      table, "info.price", 60000d, 140000d, v)
    require(kept.size < total,
      s"nested zone maps must skip the outer price bands (kept ${kept.size}/$total)")
    outBoundary(VersionedTable.readIndexed(spark, table, v)
      .filter(col("info.price") >= 60000 && col("info.price") <= 140000)
      .select(col("o_orderkey"), col("info.price").as("price"),
        col("info.prio").as("prio")))
  }

  /** q_zone_map_multi: CONJUNCTIVE multi-column skipping — orders
    * committed in 6 clusters (3 date eras × 2 price bands, the
    * two-dimensionally clustered OPTIMIZE layout) and probed with a
    * date range AND a price range through
    * [[VersionedTable.readRanges]]. Each predicate must eliminate
    * files the other keeps (asserted: survivors < either
    * single-column probe's survivors), and the survivors get BOTH
    * native-typed residuals.
    */
  def qZoneMapMulti(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonemulti") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_date"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    val eras = Seq(
      year(col("o_date")) <= 1996,
      year(col("o_date")).between(1997, 1998),
      year(col("o_date")) >= 1999)
    val bands = Seq(col("price") < 100000, col("price") >= 100000)
    var first = true
    for (e <- eras; b <- bands) {
      val slice = all.filter(e && b)
      if (first) { VersionedTable.overwrite(spark, table, slice); first = false }
      else VersionedTable.append(spark, table, slice)
    }
    val dLo = java.time.LocalDate.of(1997, 7, 1).toEpochDay.toDouble
    val dHi = java.time.LocalDate.of(1998, 6, 30).toEpochDay.toDouble
    val ranges = Seq(("o_date", dLo, dHi), ("price", 120000d, 400000d))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRanges(table, ranges, v)
    val (keptDate, _) = VersionedTable.filesForRange(table, "o_date", dLo, dHi, v)
    val (keptPrice, _) = VersionedTable.filesForRange(table, "price", 120000d, 400000d, v)
    require(kept.size < keptDate.size && kept.size < keptPrice.size,
      s"both predicates must eliminate files (multi ${kept.size} vs date " +
        s"${keptDate.size} / price ${keptPrice.size} of $total)")
    outBoundary(VersionedTable.readRanges(spark, table, ranges, v))
  }

  /** q_zone_map_string: the STRING zone-map domain — orders committed
    * in three priority-clustered appends, probed with a lexicographic
    * range that covers only the middle cluster. The probe must skip
    * the other clusters on the committed string min/max (printable-
    * ASCII, where driver compare, parquet byte order and Spark UTF8
    * order all agree); oracle = the plain BETWEEN the skipping must
    * be invisible to.
    */
  def qZoneMapString(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonestr") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    VersionedTable.overwrite(spark, table, all.filter(col("o_orderpriority") < "3"))
    VersionedTable.append(spark, table,
      all.filter(col("o_orderpriority") >= "3" && col("o_orderpriority") < "4"))
    VersionedTable.append(spark, table, all.filter(col("o_orderpriority") >= "4"))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRangeString(
      table, "o_orderpriority", "3", "3~", v)
    require(kept.nonEmpty && kept.size < total,
      s"string zone maps must skip the other priority clusters (kept ${kept.size}/$total)")
    VersionedTable.readRangeString(spark, table, "o_orderpriority", "3", "3~", v)
  }

  /** q_zone_map_auto: AUTOMATIC file skipping — the same key-clustered
    * layout as [[qZoneMapRead]], but read through
    * [[VersionedTable.readIndexed]] with a PLAIN `.filter()`: the
    * [[graft.sources.ZoneMapFileIndex]] translates the predicate
    * inside Catalyst planning and prunes the non-intersecting
    * commits' files with no explicit readRange call (the assertion
    * consults the same stats the index does; the planning-time
    * numFiles evidence is LakehouseSpec's). The oracle is the plain
    * range SQL — identical semantics to the full scan.
    */
  def qZoneMapAuto(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zoneauto") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val mx = all.agg(max("c_custkey")).head.getLong(0)
    val third = mx / 3
    VersionedTable.overwrite(spark, table, all.filter(col("c_custkey") <= third))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") > third && col("c_custkey") <= 2 * third))
    VersionedTable.append(spark, table, all.filter(col("c_custkey") > 2 * third))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRange(
      table, "c_custkey", (third + 1).toDouble, (2 * third).toDouble, v)
    require(kept.size < total,
      s"the index's stats must exclude the outer commits (kept ${kept.size}/$total)")
    VersionedTable.readIndexed(spark, table, v)
      .filter(col("c_custkey").between(third + 1, 2 * third))
  }

  /** q_check_constraint: write-time CHECK constraints under the
    * oracle gate — supplier committed as v1, a CHECK added (validated
    * against the existing rows inside the commit closure), a VALID
    * append lands, and a VIOLATING append must throw while publishing
    * NOTHING (version and row count asserted unchanged — the
    * atomic-failure contract). The returned head is what the oracle
    * replays: base ∪ the valid batch, untouched by the failed write.
    */
  def qCheckConstraint(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "check") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    VersionedTable.overwrite(spark, table, all)
    VersionedTable.addCheckConstraint(spark, table,
      "key_and_balance", "s_suppkey >= 0 AND s_acctbal IS NOT NULL")
    val vOk = VersionedTable.append(spark, table,
      all.filter(col("s_suppkey") % 5 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + 100000L))
    val rows = VersionedTable.read(spark, table).count()
    val rejected =
      try {
        VersionedTable.append(spark, table,
          all.limit(3).withColumn("s_suppkey", -col("s_suppkey") - 1))
        false
      } catch { case _: IllegalArgumentException => true }
    require(rejected, "a violating append must throw")
    require(VersionedTable.versions(table).last == vOk &&
      VersionedTable.read(spark, table).count() == rows,
      "the failed write must publish nothing")
    outBoundary(VersionedTable.read(spark, table))
  }

  /** q_drop_column: DROP COLUMN as a metadata-only commit — supplier
    * committed with three columns, one dropped (file list asserted
    * IDENTICAL across the commit: zero data moved; the reader's
    * manifest schema simply stops materializing the column), then a
    * post-drop append lands with the narrowed schema. The oracle
    * replays the surviving projection ∪ the appended batch.
    */
  def qDropColumn(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "dropc") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"),
        col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    val v1 = VersionedTable.overwrite(spark, table, all)
    val v2 = VersionedTable.dropColumn(spark, table, "s_nationkey")
    require(VersionedTable.snapshotFiles(table, Some(v2)) ==
      VersionedTable.snapshotFiles(table, Some(v1)),
      "drop must carry the data files by reference")
    VersionedTable.append(spark, table,
      all.filter(col("s_suppkey") % 3 === 0)
        .select((col("s_suppkey") + 100000L).as("s_suppkey"), col("s_acctbal")))
    outBoundary(VersionedTable.read(spark, table))
  }

  /** q_rename_column: RENAME COLUMN as a metadata-only commit —
    * supplier committed, the balance column renamed (file list
    * asserted IDENTICAL: zero data moved; files keep the original
    * PHYSICAL name forever, the manifest maps it to the new logical
    * name), then an append lands UNDER THE NEW NAME — so the head
    * read merges pre-rename files (physical name translated) with
    * post-rename files seamlessly. The oracle replays the projection
    * under the new name ∪ the appended batch.
    */
  def qRenameColumn(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "renamec") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    val v1 = VersionedTable.overwrite(spark, table, all)
    val v2 = VersionedTable.renameColumn(spark, table, "s_acctbal", "balance")
    require(VersionedTable.snapshotFiles(table, Some(v2)) ==
      VersionedTable.snapshotFiles(table, Some(v1)),
      "rename must carry the data files by reference")
    VersionedTable.append(spark, table,
      all.filter(col("s_suppkey") % 4 === 0)
        .select((col("s_suppkey") + 100000L).as("s_suppkey"),
          col("s_acctbal").as("balance")))
    outBoundary(VersionedTable.read(spark, table))
  }

  /** q_add_column: ADD COLUMN as a metadata-only commit (round 12 —
    * the DDL that makes schema evolution explicit instead of
    * append-implicit) — supplier committed with two columns, a
    * nullable BIGINT added (file list asserted IDENTICAL across the
    * commit: zero data IO; every pre-add row reads the column as
    * NULL), then a post-add append POPULATES it. The oracle replays
    * the NULL-extended projection ∪ the populated batch — the DDL
    * must be indistinguishable from having declared the column all
    * along.
    */
  def qAddColumn(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "addc") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    val v1 = VersionedTable.overwrite(spark, table, all)
    val v2 = VersionedTable.addColumn(spark, table, "s_tier",
      org.apache.spark.sql.types.LongType)
    require(VersionedTable.snapshotFiles(table, Some(v2)) ==
      VersionedTable.snapshotFiles(table, Some(v1)),
      "add column must carry the data files by reference")
    VersionedTable.append(spark, table,
      all.filter(col("s_suppkey") % 3 === 0)
        .select((col("s_suppkey") + 100000L).as("s_suppkey"), col("s_acctbal"),
          (col("s_suppkey") % 5).as("s_tier")))
    outBoundary(VersionedTable.read(spark, table))
  }

  /** q_zone_map_nulls: NULL-COUNT zone maps under the oracle gate —
    * customers land in three NULLNESS-clustered commits (balances all
    * NULL / fully populated / mixed), and an `IS NOT NULL` read
    * through the AUTOMATIC path must skip the all-null commit's files
    * (which carry NO [min, max] interval at all — there is no
    * non-null value to index; only the committed null count can skip
    * them). Both probe directions asserted via the explicit
    * filesForNullness probe; the oracle replays the nullness rule the
    * skipping must be invisible to.
    */
  def qZoneMapNulls(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonenull") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"),
      col("c_acctbal").cast("decimal(12,2)").as("c_acctbal"))
    VersionedTable.overwrite(spark, table,
      all.filter(col("c_custkey") % 4 === 0)
        .withColumn("c_acctbal", lit(null).cast("decimal(12,2)")))
    VersionedTable.append(spark, table, all.filter(col("c_custkey") % 4 === 1))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") % 4 >= 2).withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal"))))
    val v = Some(VersionedTable.versions(table).last)
    val (keptNN, total) =
      VersionedTable.filesForNullness(table, "c_acctbal", wantNull = false, v)
    require(keptNN.size < total, "IS NOT NULL must skip the all-null commit")
    val (keptN, _) =
      VersionedTable.filesForNullness(table, "c_acctbal", wantNull = true, v)
    require(keptN.size < total, "IS NULL must skip the fully-populated commit")
    outBoundary(
      VersionedTable.readIndexed(spark, table, v).filter(col("c_acctbal").isNotNull))
  }

  /** q_table_changes: the CDC READ over the commit log — after the
    * same v1 → v2 upsert history as q_upsert_versioned, the v1→v2
    * row-level delta (`_change` = insert/delete; an updated key is
    * delete(old) + insert(new)). The upsert rewrote files, so this
    * exercises the general multiset-symmetric-difference path; the
    * append FAST path (new files only, no diff job) is spec-pinned in
    * LakehouseSpec. Oracle replays the merge and both EXCEPT ALL
    * directions in SQL.
    */
  def qTableChanges(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "changes") { root =>
    val table = root + "/t"
    val v1 = VersionedTable.overwrite(spark, table, target(spark, dir))
    val v2 = VersionedTable.upsert(spark, table, updates(spark, dir), "c_custkey")
    VersionedTable.changesBetween(spark, table, v1, v2)
  }

  /** q_zone_map_prefix: the string PREFIX probe through the AUTOMATIC
    * read path — the same priority-clustered layout as
    * [[qZoneMapString]], but read via [[VersionedTable.readIndexed]]
    * with a plain `.startsWith` filter: [[graft.sources.ZoneMapFileIndex]]
    * translates the prefix to the interval [p, p ++ DEL) and prunes
    * the other priority clusters inside Catalyst planning (asserted
    * via the same stats the index consults). Oracle is the LIKE
    * 'p%' filter the pruning must be invisible to.
    */
  def qZoneMapPrefix(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zonepre") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    VersionedTable.overwrite(spark, table, all.filter(col("o_orderpriority") < "3"))
    VersionedTable.append(spark, table,
      all.filter(col("o_orderpriority") >= "3" && col("o_orderpriority") < "4"))
    VersionedTable.append(spark, table, all.filter(col("o_orderpriority") >= "4"))
    val v = Some(VersionedTable.versions(table).last)
    val (kept, total) = VersionedTable.filesForRangeString(
      table, "o_orderpriority", "3", "3~", v)
    require(kept.nonEmpty && kept.size < total,
      s"the prefix interval must skip the other priority clusters (kept ${kept.size}/$total)")
    VersionedTable.readIndexed(spark, table, v)
      .filter(col("o_orderpriority").startsWith("3"))
  }

  /** q_delete_versioned: predicate DELETE through the commit log with
    * COPY-ON-WRITE file pruning — the same key-clustered three-commit
    * layout as [[qZoneMapRead]], then
    * `DELETE WHERE c_custkey IN (middle third) AND c_acctbal < 0`.
    * The zone maps prove the outer clusters hold no matching row, so
    * their files must carry into the new version BY REFERENCE
    * (asserted: the outer clusters' file sets are IDENTICAL across
    * the delete — zero bytes of untouched data moved, the property
    * that makes a keyed delete O(touched files) instead of O(table)
    * at 100 TB). The oracle replays the NOT(predicate) row set the
    * commit must resolve to.
    */
  def qDeleteVersioned(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "delete") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val mx = all.agg(max("c_custkey")).head.getLong(0)
    val third = mx / 3
    VersionedTable.overwrite(spark, table, all.filter(col("c_custkey") <= third))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") > third && col("c_custkey") <= 2 * third))
    val v0 = VersionedTable.append(spark, table, all.filter(col("c_custkey") > 2 * third))
    def outer(v: Long): Set[String] = {
      val lo = VersionedTable.filesForRange(table, "c_custkey",
        1d, third.toDouble, Some(v))._1
      val hi = VersionedTable.filesForRange(table, "c_custkey",
        (2 * third + 1).toDouble, mx.toDouble, Some(v))._1
      (lo ++ hi).toSet
    }
    // predicate bounds sit one key INSIDE the middle cluster: the
    // write-time ULP widening keeps a file whose stat touches a probe
    // boundary exactly, so a `> third` probe would conservatively
    // touch (and rewrite) the lower cluster's boundary file too
    val v1 = VersionedTable.delete(spark, table,
      col("c_custkey") > third + 1 && col("c_custkey") <= 2 * third - 1 &&
        col("c_acctbal") < 0)
    require(outer(v1) == outer(v0),
      "COW delete must carry the untouched clusters' files by reference")
    VersionedTable.read(spark, table, Some(v1))
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** q_update_versioned: predicate UPDATE through the commit log —
    * orders committed in three price-band appends, then
    * `UPDATE SET o_orderpriority = 'X-' || o_orderpriority WHERE
    * price > 200000`. Only the top band's files may be rewritten
    * (asserted: the lower bands' file sets are identical across the
    * update); the assignment evaluates against the OLD row, rows
    * where the predicate is false are byte-identical. Oracle replays
    * the CASE WHEN over the same source table.
    */
  def qUpdateVersioned(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "update") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.filter(col("price") < 50000))
    VersionedTable.append(spark, table, all.filter(col("price").between(50000, 150000)))
    val v0 = VersionedTable.append(spark, table, all.filter(col("price") > 150000))
    def lowerBands(v: Long): Set[String] =
      VersionedTable.filesForRange(table, "price", 0d, 150000d, Some(v))._1.toSet
    // 200000 sits strictly above the middle band's 150000 boundary so
    // the ULP-widened stats cannot conservatively touch its files
    val v1 = VersionedTable.update(spark, table,
      col("price") > lit(BigDecimal(200000)),
      Seq("o_orderpriority" -> concat(lit("X-"), col("o_orderpriority"))))
    require(lowerBands(v1) == lowerBands(v0),
      "COW update must carry the untouched price bands' files by reference")
    outBoundary(VersionedTable.read(spark, table, Some(v1))
      .select(col("o_orderkey"), col("o_orderpriority"), col("price")))
  }

  /** q_delete_mor: [[qDeleteVersioned]]'s MERGE-ON-READ twin — the
    * same key-clustered layout and predicate, but the delete stages a
    * DELETION VECTOR instead of rewriting the touched files: the
    * query asserts the data-file list is IDENTICAL across the commit
    * (zero data bytes moved — the property that makes narrow deletes
    * affordable at 100 TB) and that the metadata-only
    * [[VersionedTable.rowCount]] agrees with the surviving row set
    * the oracle replays.
    */
  def qDeleteMor(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "delmor") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val mx = all.agg(max("c_custkey")).head.getLong(0)
    val third = mx / 3
    VersionedTable.overwrite(spark, table, all.filter(col("c_custkey") <= third))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") > third && col("c_custkey") <= 2 * third))
    val v0 = VersionedTable.append(spark, table, all.filter(col("c_custkey") > 2 * third))
    def allFiles(v: Long): Set[String] =
      VersionedTable.filesForRange(table, "c_custkey", 1d, mx.toDouble, Some(v))._1.toSet
    val v1 = VersionedTable.deleteMoR(spark, table,
      col("c_custkey") > third + 1 && col("c_custkey") <= 2 * third - 1 &&
        col("c_acctbal") < 0)
    require(allFiles(v1) == allFiles(v0),
      "MoR delete must not rewrite any data file")
    require(VersionedTable.deletionVectors(table, Some(v1)).nonEmpty,
      "MoR delete must commit a deletion vector")
    val out = VersionedTable.read(spark, table, Some(v1))
      .select(col("c_custkey"), col("c_acctbal"))
    require(VersionedTable.rowCount(spark, table, Some(v1)) == out.count(),
      "metadata-only COUNT(*) must match the scan")
    out
  }

  /** q_update_mor: [[qUpdateVersioned]]'s MERGE-ON-READ twin — same
    * price-band layout and assignment, but matching rows are
    * tombstoned via a deletion vector and their updated images
    * appended: ALL original data files must still be referenced
    * (asserted), so the untouched bands' bytes never move and the
    * touched band pays O(matching rows), not O(file).
    */
  def qUpdateMor(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "updmor") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.filter(col("price") < 50000))
    VersionedTable.append(spark, table, all.filter(col("price").between(50000, 150000)))
    val v0 = VersionedTable.append(spark, table, all.filter(col("price") > 150000))
    def allFiles(v: Long): Set[String] =
      VersionedTable.filesForRange(table, "price", 0d, 1e9, Some(v))._1.toSet
    val v1 = VersionedTable.updateMoR(spark, table,
      col("price") > lit(BigDecimal(200000)),
      Seq("o_orderpriority" -> concat(lit("X-"), col("o_orderpriority"))))
    require(allFiles(v0).subsetOf(allFiles(v1)),
      "MoR update must carry every original data file")
    require(VersionedTable.deletionVectors(table, Some(v1)).nonEmpty,
      "MoR update must tombstone the old images through a deletion vector")
    outBoundary(VersionedTable.read(spark, table, Some(v1))
      .select(col("o_orderkey"), col("o_orderpriority"), col("price")))
  }

  /** q_count_meta: COUNT(*) answered from manifests + committed file
    * stats alone — after two appends and a MoR delete, the returned
    * count never scans a data file (the DV subtraction reads only
    * the tiny vector); the oracle replays the full count in SQL.
    */
  def qCountMeta(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "cnt") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.filter(col("o_orderkey") % 2 === 0))
    VersionedTable.append(spark, table, all.filter(col("o_orderkey") % 2 =!= 0))
    val v = VersionedTable.deleteMoR(spark, table, col("price") < 10000)
    import spark.implicits._
    Seq(VersionedTable.rowCount(spark, table, Some(v))).toDF("cnt")
  }

  /** q_restore: the O(manifest) undo — supplier's even keys committed
    * as v1, a "bad" append lands as v2, RESTORE republishes v1's
    * exact file list as v3 (asserted identical — zero data moved) and
    * the head read must resolve to the pre-mistake row set the oracle
    * replays. History stays intact: v2 is still readable.
    */
  def qRestore(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "restore") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    val v1 = VersionedTable.overwrite(spark, table, all.filter(col("s_suppkey") % 2 === 0))
    val v2 = VersionedTable.append(spark, table, all.filter(col("s_suppkey") % 2 =!= 0))
    val v3 = VersionedTable.restore(spark, table, v1)
    def files(v: Long): Set[String] =
      VersionedTable.filesForRange(table, "s_suppkey", 0d, 1e12, Some(v))._1.toSet
    require(files(v3) == files(v1), "restore must republish v1's exact file list")
    require(VersionedTable.read(spark, table, Some(v2)).count() == all.count(),
      "the undone commit stays time-travelable")
    outBoundary(VersionedTable.read(spark, table)) // head == the restored snapshot
  }

  /** q_clone: SHALLOW CLONE as a dev-branch — supplier committed to
    * `src`, cloned zero-copy into `dst` (file-list identity asserted
    * in-query), then the two DIVERGE: a predicate delete mutates src,
    * an append mutates the clone, and neither write may leak into the
    * other (asserted). The src is then compacted and vacuumed down to
    * one retained version — the hard-linked clone must still read its
    * full snapshot (inode refcounting closes the dangling-file caveat
    * path-reference shallow clones carry). The returned frame is the
    * clone's head; the oracle replays base ∪ appended-batch in SQL.
    */
  def qClone(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "clone") { root =>
    val src = root + "/src"
    val dst = root + "/dst"
    val all = t(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"),
        col("s_acctbal").cast("decimal(12,2)").as("s_acctbal"))
    VersionedTable.overwrite(spark, src, all)
    val vSrc = VersionedTable.versions(src).last
    VersionedTable.cloneTable(spark, src, dst)
    require(VersionedTable.snapshotFiles(dst) ==
      VersionedTable.snapshotFiles(src, Some(vSrc)),
      "zero-copy: the clone's manifest references the source's files")
    val srcRows = all.count()
    val batch = all.filter(col("s_suppkey") % 7 === 0)
      .withColumn("s_acctbal",
        (col("s_acctbal") + lit(BigDecimal("100.00"))).cast("decimal(12,2)"))
    VersionedTable.append(spark, dst, batch)
    VersionedTable.delete(spark, src, col("s_nationkey") < 10)
    require(VersionedTable.read(spark, src).count() < srcRows,
      "src delete must land")
    require(VersionedTable.read(spark, src)
      .filter(col("s_suppkey") % 7 === 0 && col("s_nationkey") >= 10).count() ==
      all.filter(col("s_suppkey") % 7 === 0 && col("s_nationkey") >= 10).count(),
      "the clone's append must not leak into src")
    // src maintenance reclaims the cloned-from dirs on ITS side; the
    // clone's hard links keep the shared bytes alive
    VersionedTable.compact(spark, src)
    VersionedTable.vacuum(src, retain = 1, graceMs = 0)
    outBoundary(VersionedTable.read(spark, dst))
  }

  /** q_mat_view: an INCREMENTALLY MAINTAINED materialized view under
    * the oracle gate — 1997-H1 order spend per customer committed as
    * the source's v1 and fully refreshed; H2 lands as an APPEND whose
    * refresh reads only the appended files (the CDC fast path); a
    * predicate DELETE then folds the small orders back OUT of the
    * aggregate (counts/sums are abelian-group aggregates — they merge
    * under deletion, no rescan). The returned frame is the view's
    * committed head state; the oracle recomputes the defining
    * aggregate from scratch over the surviving rows — incremental
    * maintenance must be indistinguishable from full recompute.
    */
  def qMatView(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mv") { root =>
    val src = root + "/src"
    val view = root + "/view"
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    VersionedTable.overwrite(spark, src, half("1997-01-01", "1997-07-01"))
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.append(spark, src, half("1997-07-01", "1998-01-01"))
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.delete(spark, src, col("o_totalprice") < 50000.00)
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    require(MaterializedView.freshAsOf(view).contains(
      VersionedTable.versions(src).last), "cursor must sit at the source head")
    MaterializedView.read(spark, view)
      .select(col("o_custkey"), col("mv_count"),
        col("mv_sum_o_totalprice").cast("double").as("mv_sum"))
  }

  /** q_mat_view_bucketed: the BUCKETED view state under the oracle
    * gate — same defining aggregate as q_mat_view, but the state table
    * partitions on pmod(hash(o_custkey), 64) and each refresh REPLACES
    * only the buckets its delta touches (round-9 advisory: the state
    * write must be O(touched groups), not O(all groups)). The third
    * commit deletes ONE customer's orders, so exactly one bucket is
    * touched — the query itself requires (a) every other bucket's
    * files to carry into the new version BY PATH (the copy-on-write
    * identity that bounds the write) and (b) all new files to sit in
    * the touched bucket. The oracle recomputes the aggregate from
    * scratch: bucketed incremental maintenance must be
    * indistinguishable from full recompute.
    */
  def qMatViewBucketed(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvb") { root =>
    val src = root + "/src"
    val view = root + "/view"
    val nB = 64
    val o = t(spark, dir, "orders")
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    VersionedTable.overwrite(spark, src, half("1997-01-01", "1997-07-01"))
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"),
      Seq("o_totalprice"), buckets = nB)
    VersionedTable.append(spark, src, half("1997-07-01", "1998-01-01"))
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    val kDel = VersionedTable.read(spark, src)
      .agg(org.apache.spark.sql.functions.min(col("o_custkey"))).head.getLong(0)
    val seg = s"${MaterializedView.BucketCol}__pv=" +
      spark.range(1).select(pmod(hash(lit(kDel)), lit(nB))).head.getInt(0)
    val before = VersionedTable.snapshotFiles(view).toSet
    VersionedTable.delete(spark, src, col("o_custkey") === kDel)
    MaterializedView.refresh(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    val after = VersionedTable.snapshotFiles(view).toSet
    require(before.filterNot(_.contains(seg)).subsetOf(after),
      "O(touched) contract: untouched buckets' state files must carry " +
        "into the refreshed version by reference")
    require((after -- before).forall(_.contains(seg)),
      "O(touched) contract: a one-bucket delta may only write that bucket")
    MaterializedView.read(spark, view)
      .select(col("o_custkey"), col("mv_count"),
        col("mv_sum_o_totalprice").cast("double").as("mv_sum"))
  }

  /** q_partition_join: the PARTITION-ALIGNED join — fact (orders) and
    * dim (per-priority attributes) both partitioned by
    * o_orderpriority; the dim then DROPS its 5-LOW partition, and the
    * aligned join must (a) prune that value at the MANIFEST — no pair
    * is planned for it, its fact files never open (asserted via the
    * common-value count) — and (b) agree exactly with the plain SQL
    * join over the surviving dim, which is what the oracle replays.
    */
  def qPartitionJoin(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "pj") { root =>
    val fact = root + "/fact"
    val dim = root + "/dim"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwritePartitioned(spark, fact, all, Seq("o_orderpriority"))
    VersionedTable.overwritePartitioned(spark, dim,
      all.select(col("o_orderpriority")).distinct()
        .withColumn("pr", substring(col("o_orderpriority"), 1, 1)),
      Seq("o_orderpriority"))
    VersionedTable.dropPartition(spark, dim, "o_orderpriority", "5-LOW")
    val joined = VersionedTable.joinPartitioned(spark, fact, dim,
      Seq("o_orderpriority"))
    require(VersionedTable.filesForPartition(fact, "o_orderpriority", "5-LOW")
      ._1.nonEmpty, "precondition: the fact side HAS 5-LOW files to prune")
    require(!joined.inputFiles.exists(_.contains("o_orderpriority__pv=5-LOW")),
      "manifest-level join pruning: the dropped dim value's fact files " +
        "must never be opened")
    outBoundary(joined.groupBy(col("o_orderpriority"), col("pr"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(28,4)")).cast("double").as("spend")))
  }

  /** q_id_mapping: ID column mapping under the oracle gate — the
    * rename/drop/re-add sequence name-based mapping REFUSES, run end
    * to end: orders committed id-mapped (files store `__gcid_<n>`
    * physical names), the priority column renamed (metadata-only —
    * file identity asserted), DROPPED (metadata-only), then RE-ADDED
    * by the odd-key append under a FRESH id. The final read must show
    * NULL priority for every pre-drop row — the dropped bytes still
    * sit in the carried files under the retired id, and the fresh id
    * is what makes them unable to resurrect (the Iceberg column-id
    * property). The oracle replays the survivorship as a CASE.
    */
  def qIdMapping(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "idmap") { root =>
    val table = root + "/t"
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwriteIdMapped(spark, table,
      o.filter(col("o_orderkey") % 2 === 0))
    require(VersionedTable.columnMapping(table) == "id")
    val before = VersionedTable.snapshotFiles(table).toSet
    VersionedTable.renameColumn(spark, table, "prio", "priority")
    VersionedTable.dropColumn(spark, table, "priority")
    require(VersionedTable.snapshotFiles(table).toSet == before,
      "rename and drop must be metadata-only — zero data moved")
    VersionedTable.append(spark, table,
      o.filter(col("o_orderkey") % 2 =!= 0).withColumnRenamed("prio", "priority"))
    outBoundary(VersionedTable.read(spark, table))
  }

  /** q_partition_join_outer: the OUTER flavor of the partition-aligned
    * join — after the dim drops its 5-LOW partition, a LEFT join must
    * (a) still prune the matched pairs at the manifest, (b) PRESERVE
    * the fact's 5-LOW rows through the left-rest branch (joined
    * against an empty dim frame that Catalyst folds to a null-extended
    * projection — the dim side is never scanned for them, asserted),
    * and (c) agree exactly with the plain SQL LEFT JOIN the oracle
    * replays as a CASE over the surviving dim values.
    */
  def qPartitionJoinOuter(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "pjo") { root =>
    val fact = root + "/fact"
    val dim = root + "/dim"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwritePartitioned(spark, fact, all, Seq("o_orderpriority"))
    VersionedTable.overwritePartitioned(spark, dim,
      all.select(col("o_orderpriority")).distinct()
        .withColumn("pr", substring(col("o_orderpriority"), 1, 1)),
      Seq("o_orderpriority"))
    VersionedTable.dropPartition(spark, dim, "o_orderpriority", "5-LOW")
    val joined = VersionedTable.joinPartitioned(spark, fact, dim,
      Seq("o_orderpriority"), "left")
    require(joined.inputFiles.exists(_.contains("o_orderpriority__pv=5-LOW")),
      "the left-rest branch must scan the unmatched fact partition")
    outBoundary(joined.groupBy(col("o_orderpriority"), col("pr"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(28,4)")).cast("double").as("spend")))
  }

  /** q_mat_view_stats: the STATS materialized view under the oracle
    * gate — per-customer count / exact decimal sum / sum-of-squares
    * maintained across an H2 append and a predicate delete (all three
    * state columns abelian: no rescan on any path), with avg and
    * population variance DERIVED at read time in double with a fixed
    * operation order the oracle replays term-for-term (exact decimal
    * components → identical doubles, hash-stable).
    */
  def qMatViewStats(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvs") { root =>
    val src = root + "/src"
    val view = root + "/view"
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    VersionedTable.overwrite(spark, src, half("1997-01-01", "1997-07-01"))
    MaterializedView.refreshStats(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.append(spark, src, half("1997-07-01", "1998-01-01"))
    MaterializedView.refreshStats(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.delete(spark, src, col("o_totalprice") < 50000.00)
    MaterializedView.refreshStats(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    MaterializedView.readStats(spark, view, Seq("o_custkey"), Seq("o_totalprice"))
      .select(col("o_custkey"), col("mv_count"),
        col("mv_sum_o_totalprice").cast("double").as("mv_sum"),
        col("mv_avg_o_totalprice").as("mv_avg"),
        col("mv_var_o_totalprice").as("mv_var"))
  }

  /** q_multi_commit: MULTI-TABLE atomic transactions under the oracle
    * gate — a fact (orders) and a dim (customer) table enrolled in one
    * catalog, written by two `appendAll` transactions (the second
    * touches only the fact side, so the dim's pin must CARRY). The
    * returned frame reads BOTH tables through the catalog snapshot's
    * pinned versions — the consistent cross-table read the catalog
    * exists for — and joins them into a per-segment spend aggregate
    * the oracle replays over the complete source tables. In-query
    * asserts pin the protocol: one catalog version per transaction,
    * snapshot pins at the member heads.
    */
  def qMultiCommit(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mc") { root =>
    val fact = root + "/fact"
    val dim = root + "/dim"
    val cat = root + "/cat"
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    val c = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    VersionedTable.overwrite(spark, fact, o.filter(col("o_custkey") % 3 === 0))
    VersionedTable.overwrite(spark, dim, c.filter(col("c_custkey") % 2 === 0))
    VersionedTable.appendAll(spark, cat, Seq(
      fact -> o.filter(col("o_custkey") % 3 === 1),
      dim -> c.filter(col("c_custkey") % 2 =!= 0)))
    VersionedTable.appendAll(spark, cat, Seq(
      fact -> o.filter(col("o_custkey") % 3 === 2)))
    require(VersionedTable.catalogVersions(cat) == Seq(1L, 2L),
      "one catalog version per transaction")
    val pins = VersionedTable.catalogSnapshot(cat).toMap
    require(pins(fact) == VersionedTable.versions(fact).last &&
      pins(dim) == VersionedTable.versions(dim).last,
      "snapshot pins must sit at the member heads (dim's pin carried)")
    VersionedTable.read(spark, fact, Some(pins(fact)))
      .join(VersionedTable.read(spark, dim, Some(pins(dim))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(28,4)")).cast("double").as("spend"))
  }

  /** q_multi_mutate: cross-table predicate DELETE + UPDATE as ONE
    * atomic catalog transaction — the GDPR-erasure shape (purge a
    * band of fact rows while tombstoning the matching dim rows, with
    * no interleaving where a reader sees one side done and the other
    * not). The mutations reuse the single-table COW planners; their
    * rendered manifests EMBED in the catalog publish, so both rewrites
    * become durable at one commit point. In-query asserts pin the
    * protocol: the tagged replay is a no-op on every member, and the
    * catalog snapshot reads both post-mutation heads. The oracle
    * replays the delete as NOT(pred) and the update as a CASE over the
    * complete source tables.
    */
  def qMultiMutate(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mm") { root =>
    import graft.sources.{CatDelete, CatUpdate}
    val fact = root + "/fact"
    val dim = root + "/dim"
    val cat = root + "/cat"
    val o = t(spark, dir, "orders").select(col("o_custkey"),
      col("o_totalprice").cast("decimal(12,2)").as("price"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("status", lit("live"))
    VersionedTable.overwrite(spark, fact, o)
    VersionedTable.overwrite(spark, dim, c)
    def txn = Seq(
      CatDelete(fact, col("price") < 10000.00),
      CatUpdate(dim, col("c_custkey") % 10 === 3,
        Seq("status" -> lit("erased"))))
    val vc = VersionedTable.commitAll(spark, cat, txn, Some("mm" -> 1L))
    val (hf, hd) = (VersionedTable.versions(fact).last,
      VersionedTable.versions(dim).last)
    require(VersionedTable.commitAll(spark, cat, txn, Some("mm" -> 1L)) == vc &&
      VersionedTable.versions(fact).last == hf &&
      VersionedTable.versions(dim).last == hd,
      "the replayed transaction must be a no-op on every member")
    val pins = VersionedTable.catalogSnapshot(cat).toMap
    outBoundary(VersionedTable.read(spark, fact, Some(pins(fact)))
      .join(VersionedTable.read(spark, dim, Some(pins(dim))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(28,4)")).cast("double").as("spend")))
  }

  /** q_drop_partition: hive-style partition columns as a MANIFEST
    * surface — orders created PARTITIONED by o_orderpriority (writes
    * route rows into value directories while the column stays in the
    * data files), an append lands auto-routed, a partition-scoped
    * probe must open only its value directory's files (asserted), and
    * DROP PARTITION retires the 3-MEDIUM slice as a pure file-list
    * subtraction — the surviving files carried BY REFERENCE (asserted:
    * zero data moved, the retention operation a 100 TB table runs
    * daily). The oracle replays the `<> '3-MEDIUM'` row set the drop
    * must resolve to.
    */
  def qDropPartition(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "droppart") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwritePartitioned(spark, table,
      all.filter(col("o_orderkey") % 2 === 0), Seq("o_orderpriority"))
    VersionedTable.append(spark, table, all.filter(col("o_orderkey") % 2 =!= 0))
    val (kept, total) = VersionedTable.filesForPartition(table, "o_orderpriority", "1-URGENT")
    require(kept.nonEmpty && kept.size < total,
      s"the partition probe must open only its value directory (kept ${kept.size}/$total)")
    val before = VersionedTable.snapshotFiles(table).toSet
    val v1 = VersionedTable.dropPartition(spark, table, "o_orderpriority", "3-MEDIUM")
    val after = VersionedTable.snapshotFiles(table, Some(v1)).toSet
    require(after.subsetOf(before), "DROP PARTITION must stage nothing — metadata only")
    outBoundary(VersionedTable.read(spark, table, Some(v1)))
  }

  /** q_mat_view_minmax: the MIN/MAX materialized view under the
    * oracle gate — 1997-H1 per-customer order-price extrema committed
    * and refreshed; H2 lands as an append (pure semilattice merge, no
    * rescan); a predicate DELETE then removes the TOP price band — the
    * exact case min/max cannot absorb as state math: the touched
    * groups' maxima recompute delta-scoped against the head snapshot
    * while untouched groups keep their stored extrema. The oracle
    * recomputes count/min/max from scratch over the surviving rows —
    * the two maintenance regimes must be indistinguishable from it.
    */
  def qMatViewMinMax(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvx") { root =>
    val src = root + "/src"
    val view = root + "/view"
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    VersionedTable.overwrite(spark, src, half("1997-01-01", "1997-07-01"))
    MaterializedView.refreshMinMax(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.append(spark, src, half("1997-07-01", "1998-01-01"))
    MaterializedView.refreshMinMax(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    VersionedTable.delete(spark, src, col("o_totalprice") > 300000.00)
    MaterializedView.refreshMinMax(spark, view, src, Seq("o_custkey"), Seq("o_totalprice"))
    require(MaterializedView.freshAsOf(view, "mvx").contains(
      VersionedTable.versions(src).last), "cursor must sit at the source head")
    MaterializedView.read(spark, view)
      .select(col("o_custkey"), col("mv_count"),
        col("mv_min_o_totalprice").cast("double").as("mv_min"),
        col("mv_max_o_totalprice").cast("double").as("mv_max"))
  }

  /** q_mat_view_join: an incrementally maintained JOINED materialized
    * view under the oracle gate — the delta-join (DBToaster) shape:
    * per-market-segment order spend, where orders (fact) and customers
    * (dim) are SEPARATE versioned tables mutated independently. H1
    * orders and a PARTIAL customer dim commit first (full refresh);
    * H2 orders land as a fact-side append (ΔA ⋈ dim@cursor); the
    * missing customers land as a dim-side append whose refresh joins
    * the previously-DANGLING orders in (fact@head ⋈ ΔB); a predicate
    * delete then folds small orders back out through the signed
    * delta. Both source cursors commit atomically with each refresh
    * (asserted). The oracle recomputes the defining join-aggregate
    * from scratch over the final state of both sides — incremental
    * delta-join maintenance must be indistinguishable from it.
    */
  def qMatViewJoin(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvj") { root =>
    val fact = root + "/fact"
    val dim = root + "/dim"
    val view = root + "/view"
    val o = t(spark, dir, "orders")
      .select(col("o_custkey").as("custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    val c = t(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    def refreshIt(): Long = MaterializedView.refreshJoin(spark, view, fact, dim,
      Seq("custkey"), Seq("c_mktsegment"), Seq("o_totalprice"))
    VersionedTable.overwrite(spark, fact, half("1997-01-01", "1997-07-01"))
    VersionedTable.overwrite(spark, dim, c.filter(col("custkey") % 3 =!= 0))
    refreshIt()
    VersionedTable.append(spark, fact, half("1997-07-01", "1998-01-01"))
    refreshIt()
    VersionedTable.append(spark, dim, c.filter(col("custkey") % 3 === 0))
    refreshIt()
    VersionedTable.delete(spark, fact, col("o_totalprice") < 50000.00)
    refreshIt()
    require(MaterializedView.freshAsOfJoin(view) ==
      ((Some(VersionedTable.versions(fact).last),
        Some(VersionedTable.versions(dim).last))),
      "both cursors must sit at their source heads")
    MaterializedView.read(spark, view)
      .select(col("c_mktsegment"), col("mv_count"),
        col("mv_sum_o_totalprice").cast("double").as("mv_sum"))
  }

  /** q_mat_view_chain: the N-ARY chain materialized view under the
    * oracle gate — per-nation order spend over THREE independently
    * mutated versioned tables (orders ⋈ customer ⋈ nation), maintained
    * by the telescoping signed decomposition: the fact append's
    * refresh costs Δfact ⋈ dims only; a mid-table (customer) delete
    * folds that nation's orders back out; a dim (nation) delete
    * removes whole groups; the last refresh carries TWO terms at once
    * (fact append + dim delete committed between refreshes). All three
    * cursors commit atomically with the state (asserted). The oracle
    * recomputes the 3-way join aggregate from scratch over the final
    * state of all sides.
    */
  def qMatViewChain(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvc") { root =>
    val fact = root + "/fact"
    val mid = root + "/mid"
    val dim = root + "/dim"
    val view = root + "/view"
    // scoped to 1997 like the other MV oracle queries — the same code
    // paths at a fraction of the staged volume (the query's cost is
    // its own table builds + refreshes, all inside the measurement)
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_nationkey").as("nationkey"))
    val nn = t(spark, dir, "nation")
      .select(col("n_nationkey").as("nationkey"), col("n_name"))
    def refreshIt(): Long = MaterializedView.refreshJoinChain(spark, view,
      Seq(fact, mid, dim), Seq(Seq("custkey"), Seq("nationkey")),
      Seq("n_name"), Seq("price"))
    def third(r: Int) = o.filter(col("o_orderkey") % 3 === r).drop("o_orderkey")
    VersionedTable.overwrite(spark, fact, third(0))
    VersionedTable.overwrite(spark, mid, c)
    VersionedTable.overwrite(spark, dim, nn)
    refreshIt()
    VersionedTable.append(spark, fact, third(1))
    refreshIt() // the append fast path: Δfact ⋈ mid ⋈ dim only
    VersionedTable.delete(spark, mid, col("custkey") % 7 === 0)
    refreshIt() // mid delete folds those customers' orders back out
    VersionedTable.delete(spark, dim, col("nationkey") >= 20)
    VersionedTable.append(spark, fact, third(2))
    refreshIt() // TWO terms in one refresh: fact insert + dim delete
    require(MaterializedView.freshAsOfChain(view, 3) ==
      Seq(fact, mid, dim).map(s => Some(VersionedTable.versions(s).last)),
      "all three cursors must sit at their source heads")
    MaterializedView.read(spark, view)
      .select(col("n_name"), col("mv_count"),
        col("mv_sum_price").cast("double").as("mv_sum"))
  }

  /** q_mat_view_nested: VIEW COMPOSITION under the oracle gate — the
    * view state is itself a versioned table, so `changesBetween` over
    * the inner view's refresh commits is a signed delta the OUTER view
    * folds with no new machinery. Inner: per-(bucket, custkey) order
    * counts/sums; outer: per-bucket rollup where the inner's mv_count
    * rides as a SUM column — so the outer's own mv_count counts inner
    * GROUPS (distinct custkeys), its sums roll up rows and spend
    * exactly, and a source delete propagates through BOTH layers
    * (including groups leaving the inner view entirely). The oracle
    * recomputes all three rollup levels from the surviving source
    * rows.
    */
  def qMatViewNested(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvn") { root =>
    val src = root + "/src"
    val inner = root + "/inner"
    val outer = root + "/outer"
    val o = t(spark, dir, "orders")
      .select((col("o_custkey") % 10).as("bucket"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"),
        col("o_orderdate"))
    def half(lo: String, hi: String) = o
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .drop("o_orderdate")
    def refreshBoth(): Unit = {
      MaterializedView.refresh(spark, inner, src, Seq("bucket", "o_custkey"), Seq("price"))
      MaterializedView.refresh(spark, outer, inner, Seq("bucket"),
        Seq("mv_count", "mv_sum_price"), viewKey = "outer")
    }
    VersionedTable.overwrite(spark, src, half("1997-01-01", "1997-07-01"))
    refreshBoth()
    VersionedTable.append(spark, src, half("1997-07-01", "1998-01-01"))
    refreshBoth()
    VersionedTable.delete(spark, src, col("price") < 60000.00)
    refreshBoth()
    require(MaterializedView.freshAsOf(outer, "outer").contains(
      VersionedTable.versions(inner).last),
      "the outer cursor must sit at the INNER view's head")
    MaterializedView.read(spark, outer)
      .select(col("bucket"), col("mv_count").as("n_groups"),
        col("mv_sum_mv_count").cast("long").as("n_rows"),
        col("mv_sum_mv_sum_price").cast("double").as("total"))
  }

  /** q_mat_view_factored: HIGHER-ORDER incremental view maintenance
    * by COMPOSITION — the raw chain view's one inherent cost is that
    * a MIDDLE-table delta joins against the fact snapshot (term i =
    * fact@head ⋈ Δmid ⋈ dim@old). The factored form removes it with
    * the pieces that already exist: an INNER single-table view
    * pre-aggregates the fact per join key (count/sum, incrementally
    * maintained), and the OUTER chain view joins (inner, mid, dim) —
    * so a fact delta costs the inner's cheap single-table refresh,
    * and a mid/dim delta joins Δmid against the O(keys) INNER STATE,
    * never the fact (the DBToaster higher-order decomposition,
    * expressed as view-over-view + chain instead of new machinery).
    * The outer's own mv_count counts LIVE JOIN KEYS (customers with
    * surviving orders); the fact-row count and spend ride as sums of
    * the inner's state columns. The spec proves the never-touches-
    * the-fact claim destructively (the fact's directory is DELETED
    * and the mid-delta refresh still succeeds); the oracle replays
    * all three rollup levels from scratch.
    */
  def qMatViewFactored(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "mvf") { root =>
    val fact = root + "/fact"
    val mid = root + "/mid"
    val dim = root + "/dim"
    val inner = root + "/inner"
    val outer = root + "/outer"
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey").as("custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    val c = t(spark, dir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_nationkey").as("nationkey"))
    val nn = t(spark, dir, "nation")
      .select(col("n_nationkey").as("nationkey"), col("n_name"))
    def refreshAll(): Unit = {
      MaterializedView.refreshChainFactored(spark, outer, inner, fact,
        Seq(mid, dim), Seq(Seq("custkey"), Seq("nationkey")),
        Seq("n_name"), Seq("price"))
      ()
    }
    VersionedTable.overwrite(spark, fact, o.filter(col("o_orderkey") % 2 === 0).drop("o_orderkey"))
    VersionedTable.overwrite(spark, mid, c)
    VersionedTable.overwrite(spark, dim, nn)
    refreshAll()
    VersionedTable.append(spark, fact, o.filter(col("o_orderkey") % 2 =!= 0).drop("o_orderkey"))
    refreshAll() // fact delta: the inner's cheap single-table refresh
    VersionedTable.delete(spark, mid, col("custkey") % 7 === 0)
    refreshAll() // mid delta: joins the O(keys) inner state, NOT the fact
    VersionedTable.delete(spark, fact, col("price") < 60000.00)
    refreshAll() // fact delete: fully-emptied customers leave the inner
    MaterializedView.readFactored(spark, outer, Seq("n_name"), Seq("price"))
      .select(col("n_name"), col("n_keys").as("n_custs"),
        col("mv_count").as("n_orders"),
        col("mv_sum_price").cast("double").as("spend"))
  }

  /** q_optimize_cluster: OPTIMIZE as layout maintenance — orders land
    * UNCLUSTERED (generator row order: every file's o_totalprice
    * interval spans the whole domain, so a range probe before
    * optimize skips NOTHING — asserted), then
    * [[VersionedTable.optimize]] rewrites the snapshot range-sorted
    * on o_totalprice and the SAME probe through the automatic
    * [[VersionedTable.readIndexed]] path skips the out-of-range files
    * (asserted). The oracle is the plain price-band SQL: identical
    * rows before and after — optimize must change the layout and
    * nothing else.
    */
  def qOptimizeCluster(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "optim") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.repartition(8)) // unclustered
    val (kept0, total0) = VersionedTable.filesForRange(table, "price", 60000d, 140000d, None)
    require(kept0.size == total0,
      s"unclustered files all span the probe (kept ${kept0.size}/$total0)")
    val v = Some(VersionedTable.optimize(spark, table, Seq("price"), nFiles = 8))
    val (kept, total) = VersionedTable.filesForRange(table, "price", 60000d, 140000d, v)
    require(kept.size < total,
      s"optimize must make the price probe skip files (kept ${kept.size}/$total)")
    outBoundary(VersionedTable.readIndexed(spark, table, v)
      .filter(col("price").between(lit(BigDecimal(60000)), lit(BigDecimal(140000)))))
  }

  /** q_optimize_zorder: Z-ORDER layout — orders rewritten with bit-
    * interleaved quantile bins over (o_custkey, price), so range
    * probes on EACH dimension INDEPENDENTLY skip files (asserted for
    * both; a lexicographic (custkey, price) sort would leave every
    * price-only probe scanning all files — the trap Z-order exists
    * for, spec-pinned in LakehouseSpec). The returned frame is the
    * conjunctive rectangle through the automatic-skipping read path;
    * the oracle is the plain two-predicate SQL.
    */
  def qOptimizeZorder(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "zorder") { root =>
    val table = root + "/t"
    val all = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
    VersionedTable.overwrite(spark, table, all.repartition(4)) // unclustered
    val mx = all.agg(max("o_custkey")).head.getLong(0)
    val v = Some(VersionedTable.optimize(spark, table, Seq("o_custkey", "price"),
      nFiles = 16, zorder = true))
    val (keptC, totC) = VersionedTable.filesForRange(
      table, "o_custkey", 0d, (mx / 4).toDouble, v)
    require(keptC.size < totC,
      s"z-order must skip on the custkey dimension (kept ${keptC.size}/$totC)")
    val (keptP, totP) = VersionedTable.filesForRange(table, "price", 0d, 80000d, v)
    require(keptP.size < totP,
      s"z-order must skip on the price dimension (kept ${keptP.size}/$totP)")
    outBoundary(VersionedTable.readIndexed(spark, table, v)
      .filter(col("o_custkey") <= mx / 4 &&
        col("price") <= lit(BigDecimal(80000))))
  }

  /** Files a SQL statement's scan actually planned: forces the file-
    * source scan's partition planning (RDD construction — driver-side
    * listing through the FileIndex, NO job, no rows moved) and reads
    * the numFiles metric it records. -1 when the plan has no file
    * scan — callers require() a positive count, so a plan-shape drift
    * fails loudly instead of silently passing.
    */
  private def sqlPlannedFiles(df: DataFrame): Long = {
    val plan = df.queryExecution.executedPlan
    val resolved = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.getOrElse(plan)
    resolved.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.execute() // builds the scan RDD: FileIndex.listFiles runs here
        s.metrics("numFiles").value
    }.getOrElse(-1L)
  }

  /** q_sql_catalog: the SQL entry point ([[graft.sql.GraftCatalog]])
    * under the oracle gate — the same key-clustered three-commit
    * layout as [[qZoneMapRead]], reached ONLY through `spark.sql`
    * text: a head read with a range predicate (asserted, via the SQL
    * plan's own numFiles metric, to open FEWER files than the
    * snapshot holds — the zone maps prune through the catalog path)
    * unioned with a `VERSION AS OF` time-travel read that must
    * resolve the pre-append snapshot. The oracle replays both legs in
    * plain SQL over the source table.
    *
    * Scale shape: catalog resolution is O(manifest) driver metadata;
    * the planned scans are the audited zone-map read path — SQL adds
    * a name, not a plan.
    */
  def qSqlCatalog(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlcat") { root =>
    val table = root + "/sales/cust"
    val all = t(spark, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val mx = all.agg(max("c_custkey")).head.getLong(0) // one-row bound scalar
    val third = mx / 3
    val v1 = VersionedTable.overwrite(spark, table, all.filter(col("c_custkey") <= third))
    VersionedTable.append(spark, table,
      all.filter(col("c_custkey") > third && col("c_custkey") <= 2 * third))
    VersionedTable.append(spark, table, all.filter(col("c_custkey") > 2 * third))
    // catalog registration is plain session conf (root is re-read per
    // lookup, so a shared session repoints at this query's warehouse)
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    val head = spark.sql(
      s"""SELECT c_custkey, c_acctbal, 'head' AS src FROM graft.sales.cust
         |WHERE c_custkey > $third AND c_custkey <= ${2 * third}""".stripMargin)
    val total = VersionedTable.snapshotFiles(table).size
    val planned = sqlPlannedFiles(head)
    require(planned > 0 && planned < total,
      s"the SQL plan must prune on zone maps (planned $planned/$total files)")
    val pinned = spark.sql(
      s"""SELECT c_custkey, c_acctbal, 'v1' AS src
         |FROM graft.sales.cust VERSION AS OF $v1""".stripMargin)
    head.unionAll(pinned)
  }

  /** q_sql_dml: the SQL WRITE path (round 10, second half) under the
    * oracle gate — a full DML lifecycle in pure `spark.sql` text:
    * CTAS seeds the table (catalog createTable + the CTAS insert),
    * INSERT INTO appends the other half, DELETE FROM removes the
    * negative balances copy-on-write, ALTER TABLE RENAME COLUMN
    * re-labels the balance column metadata-only, and the final SELECT
    * reads back through the same zone-map-indexed catalog path, with
    * a VERSION AS OF leg pinning the PRE-delete snapshot (time travel
    * must see the deleted rows). Every statement is ONE commit
    * through the CAS'd log — asserted by counting versions — so SQL
    * writers interleave with Scala writers safely.
    *
    * The DuckDB oracle replays the lifecycle's NET effect over the
    * source table: surviving rows are those the delete kept (NULL
    * conditions keep their rows — SQL DELETE semantics), and the
    * pre-delete leg is the plain total.
    */
  def qSqlDml(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqldml", "vq_sqldml_customer") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "customer").createOrReplaceTempView("vq_sqldml_customer")
    // CTAS: even keys (create commit + the CTAS insert commit)
    spark.sql(
      """CREATE TABLE graft.dml.cust AS
        |SELECT c_custkey, c_acctbal, c_mktsegment FROM vq_sqldml_customer
        |WHERE c_custkey % 2 = 0""".stripMargin)
    // INSERT INTO: odd keys — the append commit
    spark.sql(
      """INSERT INTO graft.dml.cust
        |SELECT c_custkey, c_acctbal, c_mktsegment FROM vq_sqldml_customer
        |WHERE c_custkey % 2 = 1""".stripMargin)
    val table = root + "/dml/cust"
    val preDeleteV = VersionedTable.versions(table).last
    // DELETE FROM: negative balances, copy-on-write through the log
    spark.sql("DELETE FROM graft.dml.cust WHERE c_acctbal < 0")
    // UPDATE: a predicate mutation through the same zone-map COW split
    spark.sql(
      """UPDATE graft.dml.cust SET c_acctbal = c_acctbal + 100
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    // ALTER TABLE: metadata-only rename; the final read uses the new name
    spark.sql("ALTER TABLE graft.dml.cust RENAME COLUMN c_acctbal TO balance")
    val vs = VersionedTable.versions(table)
    require(vs.size == 6,
      s"create+ctas+insert+delete+update+rename must be six commits, got ${vs.size}")
    spark.sql(
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |       CAST(SUM(CAST(balance AS DECIMAL(18,4))) AS DOUBLE) AS bal
         |FROM graft.dml.cust GROUP BY c_mktsegment
         |UNION ALL
         |SELECT 'PRE_DELETE' AS c_mktsegment, COUNT(*) AS n,
         |       CAST(0 AS DOUBLE) AS bal
         |FROM graft.dml.cust VERSION AS OF $preDeleteV""".stripMargin)
  }

  /** q_sql_merge: the canonical-upsert MERGE in pure SQL text — the
    * one row-level statement whose DSv2 story Spark reserves for
    * SupportsRowLevelOperations connectors, here converted at
    * resolution into ONE merge commit with EXACT SQL semantics
    * (matched rows take the source values including nulls; see
    * [[graft.sql.GraftDml.convertMerge]]). Matched keys (every third
    * supplier) take doubled balances; unmatched synthetic keys
    * (+10⁶, every seventh) insert. The oracle composes the same
    * source union with the untouched target rows.
    */
  def qSqlMerge(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlmerge", "vq_sqlmerge_supplier") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlmerge_supplier")
    spark.sql(
      """CREATE TABLE graft.mrg.sup AS
        |SELECT s_suppkey, s_acctbal FROM vq_sqlmerge_supplier""".stripMargin)
    spark.sql(
      """MERGE INTO graft.mrg.sup t
        |USING (SELECT s_suppkey, s_acctbal * 2 AS s_acctbal
        |       FROM vq_sqlmerge_supplier WHERE s_suppkey % 3 = 0
        |       UNION ALL
        |       SELECT s_suppkey + 1000000 AS s_suppkey,
        |              CAST(42.0 AS DOUBLE) AS s_acctbal
        |       FROM vq_sqlmerge_supplier WHERE s_suppkey % 7 = 0) s
        |ON t.s_suppkey = s.s_suppkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val vs = VersionedTable.versions(root + "/mrg/sup")
    require(vs.size == 3,
      s"create+ctas+merge must be three commits, got ${vs.size}")
    spark.sql(
      """SELECT COUNT(*) AS n,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft.mrg.sup""".stripMargin)
  }

  /** q_sql_merge_by_source: the "sync a dimension" MERGE (round 13) —
    * all THREE clause families in one statement: matched keys
    * (s_suppkey % 3 = 0) take doubled balances, unmatched synthetic
    * keys (+10⁶, s_suppkey % 7 = 0) insert, and the target rows the
    * source no longer carries walk the BY SOURCE chain FIRST-MATCH-
    * WINS: negative balances DELETE, the rest re-flag s_acctbal + 1000.
    * A by-source mutation touches rows the source-key probe never
    * selects, so the scoped merge paths are BYPASSED (asserted
    * in-query: the commit's history op is the whole-snapshot "merge")
    * — the statement honestly costs O(table), the same cost any
    * snapshot store pays for it. The oracle composes the three row
    * fates in plain SQL.
    */
  def qSqlMergeBySource(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlmergebs", "vq_sqlmbs_supplier") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlmbs_supplier")
    spark.sql(
      """CREATE TABLE graft.mbs.sup AS
        |SELECT s_suppkey, s_acctbal FROM vq_sqlmbs_supplier""".stripMargin)
    spark.sql(
      """MERGE INTO graft.mbs.sup t
        |USING (SELECT s_suppkey, s_acctbal * 2 AS s_acctbal
        |       FROM vq_sqlmbs_supplier WHERE s_suppkey % 3 = 0
        |       UNION ALL
        |       SELECT s_suppkey + 1000000 AS s_suppkey,
        |              CAST(42.0 AS DOUBLE) AS s_acctbal
        |       FROM vq_sqlmbs_supplier WHERE s_suppkey % 7 = 0) s
        |ON t.s_suppkey = s.s_suppkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.s_acctbal < 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
        |  s_acctbal = t.s_acctbal + 1000""".stripMargin)
    val table = root + "/mbs/sup"
    require(VersionedTable.versions(table).size == 3,
      "create+ctas+merge must be three commits")
    val lastOp = VersionedTable.history(spark, table).collect().last.getString(1)
    require(lastOp == "merge",
      s"a BY SOURCE MERGE must bypass the scoped paths (got $lastOp): the " +
        "key probe never selects the files its by-source clauses mutate")
    spark.sql(
      """SELECT s_suppkey % 5 AS grp, COUNT(*) AS n,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft.mbs.sup GROUP BY s_suppkey % 5""".stripMargin)
  }

  /** q_sql_partitioned: the whole PARTITIONED lifecycle in pure SQL
    * text (round 10 second half) — `CREATE TABLE … PARTITIONED BY
    * (o_orderpriority)` creates the value-directory layout (zero-file
    * version 0), INSERT routes rows into value directories, and a
    * MERGE whose ON keys include the partition column takes the
    * SCOPED path ([[graft.sources.VersionedTableOps.mergeKeyed]]):
    * only the '1-URGENT' partition is read, joined and rewritten —
    * asserted in-query by the last commit being replace_partitions
    * AND by path-identity of an untouched partition's files (the COW
    * assert). The oracle replays the final state: non-urgent rows
    * unchanged, urgent rows doubled, synthetic urgent keys inserted.
    */
  def qSqlPartitioned(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlpart", "vq_sqlpart_orders") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "orders").createOrReplaceTempView("vq_sqlpart_orders")
    spark.sql(
      """CREATE TABLE graft.pt.ord (
        |  o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
        |PARTITIONED BY (o_orderpriority)""".stripMargin)
    spark.sql(
      """INSERT INTO graft.pt.ord
        |SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |       o_orderpriority
        |FROM vq_sqlpart_orders""".stripMargin)
    val table = root + "/pt/ord"
    val (lowBefore, total) =
      VersionedTable.filesForPartition(table, "o_orderpriority", "5-LOW")
    require(lowBefore.nonEmpty && lowBefore.size < total,
      "INSERT must route rows into value directories")
    spark.sql(
      """MERGE INTO graft.pt.ord t
        |USING (SELECT o_orderkey,
        |              CAST(o_totalprice AS DOUBLE) * 2 AS o_totalprice,
        |              o_orderpriority
        |       FROM vq_sqlpart_orders WHERE o_orderpriority = '1-URGENT'
        |       UNION ALL
        |       SELECT o_orderkey + 10000000 AS o_orderkey,
        |              CAST(42.0 AS DOUBLE) AS o_totalprice,
        |              '1-URGENT' AS o_orderpriority
        |       FROM vq_sqlpart_orders
        |       WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0) s
        |ON t.o_orderkey = s.o_orderkey
        |   AND t.o_orderpriority = s.o_orderpriority
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val hist = VersionedTable.history(spark, table).collect()
    require(hist.last.getString(1) == "replace_partitions",
      s"a partition-keyed MERGE must take the scoped path, " +
        s"got ${hist.last.getString(1)}")
    require(VersionedTable.filesForPartition(
        table, "o_orderpriority", "5-LOW")._1 == lowBefore,
      "untouched partitions must carry by file reference across the MERGE")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft.pt.ord GROUP BY o_orderpriority""".stripMargin)
  }

  /** q_sql_mat_view: the materialized-view lifecycle in pure SQL text
    * (round 11) — CREATE MATERIALIZED VIEW persists the definition
    * beside the view's commit log and folds the first snapshot; the
    * refresh_view procedure replays as a no-op on the fresh view; an
    * INSERT delta scoped to ONE nation refreshes incrementally
    * through REFRESH MATERIALIZED VIEW with the bucketed state
    * default (untouched buckets carry by file identity — required
    * in-query, the O(touched)-write property). The oracle recomputes
    * the aggregate from scratch over base ∪ delta: SQL-driven
    * incremental maintenance must be indistinguishable from a full
    * recompute.
    */
  def qSqlMatView(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlmv", "vq_sqlmv_supplier") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlmv_supplier")
    spark.sql(
      """CREATE TABLE graft.mv.sup AS
        |SELECT s_suppkey, s_nationkey,
        |       CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal
        |FROM vq_sqlmv_supplier""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mv.v BUCKETS 16 AS
        |SELECT s_nationkey, COUNT(*) AS mv_count,
        |       SUM(s_acctbal) AS mv_sum_s_acctbal
        |FROM graft.mv.sup GROUP BY s_nationkey""".stripMargin)
    val view = root + "/mv/v"
    val vAfterCreate = VersionedTable.versions(view).last
    spark.sql("CALL graft.system.refresh_view('mv.v')")
    require(VersionedTable.versions(view).last == vAfterCreate,
      "refresh of a fresh view must be a no-op")
    spark.sql(
      """INSERT INTO graft.mv.sup
        |SELECT s_suppkey + 1000000 AS s_suppkey, s_nationkey,
        |       CAST(s_acctbal * 2 AS DECIMAL(12,2)) AS s_acctbal
        |FROM vq_sqlmv_supplier
        |WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM vq_sqlmv_supplier)""".stripMargin)
    val before = VersionedTable.snapshotFiles(view).toSet
    spark.sql("REFRESH MATERIALIZED VIEW graft.mv.v")
    val after = VersionedTable.snapshotFiles(view).toSet
    require((before & after).nonEmpty,
      "untouched buckets must carry by file reference across a narrow refresh")
    spark.sql(
      """SELECT s_nationkey, mv_count,
        |       CAST(mv_sum_s_acctbal AS DOUBLE) AS total
        |FROM graft.mv.v""".stripMargin)
  }

  /** q_sql_mat_view_shapes: the round-12 materialized-view SHAPES in
    * pure SQL text — an AVG view (count+sum state, avg DERIVED at
    * read, internal state columns hidden), a MIN/MAX view
    * (semilattice state), and a two-table JOIN view (the delta-join
    * decomposition) — all three created over one supplier table,
    * refreshed INCREMENTALLY through one narrow INSERT delta, and
    * read back as one (grp, metric, val) union. The oracle recomputes
    * every metric from scratch over base ∪ delta: incremental
    * maintenance of all three state flavors must be indistinguishable
    * from a full recompute.
    */
  def qSqlMatViewShapes(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlmvs", "vq_sqlmvs_supplier", "vq_sqlmvs_nation",
        "vq_sqlmvs_region") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlmvs_supplier")
    t(spark, dir, "nation").createOrReplaceTempView("vq_sqlmvs_nation")
    spark.sql(
      """CREATE TABLE graft.mvs.sup AS
        |SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal
        |FROM vq_sqlmvs_supplier""".stripMargin)
    spark.sql(
      """CREATE TABLE graft.mvs.nat AS
        |SELECT CAST(n_nationkey AS BIGINT) AS s_nationkey,
        |       CAST(n_regionkey AS BIGINT) AS n_regionkey
        |FROM vq_sqlmvs_nation""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.va BUCKETS 8 AS
        |SELECT s_nationkey, COUNT(*) AS mv_count,
        |       AVG(s_acctbal) AS mv_avg_s_acctbal
        |FROM graft.mvs.sup GROUP BY s_nationkey""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.vx BUCKETS 8 AS
        |SELECT s_nationkey, COUNT(*) AS mv_count,
        |       MIN(s_acctbal) AS mv_min_s_acctbal,
        |       MAX(s_acctbal) AS mv_max_s_acctbal
        |FROM graft.mvs.sup GROUP BY s_nationkey""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.vv BUCKETS 8 AS
        |SELECT s_nationkey, COUNT(*) AS mv_count,
        |       VAR_POP(s_acctbal) AS mv_var_s_acctbal,
        |       STDDEV_POP(s_acctbal) AS mv_std_s_acctbal
        |FROM graft.mvs.sup GROUP BY s_nationkey""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.vj BUCKETS 4 AS
        |SELECT n_regionkey, COUNT(*) AS mv_count,
        |       SUM(s_acctbal) AS mv_sum_s_acctbal,
        |       AVG(s_acctbal) AS mv_avg_s_acctbal
        |FROM graft.mvs.sup JOIN graft.mvs.nat USING (s_nationkey)
        |GROUP BY n_regionkey""".stripMargin)
    // round 13: the 3-TABLE CHAIN view in pure SQL text (the parser
    // accepted two tables while refreshJoinChain maintained N) and a
    // SUM over an EXPRESSION (maintained through the derive hook
    // under the alias's suffix — zero new state machinery)
    t(spark, dir, "region").createOrReplaceTempView("vq_sqlmvs_region")
    spark.sql(
      """CREATE TABLE graft.mvs.reg AS
        |SELECT CAST(r_regionkey AS BIGINT) AS n_regionkey, r_name
        |FROM vq_sqlmvs_region""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.vc BUCKETS 4 AS
        |SELECT r_name, COUNT(*) AS mv_count,
        |       SUM(s_acctbal) AS mv_sum_s_acctbal
        |FROM graft.mvs.sup JOIN graft.mvs.nat USING (s_nationkey)
        |                   JOIN graft.mvs.reg USING (n_regionkey)
        |GROUP BY r_name""".stripMargin)
    spark.sql(
      """CREATE MATERIALIZED VIEW graft.mvs.ve BUCKETS 8 AS
        |SELECT s_nationkey, COUNT(*) AS mv_count,
        |       SUM(s_acctbal * 2 + 1) AS mv_sum_dbl
        |FROM graft.mvs.sup GROUP BY s_nationkey""".stripMargin)
    spark.sql(
      """INSERT INTO graft.mvs.sup
        |SELECT s_suppkey + 1000000 AS s_suppkey,
        |       CAST(s_nationkey AS BIGINT) AS s_nationkey,
        |       CAST(s_acctbal * 2 AS DECIMAL(12,2)) AS s_acctbal
        |FROM vq_sqlmvs_supplier
        |WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM vq_sqlmvs_supplier)""".stripMargin)
    Seq("va", "vx", "vv", "vj", "vc", "ve").foreach(v =>
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.mvs.$v"))
    val out = spark.sql(
      """SELECT s_nationkey AS grp, 'avg' AS metric, mv_avg_s_acctbal AS val
        |FROM graft.mvs.va
        |UNION ALL
        |SELECT s_nationkey, 'min', CAST(mv_min_s_acctbal AS DOUBLE)
        |FROM graft.mvs.vx
        |UNION ALL
        |SELECT s_nationkey, 'max', CAST(mv_max_s_acctbal AS DOUBLE)
        |FROM graft.mvs.vx
        |UNION ALL
        |SELECT n_regionkey, 'region_sum', CAST(mv_sum_s_acctbal AS DOUBLE)
        |FROM graft.mvs.vj
        |UNION ALL
        |SELECT n_regionkey, 'region_avg', mv_avg_s_acctbal
        |FROM graft.mvs.vj
        |UNION ALL
        |SELECT s_nationkey, 'var', mv_var_s_acctbal
        |FROM graft.mvs.vv
        |UNION ALL
        |SELECT s_nationkey, 'std', mv_std_s_acctbal
        |FROM graft.mvs.vv
        |UNION ALL
        |SELECT CAST(NULL AS BIGINT), CONCAT('chain_', r_name),
        |       CAST(mv_sum_s_acctbal AS DOUBLE)
        |FROM graft.mvs.vc
        |UNION ALL
        |SELECT s_nationkey, 'dblsum', CAST(mv_sum_dbl AS DOUBLE)
        |FROM graft.mvs.ve""".stripMargin)
    out
  }

  /** q_sql_merge_clauses: the FULL MERGE clause grammar under the
    * oracle gate (round 13) — conditional matched clauses evaluated
    * first-match-wins (an UPDATE whose value reads BOTH sides, then a
    * catch-all MATCHED DELETE), a conditional PARTIAL INSERT
    * (unassigned column lands typed NULL), and both BY SOURCE forms,
    * all in ONE statement. Matched keys (s_suppkey % 3 = 0): doubled
    * balance > 5000 re-prices to t + s (3× the original), the rest
    * DELETE; synthetic unmatched keys (+10⁶, % 7 = 0) insert key-only
    * when even; source-missing rows delete when negative and re-flag
    * +1000 otherwise. The oracle composes the five row fates in plain
    * SQL; COUNT(bal) pins the NULL-filled inserts.
    */
  def qSqlMergeClauses(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlmergecl", "vq_sqlmcl_supplier") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlmcl_supplier")
    spark.sql(
      """CREATE TABLE graft.mcl.sup AS
        |SELECT s_suppkey, s_acctbal FROM vq_sqlmcl_supplier""".stripMargin)
    spark.sql(
      """MERGE INTO graft.mcl.sup t
        |USING (SELECT s_suppkey, s_acctbal * 2 AS s_acctbal
        |       FROM vq_sqlmcl_supplier WHERE s_suppkey % 3 = 0
        |       UNION ALL
        |       SELECT s_suppkey + 1000000 AS s_suppkey,
        |              CAST(42.0 AS DOUBLE) AS s_acctbal
        |       FROM vq_sqlmcl_supplier WHERE s_suppkey % 7 = 0) s
        |ON t.s_suppkey = s.s_suppkey
        |WHEN MATCHED AND s.s_acctbal > 5000 THEN UPDATE SET
        |  s_acctbal = t.s_acctbal + s.s_acctbal
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.s_suppkey % 2 = 0 THEN INSERT
        |  (s_suppkey) VALUES (s.s_suppkey)
        |WHEN NOT MATCHED BY SOURCE AND t.s_acctbal < 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
        |  s_acctbal = t.s_acctbal + 1000""".stripMargin)
    spark.sql(
      """SELECT s_suppkey % 5 AS grp, COUNT(*) AS n, COUNT(s_acctbal) AS n_bal,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft.mcl.sup GROUP BY s_suppkey % 5""".stripMargin)
  }

  /** q_sql_history: DESCRIBE HISTORY under the oracle gate (round 13)
    * — a deterministic five-statement lifecycle (CREATE AS, INSERT,
    * DELETE, UPDATE, RENAME COLUMN) read back as the commit log's
    * (version, op) sequence through the new `DESC HISTORY` statement.
    * Timestamps and file counts are stripped (host- and
    * parallelism-dependent); what remains — one commit per statement,
    * in order, under the op names every other surface (CALL history,
    * the scoped-path asserts) keys on — is exactly the protocol
    * contract, and the oracle pins it as a literal. Metadata-only:
    * the statement reads manifests, never data files.
    */
  def qSqlHistory(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlhist", "vq_sqlhist_supplier") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "supplier").createOrReplaceTempView("vq_sqlhist_supplier")
    spark.sql(
      """CREATE TABLE graft.h.sup AS
        |SELECT s_suppkey, s_acctbal FROM vq_sqlhist_supplier
        |WHERE s_suppkey % 2 = 0""".stripMargin)
    spark.sql(
      """INSERT INTO graft.h.sup
        |SELECT s_suppkey, s_acctbal FROM vq_sqlhist_supplier
        |WHERE s_suppkey % 2 = 1""".stripMargin)
    spark.sql("DELETE FROM graft.h.sup WHERE s_acctbal < 0")
    spark.sql("UPDATE graft.h.sup SET s_acctbal = s_acctbal + 10 WHERE s_suppkey % 5 = 0")
    spark.sql("ALTER TABLE graft.h.sup RENAME COLUMN s_acctbal TO bal")
    spark.sql("DESC HISTORY graft.h.sup").select(col("version"), col("op"))
  }

  /** q_sql_call: SQL maintenance via the DSv2 ProcedureCatalog under
    * the oracle gate — a three-commit CTAS+INSERT build, then
    * `CALL graft.system.compact` (asserted: one file), `CALL
    * graft.system.history` (asserted: the five commits), and `CALL
    * graft.system.vacuum(retain=1)` (asserted: four versions
    * dropped), with the final read REQUIRED to serve the same rows —
    * maintenance must be invisible to the data, and the oracle (which
    * never sees any of it) is exactly that invisibility check.
    */
  def qSqlCall(spark: SparkSession, dir: String): DataFrame =
      withRoot(spark, "sqlcall", "vq_sqlcall_orders") { root =>
    spark.conf.set("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", root)
    t(spark, dir, "orders").createOrReplaceTempView("vq_sqlcall_orders")
    spark.sql(
      """CREATE TABLE graft.mnt.ord AS
        |SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM vq_sqlcall_orders WHERE o_orderkey % 3 = 0""".stripMargin)
    for (rem <- Seq(1, 2)) spark.sql(
      s"""INSERT INTO graft.mnt.ord
         |SELECT o_orderkey, o_totalprice, o_orderpriority
         |FROM vq_sqlcall_orders WHERE o_orderkey % 3 = $rem""".stripMargin)
    val table = root + "/mnt/ord"
    val filesBefore = VersionedTable.snapshotFiles(table).size
    val v = spark.sql("CALL graft.system.compact('mnt.ord', 1)").head.getLong(0)
    require(filesBefore > 1 && VersionedTable.snapshotFiles(table).size == 1,
      s"compact must fold $filesBefore files into one")
    val hist = spark.sql("CALL graft.system.history('mnt.ord')").collect()
    require(hist.length == 5 && hist.last.getLong(0) == v,
      s"history must list the five commits, got ${hist.length}")
    val dropped = spark.sql("CALL graft.system.vacuum('mnt.ord', 1, 0)")
      .head.getInt(1)
    require(dropped == 4, s"vacuum(retain=1) must drop 4 versions, got $dropped")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM graft.mnt.ord GROUP BY o_orderpriority""".stripMargin)
  }
}
