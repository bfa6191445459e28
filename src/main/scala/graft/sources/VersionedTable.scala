package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned table layer — the commit-log core of a lakehouse
  * format (Delta/Iceberg's essential mechanism, built offline), added
  * because round 4's upsert / CDC-apply / compaction each rewrote or
  * swapped parquet directories independently with no snapshot
  * isolation between them.
  *
  * Layout:
  * {{{
  *   table/
  *     _commits/v00000001.json     one manifest per committed version
  *     _commits/.tmp-<uuid>        in-flight manifests (invisible)
  *     data/c1-<uuid>/ ... parquet immutable data dirs, one per commit
  * }}}
  *
  * The protocol and the three guarantees the specs pin:
  *  - ATOMIC COMMIT: a manifest is staged as `.tmp-*` and made
  *    visible with a single hard-link creation (Files.createLink —
  *    link(2)). Readers resolve the latest `v*.json` — they see the
  *    table before the link or after it, never a mix of two versions'
  *    files. A crash before the link leaves only an invisible tmp
  *    file and orphan data (garbage, not corruption): the previous
  *    snapshot stays fully readable. link(2) — NOT rename: on Linux
  *    rename(2) atomically REPLACES an existing target, so a
  *    Files.move(ATOMIC_MOVE) publish would let two racing writers
  *    both "succeed" with the second silently clobbering the first's
  *    manifest; link(2) fails with EEXIST, a true fail-if-exists
  *    publication primitive.
  *  - SNAPSHOT ISOLATION: data dirs are immutable and never deleted
  *    by commits — compaction and upsert write NEW files and publish
  *    a NEW manifest, so a reader that resolved version N keeps a
  *    consistent file set no matter what commits (or compactions)
  *    land meanwhile.
  *  - TIME TRAVEL: `read(path, Some(v))` pins any retained version —
  *    the manifest IS the version.
  *  - OPTIMISTIC CONCURRENCY: the link fails if the target version
  *    exists (two writers raced); the loser re-reads the log and
  *    REBUILDS ITS FILE LIST against the new head (commit takes a
  *    base-version → files closure, so a retried append re-includes
  *    the concurrent append's files instead of republishing a stale
  *    list) before retrying. No locks.
  *
  * Scale notes: the manifest lists files, so the driver-side work is
  * O(files-per-snapshot) — the same planner cost any parquet read
  * pays; data-path operations (upsert's merge, compaction's rewrite)
  * are ordinary distributed Spark jobs over the snapshot. A real
  * multi-writer deployment would put the rename on a
  * rename-atomic store or a log service; the PROTOCOL is unchanged.
  */
object VersionedTable {

  private def commitsDir(table: String): Path = Paths.get(table, "_commits")

  private def ls(p: Path): Seq[Path] =
    if (!Files.exists(p)) Nil
    else Using.resource(Files.list(p))(_.iterator().asScala.toSeq)

  /** Committed versions, ascending. */
  def versions(table: String): Seq[Long] =
    ls(commitsDir(table))
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted

  /** Relative data files of a version (manifest body). */
  private[sources] def manifestFiles(table: String, v: Long): Seq[String] = {
    val txt = Files.readString(commitsDir(table).resolve(f"v$v%08d.json"))
    // manifest is written by `render` below: one quoted relative path
    // per array element, paths contain no quotes or escapes
    "\"([^\"]+\\.parquet)\"".r.findAllMatchIn(txt).map(_.group(1)).toSeq
  }

  private def render(v: Long, op: String, files: Seq[String]): String =
    files.map(f => "    \"" + f + "\"").mkString(
      s"""{\n  "version": $v,\n  "op": "$op",\n  "files": [\n""",
      ",\n",
      "\n  ]\n}\n")

  /** Stage a new data dir for the NEXT commit; returns the relative
    * parquet paths it produced. The dir is invisible to readers until
    * a manifest referencing it lands. Alongside the parquet files the
    * stage writes `_stats.json` — per-FILE min/max for every
    * top-level numeric column (one extra Spark job over the
    * just-written files, grouped by input_file_name) — the zone-map
    * layer [[readRange]]'s file skipping reads. Bounds are widened
    * one ULP at write time so a long/decimal that rounded on the
    * double conversion can never shrink the interval and wrongly
    * skip a file holding boundary rows.
    */
  private def stageData(table: String, df: DataFrame, tag: String): Seq[String] = {
    val rel = s"data/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
    val dir = Paths.get(table, rel)
    df.write.parquet(dir.toString)
    writeFileStats(df.sparkSession, dir)
    ls(dir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => s"$rel/${p.getFileName}")
      .sorted
  }

  private def numericCols(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.types._
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
  }

  private def writeFileStats(spark: SparkSession, dir: Path): Unit = {
    val written = spark.read.parquet(dir.toString)
    val cols = numericCols(written)
    if (cols.isEmpty) return
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"min_$c"),
      max(col(c).cast("double")).as(s"max_$c")))
    val rows = written
      .groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per staged file — bounded by the commit's file count
    val body = rows.map { r =>
      val fname = r.getString(0).split('/').last
      val entries = cols.flatMap { c =>
        val mi = r.getAs[Any](s"min_$c")
        val ma = r.getAs[Any](s"max_$c")
        if (mi == null || ma == null) None
        else Some("\"" + c + "\": [" +
          math.nextDown(mi.asInstanceOf[Double]) + ", " +
          math.nextUp(ma.asInstanceOf[Double]) + "]")
      }
      "  \"" + fname + "\": {" + entries.mkString(", ") + "}"
    }.mkString("{\n", ",\n", "\n}\n")
    Files.writeString(dir.resolve("_stats.json"), body)
  }

  /** Per-file [min, max] of `statsCol` for one data dir, parsed from
    * its `_stats.json`; empty (skip nothing) for dirs staged before
    * stats existed or columns without stats.
    */
  private def dirStats(table: String, relDir: String, statsCol: String): Map[String, (Double, Double)] = {
    val p = Paths.get(table, relDir, "_stats.json")
    if (!Files.exists(p)) return Map.empty
    val txt = Files.readString(p)
    val fileRe = "\"([^\"]+\\.parquet)\": \\{([^}]*)\\}".r
    val colRe = ("\"" + java.util.regex.Pattern.quote(statsCol) +
      "\": \\[([-0-9.eE]+), ([-0-9.eE]+)\\]").r
    fileRe.findAllMatchIn(txt).flatMap { m =>
      colRe.findFirstMatchIn(m.group(2))
        .map(c => m.group(1) -> (c.group(1).toDouble, c.group(2).toDouble))
    }.toMap
  }

  /** Publish the next version via fail-if-exists hard link; retries on
    * version collision (optimistic concurrency). `filesFor` receives
    * the CURRENT head version (0 for an empty table) and must return
    * the complete file list for head+1 — it is re-invoked on every
    * retry so a race loser rebuilds its list against the new head
    * instead of republishing a stale one. Data staged by a losing
    * attempt becomes unreferenced garbage, never corruption.
    */
  private def commit(table: String, op: String, filesFor: Long => Seq[String]): Long = {
    val dir = commitsDir(table)
    Files.createDirectories(dir)
    var attempt = 0
    while (true) {
      val base = versions(table).lastOption.getOrElse(0L)
      val v = base + 1
      val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, render(v, op, filesFor(base)))
      try {
        // link(2): fails with FileAlreadyExistsException if v landed
        // meanwhile — unlike rename(2), which silently replaces
        Files.createLink(dir.resolve(f"v$v%08d.json"), tmp)
        Files.deleteIfExists(tmp)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race: re-read head, retry
          attempt += 1
          require(attempt < 100, s"commit contention on $table")
      }
    }
    -1 // unreachable
  }

  private def requireInit(table: String, base: Long, op: String): Unit =
    require(base > 0, s"$op on uninitialized table $table (no commits)")

  /** Create (version 1) or fully overwrite the table with `df`. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Long = {
    val staged = stageData(table, df, "w") // stage once; retries reuse it
    commit(table, "overwrite", _ => staged)
  }

  /** Append `df` as a new version (old files + new files). The new
    * data is staged once; the OLD-file prefix is rebuilt from the head
    * manifest inside the commit closure, so a retry after a concurrent
    * commit carries that commit's files forward.
    */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val staged = stageData(table, df, "a")
    commit(table, "append", { base =>
      requireInit(table, base, "append")
      manifestFiles(table, base) ++ staged
    })
  }

  /** MERGE upsert keyed by `key` (the q_upsert shape, now with a
    * commit): current snapshot full-outer-joined with `updates`,
    * updates win, inserts land; the merged result is written as new
    * files and published as one atomic commit. The merge runs INSIDE
    * the commit closure against the closure's base version, so a race
    * loser re-merges against the new head rather than committing a
    * merge of a stale snapshot.
    */
  def upsert(spark: SparkSession, table: String, updates: DataFrame,
      key: String): Long =
    commit(table, "upsert", { base =>
      requireInit(table, base, "upsert")
      val cur = read(spark, table, Some(base))
      val cols = cur.columns
      val merged = cur.as("t").join(updates.as("u"), Seq(key), "full_outer")
        .select(cols.map(c =>
          if (c == key) col(key)
          else coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)
      stageData(table, merged, "u")
    })

  /** Rewrite the current snapshot as `nFiles` even files and publish
    * it as a new version. The OLD version's files are untouched — a
    * concurrent reader pinned to it is unaffected, and time travel to
    * it still works (this is the compaction-vs-reader race
    * compactParquet's dir swap could not close). Rewrites the
    * closure's base snapshot, so a retry compacts the new head.
    */
  def compact(spark: SparkSession, table: String, nFiles: Int = 1): Long =
    commit(table, "compact", { base =>
      requireInit(table, base, "compact")
      stageData(table, read(spark, table, Some(base)).repartition(nFiles), "c")
    })

  /** Read the latest (or a pinned) version. The file list is resolved
    * HERE, once — the returned frame is a stable snapshot.
    */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse {
      val vs = versions(table)
      require(vs.nonEmpty, s"no commits at $table")
      vs.last
    }
    require(Files.exists(commitsDir(table).resolve(f"v$v%08d.json")),
      s"version $v of $table was vacuumed or never existed")
    val files = manifestFiles(table, v).map(f => Paths.get(table, f).toString)
    spark.read.parquet(files: _*)
  }

  /** Manifest files of a version whose `_stats.json` zone maps can
    * still hold a row with `statsCol` in [lo, hi] — files without
    * stats are conservatively KEPT. Exposed so specs (and operators)
    * can assert how many files a range probe actually opens.
    */
  def filesForRange(table: String, statsCol: String, lo: Double, hi: Double,
      version: Option[Long] = None): (Seq[String], Int) = {
    val v = version.getOrElse(versions(table).last)
    val all = manifestFiles(table, v)
    val statsByDir = all.map(_.split('/').dropRight(1).mkString("/"))
      .distinct.map(d => d -> dirStats(table, d, statsCol)).toMap
    val kept = all.filter { f =>
      val (d, name) = (f.split('/').dropRight(1).mkString("/"), f.split('/').last)
      statsByDir(d).get(name) match {
        case Some((mi, ma)) => ma >= lo && mi <= hi
        case None => true // no stats — never skip blind
      }
    }
    (kept, all.size)
  }

  /** Range read with manifest-level file skipping — the zone-map scan
    * a lakehouse OPTIMIZE layout serves: only files whose committed
    * [min, max] for `statsCol` intersects [lo, hi] are opened (plus
    * the exact predicate on the survivors, so skipping is purely an
    * IO optimization, never a semantics change). On a sorted or
    * clustered table this turns a selective range probe from
    * O(snapshot files) into O(matching files) — the driver-side cost
    * is one manifest + one `_stats.json` per data dir, no Spark job.
    */
  def readRange(spark: SparkSession, table: String, statsCol: String,
      lo: Double, hi: Double, version: Option[Long] = None): DataFrame = {
    val (kept, _) = filesForRange(table, statsCol, lo, hi, version)
    val schemaSrc = read(spark, table, version) // schema even when kept is empty
    if (kept.isEmpty) schemaSrc.limit(0)
    else spark.read.parquet(kept.map(f => Paths.get(table, f).toString): _*)
      .filter(col(statsCol).cast("double").between(lo, hi))
  }

  /** General MERGE commit: publishes `mergeFn(snapshot, updates)` as
    * the next version. The merge runs inside the commit closure
    * against the closure's base, so a race loser re-merges against
    * the new head (same contract as [[upsert]], which is
    * `merge(coalesce-rule)`). The CDC streaming sink commits each
    * micro-batch through this.
    */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      mergeFn: (DataFrame, DataFrame) => DataFrame): Long =
    commit(table, "merge", { base =>
      requireInit(table, base, "merge")
      stageData(table, mergeFn(read(spark, table, Some(base)), updates), "m")
    })

  case class VacuumReport(keptVersions: Seq[Long], droppedVersions: Seq[Long],
      deletedDirs: Int, deletedBytes: Long)

  /** Retention vacuum: drops every version except the newest `retain`
    * and deletes data dirs no retained manifest references — the
    * storage-reclaim half of the commit-log contract (Delta VACUUM).
    * Time travel to a dropped version fails with a clear error
    * afterwards; pinned READERS of dropped versions are broken by
    * definition — vacuum is the one operation that trades snapshot
    * isolation for space, which is why retention is explicit.
    *
    * Concurrent-writer safety: a dir staged by an IN-FLIGHT commit is
    * not yet referenced by any manifest, so reference-counting alone
    * would delete it; dirs newer than the newest retained manifest
    * are therefore always preserved (an abandoned stage is collected
    * by a LATER vacuum, once commits have moved past it).
    */
  def vacuum(table: String, retain: Int = 2): VacuumReport = {
    require(retain >= 1, "retain at least the head version")
    val vs = versions(table)
    val (dropped, kept) = vs.splitAt(math.max(0, vs.size - retain))
    val referenced = kept.flatMap(manifestFiles(table, _))
      .map(_.split('/').dropRight(1).mkString("/")).toSet
    val headManifestTime =
      if (kept.isEmpty) Long.MaxValue
      else Files.getLastModifiedTime(
        commitsDir(table).resolve(f"v${kept.last}%08d.json")).toMillis
    var dirs = 0
    var bytes = 0L
    for (d <- ls(Paths.get(table, "data")) if Files.isDirectory(d)) {
      val rel = s"data/${d.getFileName}"
      val inFlight = Files.getLastModifiedTime(d).toMillis >= headManifestTime
      if (!referenced.contains(rel) && !inFlight) {
        for (f <- ls(d)) { bytes += Files.size(f); Files.delete(f) }
        Files.delete(d)
        dirs += 1
      }
    }
    dropped.foreach(v => Files.deleteIfExists(commitsDir(table).resolve(f"v$v%08d.json")))
    VacuumReport(kept, dropped, dirs, bytes)
  }
}
