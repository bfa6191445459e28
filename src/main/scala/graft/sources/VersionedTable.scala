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
    * a manifest referencing it lands.
    */
  private def stageData(table: String, df: DataFrame, tag: String): Seq[String] = {
    val rel = s"data/$tag-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(Paths.get(table, rel).toString)
    ls(Paths.get(table, rel))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => s"$rel/${p.getFileName}")
      .sorted
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
    val files = manifestFiles(table, v).map(f => Paths.get(table, f).toString)
    spark.read.parquet(files: _*)
  }
}
