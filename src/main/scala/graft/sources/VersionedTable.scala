package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  *    visible with a single filesystem rename (ATOMIC_MOVE). Readers
  *    resolve the latest `v*.json` — they see the table before the
  *    rename or after it, never a mix of two versions' files. A crash
  *    before the rename leaves only an invisible tmp file and orphan
  *    data (garbage, not corruption): the previous snapshot stays
  *    fully readable.
  *  - SNAPSHOT ISOLATION: data dirs are immutable and never deleted
  *    by commits — compaction and upsert write NEW files and publish
  *    a NEW manifest, so a reader that resolved version N keeps a
  *    consistent file set no matter what commits (or compactions)
  *    land meanwhile.
  *  - TIME TRAVEL: `read(path, Some(v))` pins any retained version —
  *    the manifest IS the version.
  *  - OPTIMISTIC CONCURRENCY: the rename fails if the target version
  *    exists (two writers raced); the loser re-reads the log and
  *    retries against the new head. No locks.
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

  /** Publish `files` as the next version via atomic rename; retries
    * on version collision (optimistic concurrency).
    */
  private def commit(table: String, op: String, files: Seq[String]): Long = {
    val dir = commitsDir(table)
    Files.createDirectories(dir)
    var attempt = 0
    while (true) {
      val v = versions(table).lastOption.getOrElse(0L) + 1
      val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, render(v, op, files))
      try {
        Files.move(tmp, dir.resolve(f"v$v%08d.json"), StandardCopyOption.ATOMIC_MOVE)
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

  /** Create (version 1) or fully overwrite the table with `df`. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame): Long =
    commit(table, "overwrite", stageData(table, df, "w"))

  /** Append `df` as a new version (old files + new files). */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val base = versions(table).last
    commit(table, "append", manifestFiles(table, base) ++ stageData(table, df, "a"))
  }

  /** MERGE upsert keyed by `key` (the q_upsert shape, now with a
    * commit): current snapshot full-outer-joined with `updates`,
    * updates win, inserts land; the merged result is written as new
    * files and published as one atomic commit.
    */
  def upsert(spark: SparkSession, table: String, updates: DataFrame,
      key: String): Long = {
    val cur = read(spark, table)
    val cols = cur.columns
    val merged = cur.as("t").join(updates.as("u"), Seq(key), "full_outer")
      .select(cols.map(c =>
        if (c == key) col(key)
        else coalesce(col(s"u.$c"), col(s"t.$c")).as(c)): _*)
    commit(table, "upsert", stageData(table, merged, "u"))
  }

  /** Rewrite the current snapshot as `nFiles` even files and publish
    * it as a new version. The OLD version's files are untouched — a
    * concurrent reader pinned to it is unaffected, and time travel to
    * it still works (this is the compaction-vs-reader race
    * compactParquet's dir swap could not close).
    */
  def compact(spark: SparkSession, table: String, nFiles: Int = 1): Long =
    commit(table, "compact", stageData(table, read(spark, table).repartition(nFiles), "c"))

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
