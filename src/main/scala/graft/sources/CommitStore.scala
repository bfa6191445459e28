package graft.sources

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import scala.util.Using

/** The manifest-publication seam of [[VersionedTable]]'s commit
  * protocol (round-6 verdict item 1): everything the protocol needs
  * from the log's backing store, and NOTHING else — so the same
  * OCC/race/crash battery can run against a local-filesystem
  * implementation and an object-store-semantics implementation.
  *
  * The one primitive that carries the protocol's atomicity is
  * [[putIfAbsent]]: a FAIL-IF-EXISTS publication. Two writers racing
  * to the same version name must see exactly one `true`; the loser
  * re-reads the head and retries against it. Data files never go
  * through this seam — they are immutable parquet written before the
  * publish, referenced only by manifests — so the store holds tiny
  * JSON documents and the put is O(manifest), never O(data).
  *
  * Implementations:
  *  - [[LocalLinkCommitStore]]: stage to a `.tmp-*` sibling, publish
  *    with `Files.createLink` — link(2) fails with EEXIST, a true
  *    fail-if-exists primitive (rename(2) would silently REPLACE).
  *    This is the single-node / NFS / HDFS-like deployment.
  *  - [[InMemoryCommitStore]]: a conditional PUT keyed `If-None-Match:
  *    *` against an atomic map — the semantics S3 (since 2024-08
  *    conditional writes), GCS (`x-goog-if-generation-match: 0`) and
  *    ABFS (`If-None-Match: *`) give natively. No tmp file, no link:
  *    the store itself arbitrates the race, which is exactly what the
  *    100 TB deployment would do. Each successful put records an
  *    opaque etag + timestamp like a real object store.
  *
  * Nothing in the protocol assumes list-after-write consistency
  * beyond what both model: a successful put is immediately visible to
  * [[list]]/[[read]] (true of POSIX and of modern S3/GCS/ABFS).
  */
trait CommitStore {

  /** Names present under `dir` (files only; no ordering guarantee).
    * Empty for a `dir` that does not exist yet.
    */
  def list(dir: Path): Seq[String]

  /** Content of `name`; throws [[java.nio.file.NoSuchFileException]]
    * if absent (both backends — callers use the exception to detect a
    * vacuumed-under-them base and retry).
    */
  def read(dir: Path, name: String): String

  /** Conditional publication (`If-None-Match: *`): true iff `name`
    * was absent and now durably holds `content`; false iff `name`
    * already existed (the caller lost a race — nothing was written).
    * Exactly one of N concurrent calls for the same `name` returns
    * true.
    */
  def putIfAbsent(dir: Path, name: String, content: String): Boolean

  /** Remove `name` if present (vacuum's manifest retention). */
  def delete(dir: Path, name: String): Unit

  def exists(dir: Path, name: String): Boolean

  /** Last-modified epoch millis of an existing `name` — vacuum's
    * newer-than-head-manifest in-flight guard reads this.
    */
  def modifiedMs(dir: Path, name: String): Long

  /** Re-key every object under `from` (recursively) to the same
    * relative name under `to` — the TABLE RENAME namespace move.
    * POSIX: a no-op, because the manifests are real files inside the
    * directory the caller just moved with the data; object store: a
    * per-object server-side re-key (COPY + DELETE on real S3/GCS) —
    * O(number of manifests), never O(data), since data files are not
    * store objects. Not atomic across objects: the caller's contract
    * (no concurrent writers during a rename) carries the operation.
    */
  def renameDir(from: Path, to: Path): Unit
}

/** POSIX implementation: fail-if-exists via hard link. See
  * [[VersionedTable]]'s protocol scaladoc for the link(2)-vs-rename(2)
  * analysis this encodes.
  */
object LocalLinkCommitStore extends CommitStore {

  override def list(dir: Path): Seq[String] =
    if (!Files.exists(dir)) Nil
    else Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString).toSeq)

  override def read(dir: Path, name: String): String =
    Files.readString(dir.resolve(name))

  override def putIfAbsent(dir: Path, name: String, content: String): Boolean = {
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content)
    try {
      // link(2): fails with EEXIST if `name` landed meanwhile —
      // unlike rename(2), which atomically REPLACES an existing target
      Files.createLink(dir.resolve(name), tmp)
      Files.deleteIfExists(tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        false
    }
  }

  override def delete(dir: Path, name: String): Unit =
    Files.deleteIfExists(dir.resolve(name))

  override def exists(dir: Path, name: String): Boolean =
    Files.exists(dir.resolve(name))

  override def modifiedMs(dir: Path, name: String): Long =
    Files.getLastModifiedTime(dir.resolve(name)).toMillis

  // the manifests live INSIDE the table directory the rename moved —
  // they traveled with it
  override def renameDir(from: Path, to: Path): Unit = ()
}

/** Object-store-semantics implementation: the manifest namespace is
  * an atomic map and publication is a CONDITIONAL PUT — the race is
  * arbitrated by the store (ConcurrentHashMap.putIfAbsent's atomicity
  * standing in for S3/GCS/ABFS `If-None-Match: *`), not by any
  * filesystem primitive. Each object carries an opaque etag and a
  * timestamp, as the real APIs return. Instances are independent
  * namespaces (one per "bucket"), so tests get isolation for free.
  */
final class InMemoryCommitStore extends CommitStore {

  private case class Obj(content: String, etag: String, modifiedMs: Long)
  private val objects = new ConcurrentHashMap[String, Obj]()

  private def key(dir: Path, name: String): String =
    dir.toAbsolutePath.normalize.toString + "/" + name

  private def prefix(dir: Path): String =
    dir.toAbsolutePath.normalize.toString + "/"

  override def list(dir: Path): Seq[String] = {
    val p = prefix(dir)
    objects.keySet().asScala.iterator
      .filter(_.startsWith(p))
      .map(_.stripPrefix(p))
      .filterNot(_.contains('/')) // direct children only, like Files.list
      .toSeq
  }

  override def read(dir: Path, name: String): String = {
    val o = objects.get(key(dir, name))
    if (o == null) throw new java.nio.file.NoSuchFileException(key(dir, name))
    o.content
  }

  override def putIfAbsent(dir: Path, name: String, content: String): Boolean =
    objects.putIfAbsent(key(dir, name),
      Obj(content, java.util.UUID.randomUUID().toString,
        System.currentTimeMillis())) == null

  override def delete(dir: Path, name: String): Unit =
    objects.remove(key(dir, name))

  override def exists(dir: Path, name: String): Boolean =
    objects.containsKey(key(dir, name))

  override def modifiedMs(dir: Path, name: String): Long = {
    val o = objects.get(key(dir, name))
    if (o == null) throw new java.nio.file.NoSuchFileException(key(dir, name))
    o.modifiedMs
  }

  override def renameDir(from: Path, to: Path): Unit = {
    val p = prefix(from)
    val q = prefix(to)
    objects.keySet().asScala.filter(_.startsWith(p)).toList.foreach { k =>
      val o = objects.remove(k)
      if (o != null) objects.put(q + k.stripPrefix(p), o)
    }
  }
}
