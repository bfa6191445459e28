package graft.sql

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.{VersionedTable, VersionedTableOps}

/** SQL entry point to the versioned-table layer (SURVEY.md §2.7): a
  * DataSource-V2 [[TableCatalog]] so plain-SQL users — and BI tools
  * that only speak SQL — reach the same commit-log snapshots the
  * Scala API serves, with the same zone-map file skipping.
  *
  * Activation mirrors the shape every comparable lakehouse layer
  * (Delta, Iceberg) uses — one catalog config plus one extensions
  * config:
  * {{{
  *   spark.sql.catalog.graft   = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.root = /path/to/warehouse   (or set at runtime)
  *   spark.sql.extensions      = graft.sql.GraftSqlExtensions
  * }}}
  * after which `SELECT … FROM graft.db.t`, `… VERSION AS OF 3`,
  * `… TIMESTAMP AS OF '…'`, `SHOW TABLES IN graft.db` and
  * `DESCRIBE TABLE graft.db.t` all work. Identifiers map to
  * directories: `graft.a.b.t` → `<root>/a/b/t`, each table directory
  * being an ordinary [[VersionedTable]] (a `_commits/` log next to
  * immutable data files).
  *
  * Read path: `loadTable` pins the table's CURRENT version (so one
  * statement referencing a table twice sees one snapshot), and the
  * [[GraftSqlRule]] resolution rule swaps the DSv2 relation for
  * [[VersionedTableOps.readIndexed]]'s plan — a parquet file-source
  * relation over [[graft.sources.ZoneMapFileIndex]], so query
  * predicates prune manifest files at PLANNING time and the scan
  * keeps every file-source optimization (parquet pushdown on
  * survivors, column pruning, whole-stage codegen). The rule-based
  * swap is the same design Delta uses (DeltaCatalog +
  * DeltaSparkSessionExtension): the catalog resolves NAMES and pins
  * VERSIONS; the extensions rule owns the plan.
  *
  * Scale: every catalog operation here is O(manifest) driver-side
  * metadata — no data job. The data work happens in the swapped-in
  * scan, which is the already-audited zone-map read path.
  *
  * The catalog is read-only by design for now (writes go through the
  * transactional Scala API — VersionedTable.append/upsert/merge —
  * whose commit-closure semantics SQL INSERT cannot express); DDL
  * writes throw with a pointer at the API.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var initRoot: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initRoot = Option(options.get("root"))
  }

  override def name(): String = catalogName

  /** Store backend for this catalog name — POSIX by default; tests
    * (and embedders) may register an object-store-backed ops under a
    * second catalog name via [[GraftCatalog.setOps]].
    */
  private def ops: VersionedTableOps = GraftCatalog.opsFor(catalogName)

  /** Warehouse root, re-read from the session conf on EVERY lookup so
    * `spark.conf.set("spark.sql.catalog.<name>.root", …)` takes
    * effect immediately — catalog instances are cached per session,
    * but the warehouse location must not be frozen at first use.
    */
  private def root: String = {
    val conf = SparkSession.active.conf
    conf.getOption(s"spark.sql.catalog.$catalogName.root")
      .orElse(initRoot)
      .getOrElse(throw new IllegalStateException(
        s"graft catalog '$catalogName' has no warehouse root — set " +
          s"spark.sql.catalog.$catalogName.root"))
  }

  private def tablePath(ident: Identifier): String =
    (ident.namespace :+ ident.name).foldLeft(java.nio.file.Paths.get(root)) {
      (p, seg) => p.resolve(seg)
    }.toString

  private def nsPath(namespace: Array[String]): java.nio.file.Path =
    namespace.foldLeft(java.nio.file.Paths.get(root))((p, seg) => p.resolve(seg))

  private def isTable(path: String): Boolean = ops.versions(path).nonEmpty

  override def tableExists(ident: Identifier): Boolean = isTable(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    val path = tablePath(ident)
    val vs = ops.versions(path)
    if (vs.isEmpty) throw new NoSuchTableException(ident)
    // pin the head NOW: every scan of this statement sees one snapshot
    new GraftSqlTable(ops, path, vs.last, ident)
  }

  /** `VERSION AS OF <v>` — the SQL twin of `read(…, Some(v))`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = tablePath(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new NoSuchTableException(
        ident.toString, s"version '$version' is not a graft version number")
    }
    if (!ops.versions(path).contains(v)) throw new NoSuchTableException(
      ident.toString, s"version $v does not exist (or was vacuumed)")
    new GraftSqlTable(ops, path, v, ident)
  }

  /** `TIMESTAMP AS OF <ts>` — Spark hands micros; the commit log
    * resolves AS-OF on manifest publish times (millis).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    if (ops.versions(path).isEmpty) throw new NoSuchTableException(ident)
    new GraftSqlTable(ops, path,
      ops.versionAsOf(path, Math.floorDiv(timestampMicros, 1000L)), ident)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!java.nio.file.Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.list(dir))(
      _.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) && isTable(p.toString))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray)
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft is read-only over SQL — create tables with VersionedTable.overwrite")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft is read-only over SQL — use VersionedTable.renameColumn/dropColumn")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft is read-only over SQL — use VersionedTable.vacuum")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft is read-only over SQL")

  // ---- SupportsNamespaces: namespaces are directories under root ----

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsPath(namespace)
    if (!java.nio.file.Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.list(dir))(
      _.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) && !isTable(p.toString))
        .map(p => namespace :+ p.getFileName.toString)
        .toArray)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (java.nio.file.Files.isDirectory(nsPath(namespace)) &&
      !isTable(nsPath(namespace).toString))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    java.nio.file.Files.createDirectories(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "graft is read-only over SQL — remove warehouse directories directly")
}

object GraftCatalog {
  /** Per-catalog-name store-backend selection: the POSIX-linked store
    * by default; a test (or an embedder fronting a real object store)
    * registers its [[VersionedTableOps]] under the catalog name it
    * configures. Delegates to [[VersionedTable.registerOps]] — the
    * shared by-name registry every string-instantiated entry point
    * (this catalog, the catalog stream source) resolves through.
    */
  def setOps(catalogName: String, ops: VersionedTableOps): Unit =
    VersionedTable.registerOps(catalogName, ops)

  def opsFor(catalogName: String): VersionedTableOps =
    VersionedTable.opsNamed(catalogName)
}

/** One pinned snapshot of one versioned table, as a DSv2 [[Table]].
  * The version is fixed at `loadTable` time — the SQL reader's
  * snapshot-isolation point — and [[GraftSqlRule]] turns the relation
  * into the zone-map-indexed scan. `newScanBuilder` exists to satisfy
  * SupportsRead but refuses loudly: without the extensions rule the
  * session would otherwise plan a scan that bypasses deletion
  * vectors and column renames, i.e. return WRONG rows — refusal is
  * the only safe fallback (same posture as the manifest
  * format-version check).
  */
class GraftSqlTable(val ops: VersionedTableOps, val path: String,
    val pinnedVersion: Long, ident: Identifier) extends Table with SupportsRead {

  override def name(): String = s"graft:${ident}@v$pinnedVersion"

  override lazy val schema: StructType =
    ops.read(SparkSession.active, path, Some(pinnedVersion)).schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("provider", "graft")
    m.put(TableCatalog.PROP_LOCATION, path)
    m.put("graft.version", pinnedVersion.toString)
    val parts = ops.partitionSpec(path, Some(pinnedVersion))
    if (parts.nonEmpty) m.put("partitionBy", parts.mkString(","))
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new IllegalStateException(
      "graft SQL reads require the extensions rule (set spark.sql.extensions=" +
        "graft.sql.GraftSqlExtensions, or graft.plans.GraftExtensions): a raw " +
        "DSv2 scan would bypass deletion vectors and column renames")

  /** The plan the relation becomes: the zone-map-indexed read of this
    * pinned version (predicates prune manifest files at planning).
    */
  def resolve(spark: SparkSession): org.apache.spark.sql.DataFrame =
    ops.readIndexed(spark, path, Some(pinnedVersion))
}

/** Resolution rule: DSv2 relation over a [[GraftSqlTable]] → the
  * pinned version's [[VersionedTableOps.readIndexed]] plan, with a
  * Project re-binding the relation's attribute ids onto the
  * replacement's output so every already-resolved reference upstream
  * keeps resolving.
  */
class GraftSqlRule(spark: SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Alias
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
      val table = r.table.asInstanceOf[GraftSqlTable]
      val replacement = table.resolve(spark).queryExecution.analyzed
      val resolver = spark.sessionState.conf.resolver
      val out = replacement.output
      Project(r.output.map { a =>
        val src = out.find(o => resolver(o.name, a.name)).getOrElse(
          throw new IllegalStateException(
            s"graft table ${table.path}@v${table.pinnedVersion} lost column ${a.name}"))
        Alias(src, a.name)(exprId = a.exprId, qualifier = a.qualifier)
      }, replacement)
  }
}

/** Minimal extensions: ONLY the catalog resolution rule — safe to set
  * on any session (the rule matches nothing but graft catalog
  * relations). [[graft.plans.GraftExtensions]] includes this rule too,
  * alongside the native functions and planner strategies.
  */
class GraftSqlExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectResolutionRule(session => new GraftSqlRule(session))
}
