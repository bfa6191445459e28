package graft.sql

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance entry points (round 10, second half): the
  * lakehouse-maintenance operations that are commands, not queries —
  * vacuum, compact, optimize, history — exposed as DSv2 procedures so
  * `CALL graft.system.vacuum('db.t', 2)` works in plain SQL text (the
  * Iceberg-shaped surface; Spark 4's ProcedureCatalog). Each
  * procedure resolves its table argument against the SAME warehouse
  * root as the catalog's identifiers and calls the SAME maintenance
  * entry point the Scala API exposes, returning its report as a
  * one-result LocalScan (driver-side rows — every maintenance result
  * here is O(versions) metadata, never data).
  */
private[sql] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def names: Array[String] =
    Array("vacuum", "compact", "optimize", "history", "refresh_view",
      "bloom_index")

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"graft procedures live in the 'system' namespace, not " +
        s"'${ident.namespace.mkString(".")}'")
    ident.name match {
      case "vacuum" => new VacuumProcedure(cat)
      case "compact" => new CompactProcedure(cat)
      case "optimize" => new OptimizeProcedure(cat)
      case "history" => new HistoryProcedure(cat)
      case "refresh_view" => new RefreshViewProcedure(cat)
      case "bloom_index" => new BloomIndexProcedure(cat)
      case other => throw new RuntimeException(
        s"no graft procedure named '$other' — one of ${names.mkString(", ")}")
    }
  }
}

private[sql] abstract class GraftProcedure(cat: GraftCatalog)
    extends UnboundProcedure with BoundProcedure {
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  protected def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("dotted table identifier under this catalog, e.g. 'db.t'")
      .build()

  /** 'db.t' → the warehouse directory, same mapping as identifiers. */
  protected def path(tableArg: String): String =
    cat.resolveDotted(tableArg)

  protected def spark: SparkSession = SparkSession.active

  protected def result(schema: StructType, out: Seq[InternalRow]): JIterator[Scan] = {
    val data = out.toArray
    Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = data
    }).iterator()
  }
}

/** CALL graft.system.vacuum(table, retain): retention vacuum through
  * [[graft.sources.VersionedTableOps.vacuum]] — returns the report.
  */
private[sql] class VacuumProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "vacuum"
  override def description(): String =
    "drop all but the newest `retain` versions and reclaim unreferenced files"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam,
    ProcedureParameter.in("retain", IntegerType).defaultValue("2").build(),
    ProcedureParameter.in("grace_ms", LongType).defaultValue("1200000")
      .comment("in-flight commit protection window").build())
  private val schema = StructType(Seq(
    StructField("kept_versions", IntegerType),
    StructField("dropped_versions", IntegerType),
    StructField("deleted_dirs", IntegerType),
    StructField("deleted_bytes", LongType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val r = cat.opsRef.vacuum(path(input.getUTF8String(0).toString),
      input.getInt(1), input.getLong(2))
    result(schema, Seq(InternalRow(
      r.keptVersions.size, r.droppedVersions.size, r.deletedDirs, r.deletedBytes)))
  }
}

/** CALL graft.system.compact(table, n_files): rewrite the snapshot as
  * `n_files` even files in one commit.
  */
private[sql] class CompactProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "compact"
  override def description(): String =
    "rewrite the current snapshot as n_files even files (one commit)"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam,
    ProcedureParameter.in("n_files", IntegerType).defaultValue("1").build())
  private val schema = StructType(Seq(StructField("version", LongType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val v = cat.opsRef.compact(spark,
      path(input.getUTF8String(0).toString), input.getInt(1))
    result(schema, Seq(InternalRow(v)))
  }
}

/** CALL graft.system.optimize(table, cluster_by, n_files, zorder):
  * the clustering rewrite — `cluster_by` is a comma-separated column
  * list; zorder interleaves the first two dimensions.
  */
private[sql] class OptimizeProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "optimize"
  override def description(): String =
    "rewrite the snapshot clustered by the given columns (optionally z-ordered)"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam,
    ProcedureParameter.in("cluster_by", StringType)
      .comment("comma-separated column list").build(),
    ProcedureParameter.in("n_files", IntegerType).defaultValue("16").build(),
    ProcedureParameter.in("zorder", BooleanType).defaultValue("false").build())
  private val schema = StructType(Seq(StructField("version", LongType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val cols = input.getUTF8String(1).toString.split(",").map(_.trim).toSeq
    val v = cat.opsRef.optimize(spark, path(input.getUTF8String(0).toString),
      cols, input.getInt(2), input.getBoolean(3))
    result(schema, Seq(InternalRow(v)))
  }
}

/** CALL graft.system.history(table): the commit log as rows —
  * version, operation, publish time, file/DV counts. O(versions)
  * driver metadata, no data job.
  */
private[sql] class HistoryProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "history"
  override def description(): String = "the table's commit log, newest last"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam)
  private val schema = StructType(Seq(
    StructField("version", LongType),
    StructField("op", StringType),
    StructField("ts", TimestampType),
    StructField("num_files", IntegerType),
    StructField("num_dvs", IntegerType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val rows = cat.opsRef.history(spark, path(input.getUTF8String(0).toString))
      .collect() // O(versions) metadata rows — the bounded-scalar policy
      .map(r => InternalRow(r.getLong(0), UTF8String.fromString(r.getString(1)),
        r.getTimestamp(2).getTime * 1000L, r.getInt(3), r.getInt(4)))
    result(schema, rows.toSeq)
  }
}

/** CALL graft.system.refresh_view(view): bring a SQL-defined
  * materialized view (CREATE MATERIALIZED VIEW) up to date — one
  * incremental fold of the source delta since the view's committed
  * cursor; a no-op when already fresh. Returns the view's version.
  */
/** CALL graft.system.bloom_index(table, columns, fpp, backfill):
  * declare (or with '' remove) the per-file bloom index — equality
  * file skipping for point lookups on high-cardinality unclustered
  * columns, the probe shape zone maps cannot serve (see
  * [[graft.sources.BloomSkipIndex]]). One declaration commit; with
  * `backfill` (default) the current snapshot's files are indexed in
  * one distributed pass so the index is effective immediately.
  */
private[sql] class BloomIndexProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "bloom_index"
  override def description(): String =
    "declare a per-file bloom index for equality file skipping ('' removes it)"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam,
    ProcedureParameter.in("columns", StringType)
      .comment("comma-separated column list; empty string removes the index")
      .build(),
    ProcedureParameter.in("fpp", DoubleType).defaultValue("0.01")
      .comment("target false-positive rate per file").build(),
    ProcedureParameter.in("backfill", BooleanType).defaultValue("true")
      .comment("index the current snapshot's files now").build())
  private val schema = StructType(Seq(StructField("version", LongType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val cols = input.getUTF8String(1).toString.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    val fpp = input.getDouble(2)
    val v = cat.opsRef.setBloomIndex(spark,
      path(input.getUTF8String(0).toString), cols.map((_, fpp)),
      backfill = input.getBoolean(3))
    result(schema, Seq(InternalRow(v)))
  }
}

private[sql] class RefreshViewProcedure(cat: GraftCatalog) extends GraftProcedure(cat) {
  override def name(): String = "refresh_view"
  override def description(): String =
    "incrementally refresh a SQL-created materialized view"
  override def parameters(): Array[ProcedureParameter] = Array(tableParam)
  private val schema = StructType(Seq(StructField("version", LongType)))
  override def call(input: InternalRow): JIterator[Scan] = {
    val v = GraftMatView.refresh(spark, cat.opsRef,
      path(input.getUTF8String(0).toString))
    result(schema, Seq(InternalRow(v)))
  }
}
