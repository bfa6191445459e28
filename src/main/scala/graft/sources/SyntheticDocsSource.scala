package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 table: deterministic synthetic documents generated
  * IN PARALLEL on the executors — no files, no driver-side data. The
  * kind of source a 100 TB load test or a pipeline cold-start uses:
  * `spark.read.format("graft.sources.SyntheticDocsSource")
  *   .option("rows", N).option("partitions", P).load()`.
  *
  * Exercises the public connector API end to end: TableProvider →
  * Table → ScanBuilder (with COLUMN PRUNING pushdown — a projection
  * of doc_id never materializes text strings) → Batch →
  * PartitionReaderFactory → per-partition readers. Content is a pure
  * function of doc_id (splitmix-seeded token picks), so any two scans
  * — any partitioning — produce identical rows.
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 options are conventionally case-insensitive
    val opts = new CaseInsensitiveStringMap(properties)
    val partitions = opts.getOrDefault("partitions", "4").toInt
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    new SyntheticDocsTable(opts.getOrDefault("rows", "1000").toLong, partitions)
  }
}

object SyntheticDocsSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val Langs = Array("en", "de", "es", "fr")
  private val Vocab = Array(
    "data", "spark", "query", "plan", "shuffle", "join", "scan", "merge",
    "the", "and", "of", "to", "is", "in", "stream", "batch", "vector",
    "token", "model", "train", "sample", "filter", "group", "sort")

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Knuth multiplicative hash mod 2^32 — deliberately chosen over the
    * splitmix chain so the DuckDB ORACLE can replay it in plain BIGINT
    * arithmetic: `((doc_id * 2654435761) % 4294967296) % 4` never
    * overflows a signed 64-bit value for doc_id < 2^31 (the oracle
    * query uses 2*10^5 rows; ids at/above 2^31 would wrap JVM-side
    * where DuckDB errors, so oracle equivalence is stated for the
    * sub-2^31 range). Mixing quality is ample for a 4-way synthetic
    * label.
    */
  def langOf(id: Long): String =
    Langs((((id * 2654435761L) & 0xffffffffL) % Langs.length).toInt)

  def textOf(id: Long): String = {
    val n = 5 + (mix(id * 31 + 1) & 0x7fffffff).toInt % 20
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab((mix(id * 131 + i) & 0x7fffffff).toInt % Vocab.length))
      i += 1
    }
    sb.toString
  }
}

class SyntheticDocsTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions)
}

class SyntheticDocsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var required: StructType = SyntheticDocsSource.Schema
  private var pushed: Array[Filter] = Array.empty
  // [lo, hi): the doc_id range the scan must generate after pushdown
  private var lo: Long = 0L
  private var hi: Long = rows

  // column pruning pushdown: a doc_id-only projection never builds text
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Filter pushdown — the partition-pruning twin of the column
    * pruning above: doc_id range predicates narrow the generated
    * [lo, hi) span, so whole input partitions outside the range are
    * never planned (the DSv2 analog of parquet row-group/partition
    * skipping). Range application is exact, so accepted conjuncts are
    * NOT returned as residuals; anything else (lang/text predicates)
    * stays a residual for Spark to evaluate post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating increment: v+1 on Long.MaxValue would wrap to
    // MinValue and silently un-push the bound (wrong results, not a
    // slow path). `doc_id > MaxValue` then yields lo=MaxValue ≥ hi →
    // empty scan; `doc_id <= MaxValue` leaves hi unchanged — both exact.
    def inc(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    def accept(f: Filter): Boolean = f match {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, inc(v)); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, inc(v)); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, inc(v)); true
      case IsNotNull("doc_id") => true // column is non-nullable
      case _ => false
    }
    pushed = filters.filter(accept)
    filters.diff(pushed)
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    // surface the pushdown state in explain() — the evidence line
    // PLANS.md carries for every file scan, rendered here for the
    // generated source (range = the post-pushdown generation span)
    override def description(): String =
      s"PushedFilters: [${pushed.mkString(", ")}], " +
        s"GenRange: [$lo, $hi), ReadSchema: ${required.simpleString}"
    override def toString: String = description()
    override def planInputPartitions(): Array[InputPartition] = {
      // balanced split that always yields exactly `partitions` ranges
      // (possibly empty when rows < partitions); when a pushed doc_id
      // range narrowed the scan, ranges are clamped to it and emptied
      // partitions are SKIPPED (never scheduled)
      val ranges = (0 until partitions).map { p =>
        DocsRange(rows * p / partitions, rows * (p + 1) / partitions)
      }
      val planned =
        if (lo > 0L || hi < rows)
          ranges.map(r => DocsRange(math.max(r.start, lo), math.min(r.end, hi)))
            .filter(r => r.end > r.start)
        else ranges
      planned.map(r => r: InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required)
  }
}

case class DocsRange(start: Long, end: Long) extends InputPartition

class DocsReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[DocsRange]
    // resolve the projected columns once per partition, not per row
    val fields: Array[Long => Any] = required.fields.map(_.name match {
      case "doc_id" => (id: Long) => id
      case "lang" => (id: Long) => UTF8String.fromString(SyntheticDocsSource.langOf(id))
      case "text" => (id: Long) => UTF8String.fromString(SyntheticDocsSource.textOf(id))
    })
    new PartitionReader[InternalRow] {
      private var cur = range.start - 1
      override def next(): Boolean = { cur += 1; cur < range.end }
      override def get(): InternalRow = InternalRow.fromSeq(fields.map(_(cur)).toSeq)
      override def close(): Unit = ()
    }
  }
}
