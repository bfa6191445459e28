package graft.sources

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE bloom filters for equality file-skipping — the point-
  * lookup complement of the zone maps (the Delta bloom-filter-index
  * design point). A zone map holds ONE [min, max] interval per column
  * per file, which is exactly wrong for the "find one key in 100 TB"
  * query on a HIGH-CARDINALITY, UNCLUSTERED column: every file's
  * interval spans most of the domain, so `WHERE uuid = 'x'` keeps
  * every file and the scan is O(table). A per-file bloom answers
  * "this key is DEFINITELY not in this file" and prunes the same
  * probe to O(matching files + false positives) — at fpp 0.1% that
  * is ~the matching files alone.
  *
  * Mechanics:
  *  - DECLARATION lives in the manifest (`bloomBy`: physical column
  *    name + target false-positive rate), carried forward by every
  *    commit like `partitionBy` — additive, old readers ignore it
  *    (blooms only SHRINK file lists, never change semantics).
  *  - BUILD is ONE distributed aggregation per staged batch
  *    (`groupBy(input_file_name)` + Spark's own codegen'd
  *    [[BloomFilterAggregate]], partial-merged map-side), writing one
  *    small sidecar per (data file, column):
  *    `<file>.parquet.<col>.bloom`, sketch-serialized. Sidecars are
  *    written FROM THE EXECUTORS (no driver collect — at 1M-row
  *    files a bloom is ~1 MB, and a 10k-file stage would be 10 GB on
  *    the driver), land before the manifest referencing their data
  *    files publishes, and die with their data dir at vacuum. A task
  *    retry rewrites the same bytes (bloom bits are insertion-order
  *    independent) — idempotent.
  *  - PROBE hashes the predicate literal through the SAME
  *    [[XxHash64]] the build hashed the column through (one code
  *    path for every column type, and reproducible on the driver by
  *    evaluating the expression over the literal), then tests each
  *    candidate file's sidecar. A missing sidecar (file staged
  *    before the declaration, or a column added later) keeps the
  *    file — pruning is always conservative.
  *
  * Scale notes: the build job's shuffle carries one partial bloom
  * per (file, task) — file-count × bloom-size bytes, not row-count;
  * the probe is O(candidate files after zone maps) tiny sidecar
  * reads, driver-side here (the local-store reality, like
  * `_stats.json`) with the same distributed-listing seam a real
  * object-store deployment would add.
  */
private[sources] object BloomSkipIndex {

  /** Declared bloom column names must survive as a literal filename
    * segment (`<file>.<col>.bloom`) and as a manifest JSON token.
    */
  val NameRe = "[A-Za-z0-9_]+".r

  def sidecarName(parquetName: String, physCol: String): String =
    parquetName + "." + physCol + ".bloom"

  /** The shared probe hash: evaluating [[XxHash64]] over the literal
    * reproduces exactly what the build's `xxhash64(col)` computed for
    * a row holding that value (same expression, same seed, same
    * internal representation).
    */
  def hashLiteral(lit: Literal): Long =
    new XxHash64(Seq(lit)).eval(null).asInstanceOf[Long]

  /** Load one sidecar, or None when the file was never indexed. */
  def load(table: String, relFile: String, physCol: String): Option[BloomFilter] = {
    val p = Paths.get(table, relFile + "." + physCol + ".bloom")
    if (!Files.exists(p)) None
    else Some(BloomFilter.readFrom(new ByteArrayInputStream(Files.readAllBytes(p))))
  }

  /** Build and write sidecars for `relFiles` of `table` — one Spark
    * job for the whole batch regardless of file count. `maxRows`
    * sizes every file's filter to the LARGEST file in the batch
    * (the aggregate needs one bit size up front; smaller files just
    * land below their target fpp). Declared columns absent from
    * these files (added to the table later) are skipped — their
    * probes keep the files conservatively.
    */
  def build(spark: SparkSession, table: String, relFiles: Seq[String],
      decl: Seq[(String, Double)], maxRows: Long): Unit = {
    if (relFiles.isEmpty || decl.isEmpty) return
    val abs = relFiles.map(f => Paths.get(table, f).toAbsolutePath.toString)
    val df = spark.read.parquet(abs: _*)
    val present = decl.filter { case (c, _) => df.columns.contains(c) }
    if (present.isEmpty) return
    val n = math.max(1L, maxRows)
    val aggs = present.map { case (c, fpp) =>
      val bits = BloomFilter.optimalNumOfBits(n, fpp)
      Bridge.column(new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.expression(col(c)))),
        Literal(n), Literal(bits)).toAggregateExpression()).as(c)
    }
    df.groupBy(input_file_name().as("__graft_bloom_file"))
      .agg(aggs.head, aggs.tail: _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val dataPath = Paths.get(new java.net.URI(r.getString(0)))
          present.zipWithIndex.foreach { case ((c, _), i) =>
            val bytes = r.getAs[Array[Byte]](i + 1)
            if (bytes != null)
              Files.write(dataPath.resolveSibling(
                dataPath.getFileName.toString + "." + c + ".bloom"), bytes)
          }
        }
      }
  }
}
