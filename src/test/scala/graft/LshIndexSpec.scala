package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Persisted LSH signature index (SURVEY §2.3): a recurring ingest
  * signs each batch ONCE and probes the stored band tables instead of
  * re-signing the corpus. The contract: the pairs found incrementally
  * (index ∪ batch, restricted to pairs touching the batch) plus the
  * pairs already known inside the index equal a one-shot minhashLsh
  * run over the full corpus — same candidates, same scores.
  */
class LshIndexSpec extends SparkSpec {

  private val indexPath = "tmp/lsh-index-test"

  private def rmTree(p: String): Unit = {
    val root = Paths.get(p)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq.reverse.foreach(Files.delete))
    }
  }

  test("incremental pairs == one-shot pairs on a split corpus") {
    rmTree(indexPath)
    val corpus = core.Tables.load(spark, sf, "documents").select("doc_id", "text")
    // deterministic 80/20 split: every 5th doc arrives as the new batch
    val old = corpus.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
    assert(batch.count() > 0 && old.count() > 0)

    Dedup.buildLshIndex(old, indexPath)
    val incremental = Dedup.incrementalMinhashPairs(spark, indexPath, batch)
    val withinOld = Dedup.minhashLshFrom(old)
    val oneShot = Dedup.minhashLshFrom(corpus)

    val merged = withinOld.unionByName(incremental)
    assert(oneShot.count() > 0, "split corpus has near-dup pairs to find")
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty,
      "old-old + incremental == one-shot over the full corpus, scores included")
    // and the incremental leg genuinely involves the batch
    val batchIds = batch.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val stray = incremental.filter(
      !col("id_a").isin(batchIds.toSeq: _*) && !col("id_b").isin(batchIds.toSeq: _*)).count()
    assert(stray === 0L, "incremental emits only pairs touching the batch")
  }

  test("appending the batch makes the next batch's probe see it") {
    // after folding the batch in, a second batch containing a copy of
    // a first-batch doc must pair against it through the index alone
    val corpus = core.Tables.load(spark, sf, "documents").select("doc_id", "text")
    val batch = corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
    Dedup.appendToLshIndex(batch, indexPath) // index now holds the full corpus
    val probe = batch.limit(3)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val pairs = Dedup.incrementalMinhashPairs(spark, indexPath, probe)
    val hits = pairs.filter(col("est_jaccard") >= 0.99).count()
    assert(hits >= 3L, "re-ingested copies pair with their indexed originals")
  }

  test("re-ingesting already-indexed ids emits no duplicate or self pairs") {
    // a batch whose doc_ids are ALREADY in the index must be dropped
    // before the union (stored copy is authoritative): no self pairs,
    // no duplicated signature rows fanning the scoring joins out
    val corpus = core.Tables.load(spark, sf, "documents").select("doc_id", "text")
    val reingested = corpus.filter(pmod(col("doc_id"), lit(5)) === 0).limit(5)
    val pairs = Dedup.incrementalMinhashPairs(spark, indexPath, reingested).cache()
    assert(pairs.filter(col("id_a") === col("id_b")).count() === 0L, "no self pairs")
    assert(pairs.count() === pairs.distinct().count(), "no duplicate pairs")
    // fully re-ingested batch contributes nothing new — every pair it
    // could form was reported when the ids were first checked
    assert(pairs.count() === 0L, "stored ids are authoritative")
    pairs.unpersist()
  }

  test("a crash between the two table writes is invisible to readers") {
    // stage a seg dir with only ONE of the two tables and no marker —
    // the shape a crash between writes leaves behind; the index must
    // read exactly as before (marker-committed segments only)
    val before = Dedup.incrementalMinhashPairs(spark, indexPath,
      core.Tables.load(spark, sf, "documents").select("doc_id", "text").limit(3)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text")))
      .collect().toSet
    val orphan = Paths.get(indexPath, "seg-deadbeef")
    core.Tables.load(spark, sf, "documents").select("doc_id", "text").limit(2)
      .write.parquet(s"$indexPath/seg-deadbeef/signatures") // bands never written
    assert(Files.exists(orphan))
    val after = Dedup.incrementalMinhashPairs(spark, indexPath,
      core.Tables.load(spark, sf, "documents").select("doc_id", "text").limit(3)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"), col("text")))
      .collect().toSet
    assert(after === before, "uncommitted segment is garbage, not a sig/band mismatch")
  }

  test("build refuses to clobber an existing committed index") {
    val e = intercept[IllegalArgumentException](
      Dedup.buildLshIndex(
        core.Tables.load(spark, sf, "documents").select("doc_id", "text"), indexPath))
    assert(e.getMessage.contains("already exists"))
  }
}
