package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.multimodal.Multimodal

/** Persisted SimHash / pHash band indexes (round 6): the LshIndexSpec
  * contract applied to the hamming family — pairs found incrementally
  * against the stored band table, plus the pairs already known inside
  * the index, equal a one-shot run over the full corpus; appending a
  * batch makes the next probe see it; re-ingestion is a no-op.
  */
class BandIndexSpec extends SparkSpec {

  private def rmTree(p: String): Unit = {
    val root = Paths.get(p)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(root))(
        _.iterator().asScala.toSeq.reverse.foreach(Files.delete))
    }
  }

  private val simhashIdx = "tmp/simhash-index-test"
  private val phashIdx = "tmp/phash-index-test"

  test("simhash: incremental + within-old == one-shot on a split corpus") {
    rmTree(simhashIdx)
    val corpus = core.Tables.load(spark, sf, "documents").select("doc_id", "text")
    val old = corpus.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
    Dedup.buildSimhashIndex(old, simhashIdx)
    val incremental = Dedup.incrementalSimhashPairs(spark, simhashIdx, batch)
    val merged = Dedup.simhashFrom(old).unionByName(incremental)
    val oneShot = Dedup.simhashFrom(corpus)
    assert(oneShot.count() > 0, "split corpus has simhash near-dups to find")
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty,
      "old-old + incremental == one-shot, hamming distances included")
  }

  test("simhash: appended batch visible to the next probe; re-ingest is a no-op") {
    val corpus = core.Tables.load(spark, sf, "documents").select("doc_id", "text")
    val batch = corpus.filter(pmod(col("doc_id"), lit(5)) === 0)
    Dedup.appendToSimhashIndex(batch, simhashIdx) // index now holds the full corpus
    // identical text re-ingested under fresh ids pairs at hamming 0
    val probe = batch.limit(3)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    val hits = Dedup.incrementalSimhashPairs(spark, simhashIdx, probe)
      .filter(col("hamming") === 0).count()
    assert(hits >= 3L, "re-ingested copies pair with their indexed originals")
    // same ids re-ingested: stored copy is authoritative — nothing new
    val noop = Dedup.incrementalSimhashPairs(spark, simhashIdx, batch.limit(5))
    assert(noop.count() === 0L, "already-indexed ids contribute no pairs")
  }

  test("phash: incremental + within-old == one-shot on a split media corpus") {
    rmTree(phashIdx)
    val media = Multimodal.variantMediaTable(spark, sf).toDF()
      .select("media_id", "payload")
    // split by BASE id (4 variants per base) so near-dup structure
    // spans both sides of the split
    val old = media.filter(pmod(col("media_id"), lit(5)) =!= 0)
    val batch = media.filter(pmod(col("media_id"), lit(5)) === 0)
    Multimodal.buildPhashIndex(old, phashIdx)
    val incremental = Multimodal.incrementalPhashPairs(spark, phashIdx, batch)
    val merged = Multimodal.phashDedupFrom(old).unionByName(incremental)
    val oneShot = Multimodal.phashDedupFrom(media)
    assert(oneShot.count() > 0, "media corpus has phash near-dups to find")
    assert(merged.except(oneShot).isEmpty && oneShot.except(merged).isEmpty,
      "old-old + incremental == one-shot, hamming distances included")
  }

  test("phash: appended batch visible; one-shot oracle query unchanged by refactor") {
    val media = Multimodal.variantMediaTable(spark, sf).toDF()
      .select("media_id", "payload")
    val batch = media.filter(pmod(col("media_id"), lit(5)) === 0)
    Multimodal.appendToPhashIndex(batch, phashIdx)
    val probe = batch.limit(2)
      .select((col("media_id") + lit(1000000L)).as("media_id"), col("payload"))
    val hits = Multimodal.incrementalPhashPairs(spark, phashIdx, probe)
      .filter(col("hamming") === 0).count()
    assert(hits >= 2L, "re-ingested payloads pair with their indexed originals")
  }
}
