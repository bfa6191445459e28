package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.functions.TextFunctions._

/** Document deduplication operators (SURVEY.md §2.3).
  *
  * Scale notes (100 TB): every variant avoids materializing the full
  * shingle explosion past the first aggregation; candidate pairs are
  * generated only inside LSH buckets / shared-shingle groups, never by
  * a global cross join. MinHash signatures are computed as 64
  * independent min-aggregates over a single shingle explode — one
  * shuffle keyed by doc_id, then banding explodes ×16 only.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")

  /** Exact dedup: group identical text, keep the smallest doc_id as
    * canonical. Grouping key is the text hash + length (not the full
    * text) so the shuffle carries 12 bytes/row, not the document.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(xxhash64(col("text")).as("h"), length(col("text")).as("len"))
      .agg(min("doc_id").as("canonical_id"), cnt.as("copies"))
      .select(col("canonical_id"), col("copies"))

  /** Word-3-shingle Jaccard similarity join: pairs sharing ≥ minJaccard
    * of their distinct shingles. Candidates come from an equi-join on
    * the shingle (only pairs sharing ≥1 shingle are ever formed), then
    * one aggregation counts the intersection — the ClusterJoin-style
    * filter-and-verify shape.
    */
  def ngramJaccard(spark: SparkSession, dir: String,
      n: Int = 3, minJaccard: Double = 0.55): DataFrame = {
    val sh = docs(spark, dir)
      .select(col("doc_id"), explode(shingles(refTokens(col("text")), n)).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(cnt.as("n_shingles"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(cnt.as("common"))
    pairs
      .join(broadcast(sizes).as("sa"), col("id_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("common").cast("double") /
          (col("sa.n_shingles") + col("sb.n_shingles") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  val NumHashes = 64
  val Bands = 16 // × 4 rows/band

  /** MinHash signature per doc: 64 seeded xxhash64 min-aggregates over
    * one shingle explode. Returns (doc_id, sig array<long>).
    */
  def minhashSignatures(d: DataFrame, n: Int = 3): DataFrame = {
    val sh = d.select(col("doc_id"), explode(shingles(refTokens(col("text")), n)).as("shingle"))
    val mins = (0 until NumHashes).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until NumHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-dup candidates: band the signature (16 bands ×
    * 4 rows), bucket-join on (band, bucket-hash), then estimate
    * similarity as matching signature positions / 64.
    */
  def minhashLsh(spark: SparkSession, dir: String, minSim: Double = 0.5): DataFrame = {
    val sig = minhashSignatures(docs(spark, dir)).cache()
    val banded = sig.select(
      col("doc_id"),
      posexplode(array((0 until Bands).map(b =>
        xxhash64(lit(b), concat_ws(",",
          (0 until 4).map(r => col("sig").getItem(b * 4 + r)): _*))): _*)))
      .toDF("doc_id", "band", "bucket")
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    candidates
      .join(sig.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sa.sig"), col("sb.sig"), (x, y) => x === y),
          (x: Column) => x)).cast("double") / NumHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minSim)
  }

  /** 64-bit SimHash per doc: per-token xxhash64, each bit votes
    * ±count, sign → bit. Computed as 64 conditional sums over one
    * token explode (single shuffle keyed by doc_id).
    */
  def simhashSignatures(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), explode(refTokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(cnt.as("w"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w")).otherwise(-col("w"))).as(s"b$i")
    }
    toks.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce[Column](_.bitwiseOR(_)).as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit hash into 4×16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), bucket-join, verify
    * with bit_count(xor).
    */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(docs(spark, dir)).cache()
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xffffL)): _*)))
      .toDF("doc_id", "band", "chunk")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .join(sig.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sig.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sa.simhash").bitwiseXOR(col("sb.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs, blocked by label (IVF-style
    * coarse partition) so the pair space is per-block, never global.
    */
  def embeddingDups(spark: SparkSession, dir: String, minCos: Double = 0.35): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), graft.functions.VectorFunctions.normalized(col("embedding")).as("v"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        graft.functions.VectorFunctions.dot(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCos)
  }
}
