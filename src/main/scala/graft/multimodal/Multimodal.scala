package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media payloads are opaque `binary` columns plus a typed metadata
  * struct; decode/feature-extract runs batched per partition so a real
  * decoder (libjpeg/ffmpeg on the cluster image) drops in without
  * changing the plan shape. In this container the codec itself is a
  * deterministic fake ([[FakeCodec]]) — the Spark-side schema,
  * batching, and partitioning are the real thing under test.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, format: String, n_bytes: Long,
      mean_byte: Double, checksum: Long)

  /** Deterministic stand-in for an image/audio decoder: payload bytes
    * are a pure function of (media_id), "decoding" reduces them to
    * summary features. Swap for a real codec at deploy time.
    */
  object FakeCodec {
    def encode(id: Long, n: Int = 256): Array[Byte] = {
      val bytes = new Array[Byte](n)
      var x = id * 6364136223846793005L + 1442695040888963407L
      var i = 0
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        bytes(i) = (x >>> 56).toByte
        i += 1
      }
      bytes
    }

    /** "Resize": deterministic 4:1 downsample of the payload (stride
      * sampling). A real image resize drops in here; the plan shape
      * (narrow map, payload shrinks 4×) is what matters at scale.
      */
    def resize(row: MediaRow): MediaRow = {
      val out = new Array[Byte]((row.payload.length + 3) / 4)
      var i = 0
      while (i < out.length) { out(i) = row.payload(i * 4); i += 1 }
      row.copy(payload = out,
        meta = row.meta.copy(width = row.meta.width / 2, height = row.meta.height / 2))
    }

    def features(row: MediaRow): MediaFeatures = {
      var sum = 0L; var ck = 1469598103934665603L
      row.payload.foreach { b =>
        sum += (b & 0xff)
        ck = (ck ^ (b & 0xff)) * 1099511628211L
      }
      MediaFeatures(row.media_id, row.meta.format, row.payload.length.toLong,
        sum.toDouble / row.payload.length, ck)
    }
  }

  /** Synthesize a media table keyed off documents (each doc gets one
    * fake image payload). In production this column arrives from the
    * lakehouse; partitioning/batching below is unchanged.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val enc = udf((id: Long) => FakeCodec.encode(id))
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"))
      .withColumn("meta", struct(lit("fake/rgb8").as("format"),
        lit(16).as("width"), lit(16).as("height")))
      .withColumn("payload", enc(col("media_id")))
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * path: rows are processed in fixed-size batches per partition (the
    * batch is where a vectorized decoder would amortize setup).
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = decoder-context reuse boundary
        batch.map(FakeCodec.features)
      }
    }
  }

  /** Batched resize stage (narrow map; payload shrinks 4×). */
  def resizeAll(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map(FakeCodec.resize)))
  }

  case class FrameRow(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Frame sampling (the video shape): treat the payload as
    * fixed-size frames and keep every `stride`-th one, one output row
    * per kept frame. flatMap = narrow, no shuffle; output rows carry
    * (media_id, frame_no) so downstream per-frame feature extraction
    * can re-group or window without re-decoding. A real container
    * demuxer (ffmpeg) drops in at the frame-slicing line.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 4): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0)
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val nFrames = row.payload.length / frameBytes
      (0 until nFrames by stride).map { f =>
        FrameRow(row.media_id, f,
          java.util.Arrays.copyOfRange(row.payload, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** End-to-end: synthesize → batch-decode → per-format stats. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir)).toDF()
      .groupBy("format")
      .agg(count(lit(1)).cast("long").as("n"),
        sum("n_bytes").cast("long").as("total_bytes"),
        min("checksum").as("min_checksum"))

  case class MediaEmbedding(media_id: Long, embedding: Array[Double])

  /** "Embed" each payload into a dim-vector: byte-histogram buckets as
    * a deterministic stand-in for a vision/audio encoder (the real
    * model drops into the same batched narrow map). Output schema
    * matches the embeddings table so every similarity operator
    * (bruteforce / LSH / IVF / threshold dedup) composes directly.
    */
  def embedMedia(media: Dataset[MediaRow], dim: Int = 16,
      batchSize: Int = 64): Dataset[MediaEmbedding] = {
    require(dim > 0 && 256 % dim == 0, s"dim $dim must divide 256")
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(batchSize).flatMap(_.map { row =>
      val v = new Array[Double](dim)
      row.payload.foreach { b => v((b & 0xff) / (256 / dim)) += 1.0 }
      MediaEmbedding(row.media_id, v)
    }))
  }

  /** Variant media table for near-dup detection: every 4 consecutive
    * media ids share one base payload, and id%4 of them carry small
    * low-bit perturbations (the re-encode/resize noise real image
    * corpora have). The controlled structure lets the phash pipeline
    * be verified value-exactly — production tables arrive with the
    * duplicates already in them.
    */
  def variantMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val encV = udf { (id: Long) =>
      val bytes = FakeCodec.encode(id / 4)
      var j = 0
      while (j < (id % 4).toInt) {
        bytes(j * 16) = (bytes(j * 16) ^ 1).toByte
        j += 1
      }
      bytes
    }
    graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("media_id"))
      .withColumn("meta", struct(lit("fake/rgb8").as("format"),
        lit(16).as("width"), lit(16).as("height")))
      .withColumn("payload", encV(col("media_id")))
      .as[MediaRow]
  }

  /** Perceptual hash: stride-4 downsample (the resize stage's shape)
    * to 64 samples, then one bit per sample by integer-only
    * mean-threshold (64·sample > Σsamples — no floating point, so the
    * hash replays bit-exactly in any engine). Small pixel noise moves
    * few samples by ±1 → few bits flip; unrelated payloads land ~32
    * bits apart. Codec-domain work, hence a UDF next to FakeCodec —
    * a real pHash (DCT over decoded pixels) drops into this slot.
    */
  private[graft] val phashUdf = udf { (payload: Array[Byte]) =>
    val n = payload.length / 4
    val s = new Array[Int](n)
    var sum = 0L
    var i = 0
    while (i < n) { s(i) = payload(i * 4) & 0xff; sum += s(i); i += 1 }
    var h = 0L
    i = 0
    while (i < n && i < 64) {
      if (s(i) * n.toLong > sum) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Media near-dup pairs by perceptual hash — image dedup, the
    * multimodal twin of text SimHash: 64-bit phash per payload, 4×16
    * banding (pigeonhole: hamming ≤ 3 ⇒ some band equal), capped
    * bucket self-join, bit_count verify. The payload never reaches
    * the shuffle — bands carry (media_id, phash) only, so at 100 TB
    * of images the join moves ~16 bytes per row per band.
    */
  /** (media_id, phash) per payload — factored for the persisted index. */
  private[graft] def phashSignatures(media: DataFrame): DataFrame =
    media.select(col("media_id"), phashUdf(col("payload")).as("phash"))

  /** 4×16-bit chunk banding of phash signatures (simhashBanded's twin). */
  private[graft] def phashBandedOf(sig: DataFrame): DataFrame =
    sig.select(col("media_id"), col("phash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("phash"), b * 16).bitwiseAND(0xffffL)): _*)))
      .toDF("media_id", "phash", "band", "chunk")

  // quadratic guard as in the text dedup family: cells above the cap
  // are dropped before the self-join (geometric cell size here is ~4 —
  // the variants of one base — far under the cap)
  def phashDedup(spark: SparkSession, dir: String, maxHamming: Int = 3,
      maxBucketSize: Int = 100): DataFrame =
    phashDedupFrom(variantMediaTable(spark, dir).toDF(), maxHamming, maxBucketSize)

  /** Persisted pHash band index — incremental IMAGE dedup (round-6:
    * the band table was recomputed per run, so each ingest paid
    * corpus-sized hashing). Hash + band each media batch ONCE, commit
    * the banded rows as an immutable segment (the epoch-marker
    * protocol shared with the minhash/simhash indexes), and probe new
    * batches against the stored cells: batch-sized work per ingest,
    * payloads never leave the hashing pass.
    */
  def buildPhashIndex(media: DataFrame, indexPath: String): Unit =
    graft.dedup.Dedup.buildBandIndex(phashBandedOf(phashSignatures(media)), indexPath)

  def appendToPhashIndex(media: DataFrame, indexPath: String): Unit =
    graft.dedup.Dedup.appendBandIndex(phashBandedOf(phashSignatures(media)), indexPath)

  def incrementalPhashPairs(spark: SparkSession, indexPath: String,
      batch: DataFrame, maxHamming: Int = 3, maxBucketSize: Int = 100): DataFrame =
    graft.dedup.Dedup.incrementalBandPairs(spark, indexPath,
      phashBandedOf(phashSignatures(batch)), "media_id", "phash",
      maxHamming, maxBucketSize)

  /** One-shot phash pairs over an arbitrary (media_id, payload) frame —
    * the index specs' split-corpus reference (simhashFrom's twin).
    */
  def phashDedupFrom(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 100): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming unsupported: 4x16-bit banding covers radius <= 3")
    val banded = phashBandedOf(phashSignatures(media))
    val ok = banded.groupBy("band", "chunk").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize).select("band", "chunk")
    val bounded = banded.join(ok, Seq("band", "chunk"))
    bounded.as("a").join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Media → embedding → cosine top-k, the full multimodal similarity
    * pipeline: batched fake encoder, native graft_normalize +
    * graft_dot scoring, broadcast query side — the same plan shape as
    * Ann.bruteforceTopK over the embeddings table.
    */
  def mediaTopK(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = embedMedia(mediaTable(spark, dir)).toDF()
      .select(col("media_id"),
        graft.plans.VectorExpressions.normalizeNative(col("embedding")).as("v"))
    val queries = corpus.filter(col("media_id") < nQueries)
      .select(col("media_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("media_id").asc)
    corpus.join(broadcast(queries), col("media_id") =!= col("q_id"))
      .select(col("q_id"), col("media_id"),
        graft.plans.VectorExpressions.dotNative(col("v"), col("qv")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("media_id").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
