package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table (SURVEY.md §2.5). */
object TextAnalysis {

  /** Per-document quality stats: token/char counts, alpha ratio,
    * stopword ratio, average token length. Integer counts are exact;
    * ratios are single double divisions of exact longs, so they are
    * bit-identical across engines and partitionings.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"),
        length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("n_alpha"),
        stopwordCount(toks).as("n_stopwords"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("sum_token_len"))
      // NULLIF guards: empty/whitespace-only docs have 0 tokens/chars;
      // both sides must yield NULL (ANSI Spark would throw, DuckDB
      // would produce nan/inf — neither compares equal)
      .withColumn("alpha_ratio",
        col("n_alpha").cast("double") / nullif(col("n_chars_actual").cast("double"), lit(0.0)))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / nullif(col("n_tokens").cast("double"), lit(0.0)))
      .withColumn("avg_token_len",
        col("sum_token_len").cast("double") / nullif(col("n_tokens").cast("double"), lit(0.0)))
  }

  /** Token counting: whitespace tokens + BPE-ish pre-tokenizer count. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(wsTokens(col("text"))).cast("long").as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpeish_tokens"))

  /** Heuristic stopword-profile language ID. Oracle-checked: the
    * argmax over (hits, lang) structs is reproduced in DuckDB as a
    * hits DESC, lang DESC row_number — tie-breaks must stay aligned.
    */
  def langid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        langId(wsTokens(lower(col("text")))).as("predicted_lang"))

  /** TF-IDF: term frequency per doc × inverse document frequency.
    * The per-term document-frequency table has one row per DISTINCT
    * term — it grows with the corpus (heavy-tailed vocabulary), so it
    * is NEVER broadcast: tf⋈dfreq is a shuffle join on term, and the
    * dfreq side arrives already hash-partitioned by term from its own
    * groupBy, so only the tf side exchanges. The one-row doc count is
    * the only broadcast. Score is rounded to 6 decimals — ln() may
    * differ in the last ulp across math libraries.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanOut(spark, t(spark, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.Signatures.refTokensFast(col("text"))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(cnt.as("tf"))
    val dfreq = tf.groupBy("term").agg(cnt.as("df"))
    val nDocs = docs.agg(cnt.as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("score"))
  }

  /** Bigram language-model quality score — the CCNet-style "train a
    * small LM on the corpus, rank documents by perplexity" filter,
    * self-trained on the corpus itself in the same job.
    *
    * Model: add-half-smoothed bigram conditionals
    * p(w2|w1) = (c12 + 0.5) / (c1 + 0.5·V). Per-bigram surprisal is
    * QUANTIZED to whole bits with pure integer arithmetic:
    * s = floor(log2(1/p)) = bitlen((2·c1 + V) div (2·c12 + 1)) − 1,
    * which both engines compute exactly as length(bin(q)) − 1 — no
    * ln() ulp drift, no float sums, bit-identical at any partitioning
    * (the mr_pagerank integer-arithmetic pattern applied to LM
    * scoring). Doc score = mean surprisal in milli-bits, integer
    * floor division.
    *
    * Scale shape: the bigram-count table grows with the corpus →
    * NEVER broadcast; bigrams join it shuffle-on-(w1,w2) and the
    * unigram table shuffle-on-w1 (the tfidf df-table policy). Only
    * the one-row vocabulary size broadcasts. Wikipedia-style LM
    * training (score against a reference corpus instead of self)
    * is the same plan with counts built from a second table.
    */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = fanOut(spark, t(spark, dir, "documents"))
    val toks = docs.select(col("doc_id"),
      graft.functions.Signatures.refTokensFast(col("text")).as("toks"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("bg"))
      .select(col("doc_id"), col("bg")("0").as("w1"), col("bg")("1").as("w2"))
    val uni = toks.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(cnt.as("c1"))
    val bc = bi.groupBy("w1", "w2").agg(cnt.as("c12"))
    val vocab = uni.agg(cnt.as("v"))
    bi.join(bc, Seq("w1", "w2"))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (length(bin(expr("(2*c1 + v) DIV (2*c12 + 1)"))) - 1).cast("long").as("s"))
      .groupBy("doc_id")
      .agg(cnt.as("n_bigrams"), sum(col("s")).as("total_bits"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("total_bits * 1000 DIV n_bigrams").as("lm_bits_milli"))
  }

  /** Keyword extraction: top-3 TF-IDF terms per document — [[tfidf]]
    * composed with the NATIVE bounded-heap top-k operator
    * (plans.TopK, O(n log k) per group, no window sort): the
    * custom-plan stack driving a real pipeline stage rather than a
    * demo query. Tie-break (score desc, term asc) is total, so the
    * cut is deterministic and the oracle's row_number replays it.
    */
  def keywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    graft.plans.TopK.topKPerGroup(
      tfidf(spark, dir).select("doc_id", "term", "score"),
      Seq("doc_id"), Seq("score" -> false, "term" -> true), k)

  /** Rolling-hash document fingerprint. Oracle-checked: DuckDB
    * reproduces the same modular recurrence with HUGEINT arithmetic
    * over hex-decoded UTF-8 bytes.
    */
  def fingerprintDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Repetition ratio (Gopher-style quality signal): the fraction of
    * word-3-gram occurrences that repeat an earlier shingle of the same
    * document. High ratios flag boilerplate/spam for filtering. One
    * narrow pass — total windows from the token count, distinct
    * windows from the single-pass shingle kernel; no shuffle.
    */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        greatest(size(graft.functions.Signatures.refTokensFast(col("text"))) - 2, lit(0))
          .cast("long").as("n_shingles"),
        size(graft.functions.Signatures.shinglesCol(col("text"), 3)).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        (col("n_shingles") - col("n_distinct")).cast("double") /
          nullif(col("n_shingles").cast("double"), lit(0.0)))

  /** Corpus-composition report: per-language document counts, token
    * mass, and share of total tokens — the mixture summary a pipeline
    * produces before sampling a training blend. The per-language
    * aggregate shuffles once; the one-row total is a broadcast.
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "documents")
      .select(col("lang"), size(wsTokens(col("text"))).cast("long").as("ntok"))
      .groupBy("lang")
      .agg(cnt.as("n_docs"), sum("ntok").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot").cast("double")).as("token_share"))
  }

  /** Deterministic stratified sample — the "mix a training blend"
    * stage: per-language keep-rates (percent) applied with a hash-free
    * modulus on the key, so the sample is reproducible across engines
    * and runs (TABLESAMPLE randomness is not). A narrow filter pass;
    * the per-language summary shuffles only the survivors.
    */
  val BlendRates: Map[String, Int] = Map("en" -> 80, "de" -> 50, "es" -> 50, "fr" -> 25)

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = BlendRates.foldLeft(lit(10)) { case (acc, (lang, r)) =>
      when(col("lang") === lang, lit(r)).otherwise(acc)
    }
    t(spark, dir, "documents")
      .filter(pmod(col("doc_id") * 31 + 7, lit(100)) < rate)
      .groupBy("lang")
      .agg(cnt.as("n_sampled"), sum(length(col("text")).cast("long")).as("n_chars"))
  }

  /** Fixed-window token chunking — the training-sequence prep stage:
    * split each document into `chunkSize`-token windows starting every
    * `stride` tokens (overlap = chunkSize − stride), tail windows kept.
    * A pure narrow pass (split + sequence + explode + slice, all
    * codegen'd built-ins — no lambda HOFs, no shuffle); the output
    * explodes ~n/stride rows per doc, which is the point: chunks are
    * the unit the tokenizer/packer downstream consumes.
    */
  def chunk(spark: SparkSession, dir: String,
      chunkSize: Int = 32, stride: Int = 24): DataFrame =
    chunkDocs(t(spark, dir, "documents"), chunkSize, stride)

  /** The chunker as a frame transform over any (doc_id, text) frame —
    * a pure narrow expression chain, so it applies unchanged to a
    * STREAMING Dataset (no state, no watermark needed; spec pins
    * stream output == batch output on the same rows).
    */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("n"))
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        least(col("n") - col("start"), lit(chunkSize)).cast("long").as("n_tokens"),
        array_join(slice(col("t"), col("start") + 1, lit(chunkSize)), " ").as("chunk_text"))

  /** Token-budget sequence packing over NON-overlapping chunks — the
    * step after [[chunk]] in a training pipeline: consecutive chunks
    * of a document accumulate into packs of ~`budget` tokens (soft
    * target: a pack closes when the cumulative count crosses a budget
    * boundary, the standard streaming-pack semantics). The running sum
    * is a window PARTITIONED BY doc_id — parallel across documents,
    * never a global single-partition window — and the pack id is pure
    * integer arithmetic on it, so the result is deterministic and
    * engine-independent.
    */
  def pack(spark: SparkSession, dir: String,
      chunkSize: Int = 32, budget: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("chunk_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunk(spark, dir, chunkSize = chunkSize, stride = chunkSize)
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", expr(s"tok_before DIV $budget"))
      .groupBy("doc_id", "pack_id")
      .agg(cnt.as("n_chunks"), sum("n_tokens").cast("long").as("pack_tokens"))
  }

  /** Scrubbing/masking stage (the PII-redaction shape every training
    * pipeline needs): mask digit runs in the raw payload, report how
    * much was masked. Pure per-row codegen expressions — no shuffle.
    */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("scrubbed"),
        size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0))).cast("long").as("n_masked"))

  /** Benchmark decontamination (training-pipeline staple): flag
    * training documents sharing n-gram shingles with a held-out
    * benchmark set (here the deterministic doc_id % benchMod slice —
    * in production the benchmark corpus arrives as its own table; the
    * plan is identical). Candidate generation is the same rare-shingle
    * equi-join as ngram dedup: shingles above `maxShingleDf` document
    * frequency are dropped from the join key set (a shingle in B bench
    * × T train docs makes B·T candidate rows — boilerplate is
    * quadratic without the cap; a contaminated pair shares many
    * shingles, overwhelmingly rare ones on natural text). Hot shingles
    * still COUNT toward the overlap of every surviving candidate —
    * the same exact fix-up as [[graft.dedup.Dedup.ngramJaccard]]:
    * per-doc HOT-only shingle sets (tiny by construction, empty on
    * normal corpora) are left-joined onto the candidate pairs — so the
    * cap gates candidate generation only, never the score. The cap
    * does not bind at test SF (max df 25), so output there is provably
    * cap-free. Shingle extraction is one UDF pass, lazily checkpointed
    * because three consumers (df, train, bench) would otherwise
    * re-evaluate it.
    */
  def contamination(spark: SparkSession, dir: String, n: Int = 3, minCommon: Int = 3,
      benchMod: Int = 20, maxShingleDf: Int = 1000): DataFrame = {
    val sh = fanOut(spark, t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.Signatures.shinglesCol(col("text"), n)).as("shingle"))
      .localCheckpoint(false)
    val dfreq = sh.groupBy("shingle").agg(cnt.as("df"))
    val tagged = sh.join(dfreq, "shingle")
    val rare = tagged.filter(col("df") <= maxShingleDf)
    val isBench = col("doc_id") % benchMod === 0
    val rarePairs = rare.filter(!isBench).select(col("shingle"), col("doc_id").as("train_id"))
      .join(rare.filter(isBench).select(col("shingle"), col("doc_id").as("bench_id")), "shingle")
      .groupBy("train_id", "bench_id").agg(cnt.as("rare_common"))
    val hotSets = tagged.filter(col("df") > maxShingleDf)
      .groupBy("doc_id").agg(collect_list("shingle").as("hot"))
    rarePairs
      .join(hotSets.select(col("doc_id").as("train_id"), col("hot").as("hot_t")), Seq("train_id"), "left")
      .join(hotSets.select(col("doc_id").as("bench_id"), col("hot").as("hot_b")), Seq("bench_id"), "left")
      .select(col("train_id"), col("bench_id"),
        (col("rare_common") + size(array_intersect(
          coalesce(col("hot_t"), array()), coalesce(col("hot_b"), array())))).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .groupBy("train_id")
      .agg(cnt.as("n_bench_hits"), max("n_common").as("max_overlap"))
  }

  /** Exact SUBSTRING-level duplication signal via content-defined
    * chunking (functions.Signatures.cdcChunks — the FastCDC shape):
    * each document splits at content-defined cut points, so two
    * documents sharing a long byte run produce IDENTICAL interior
    * chunks with no alignment search (the property suffix-array
    * substring dedup pays a global sort for); chunk-level exact
    * grouping then counts, per document, how many chunks (and bytes)
    * also occur elsewhere in the corpus — the actionable signal of
    * "Deduplicating Training Data"-style substring dedup. Scale:
    * chunking is one narrow kernel pass; the only shuffle carries
    * 16-byte (hash, len) chunk keys — never text — and the
    * occurrence-count table is corpus-sized, so it is SHUFFLE-joined
    * on the key it is already partitioned by (the tfidf df policy,
    * never broadcast). dup_ratio = dup_bytes / total, one double
    * division of exact longs.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    // two consumers (the occurrence count and the join side) — lazily
    // checkpointed so the chunk kernel runs once, not per consumer
    // (the ngramJaccard shingle-frame pattern)
    val chunks = fanOut(spark, t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.Signatures.cdcChunksUdf(col("text"))).as("c"))
      .select(col("doc_id"), col("c.len").cast("long").as("len"), col("c.hash"))
      .localCheckpoint(false)
    val occ = chunks.groupBy("hash", "len").agg(cnt.as("n_occ"))
    chunks.join(occ, Seq("hash", "len"))
      .groupBy("doc_id")
      .agg(cnt.as("n_chunks"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("n_occ") >= 2, col("len")).otherwise(0L)).as("dup_bytes"),
        sum(col("len")).as("total_bytes"))
      .withColumn("dup_ratio",
        col("dup_bytes").cast("double") / col("total_bytes").cast("double"))
  }

  /** Hashing-trick featurization (the HashingVectorizer /
    * Vowpal-Wabbit shape — fixed-width features with NO vocabulary
    * table, the property that matters at 100 TB: featurization is a
    * pure narrow map, no global dictionary build, no dictionary
    * broadcast, new tokens never resize anything). Each token's
    * 64-bit FNV-1a/splitmix hash (functions.Signatures.hashToken —
    * the kernel the dedup oracles replay bit-for-bit in SQL) indexes
    * one of 64 dimensions via its low 6 bits, signed ±1 by bit 6 (the
    * signed hash trick: collision noise cancels in expectation);
    * per-doc weights are the signed counts, zero-cancelled dims
    * dropped (sparse output). One kernel pass + explode + one keyed
    * aggregate — the shuffle carries (doc_id, dim, ±1), never text.
    */
  def featureHash(spark: SparkSession, dir: String): DataFrame = {
    fanOut(spark, t(spark, dir, "documents"))
      .select(col("doc_id"),
        explode(graft.functions.Signatures.tokenHashesUdf(col("text"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(64L)).as("dim"),
        when(shiftright(col("h"), 6).bitwiseAND(1) === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("doc_id", "dim")
      .agg(sum("sign").as("weight"))
      .filter(col("weight") =!= 0)
  }
}
