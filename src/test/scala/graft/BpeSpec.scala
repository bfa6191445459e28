package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Learned BPE tokenizer (SURVEY §2.5): the oracle pins the merge
  * transcript and the per-doc counts bit-exact vs DuckDB; these
  * specs pin the TOKENIZER properties the oracle can't express —
  * lossless segmentation, the zero-merge identity, monotone
  * compression in the merge count, and training determinism.
  */
class BpeSpec extends SparkSpec {

  test("encode is a lossless segmentation: tokens concatenate back to the word") {
    // every distinct corpus word: stripping the separators from the
    // encoded seq must reproduce the word exactly
    val enc = Bpe.encode(spark, sf) // forces train+encode to run green
    assert(enc.count() > 0)
    val merges = Bpe.trainMerges(spark, sf, Bpe.DefaultMerges)
    assert(merges.size === Bpe.DefaultMerges, "corpus supports all 16 merges")
    // rebuild the seq chain exactly as encode does and check round-trip
    val words = core.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(lower(regexp_replace(col("tok"), "[^A-Za-z]", "")).as("word"))
      .filter(col("word") =!= "").distinct()
    val seq0 = concat(regexp_replace(col("word"), "(.)", " $1"), lit(" "))
    val encoded = merges.foldLeft(seq0) { case (acc, (_, l, r, _)) =>
      replace(acc, lit(s" $l $r "), lit(s" $l$r "))
    }
    val bad = words.filter(replace(encoded, lit(" "), lit("")) =!= col("word")).count()
    assert(bad === 0L, "no word is corrupted by merge application")
  }

  test("zero merges degenerate to characters; more merges never add tokens") {
    val k0 = Bpe.encode(spark, sf, k = 0)
      .select(sum("n_tokens").as("t"), sum("n_chars").as("c")).collect().head
    assert(k0.getLong(0) === k0.getLong(1), "0 merges: tokens == chars")
    def total(k: Int): Long = Bpe.encode(spark, sf, k = k)
      .agg(sum("n_tokens")).collect().head.getLong(0)
    val t4 = total(4); val t16 = total(16)
    assert(t16 <= t4 && t4 <= k0.getLong(1),
      s"token total monotone non-increasing in merges: chars=${k0.getLong(1)}, k4=$t4, k16=$t16")
    assert(t16 < k0.getLong(1), "16 merges genuinely compress this corpus")
  }

  test("training is deterministic across runs") {
    val a = Bpe.trainMerges(spark, sf, 8)
    val b = Bpe.trainMerges(spark, sf, 8)
    assert(a === b, "same merge transcript on re-run")
  }

  test("fast trainer is bit-exact with the per-round Spark trainer") {
    val a = Bpe.trainMerges(spark, sf, 16)
    val b = Bpe.trainMergesLocal(spark, sf, 16)
    assert(a === b, "driver-side trainer must replay the Spark trainer's " +
      "transcript exactly (same pair stats, same total order, same pass)")
  }

  test("kernel encode is bit-identical to the nested-replace chain at k = 128") {
    // 128 REAL merges (fast trainer — the chain form's probed ceiling),
    // compared over the full corpus: per-doc frames must be EQUAL
    val merges = Bpe.trainMergesLocal(spark, sf, 128)
    // the sf0.001 corpus exhausts its pairs at 89 merges — take what it
    // supports (the chain form's probed ceiling is 128)
    assert(merges.size >= 64, s"corpus supports ${merges.size} < 64 merges")
    val viaKernel = Bpe.encodeWith(spark, sf, merges, useKernel = true)
    val viaChain = Bpe.encodeWith(spark, sf, merges, useKernel = false)
    assert(viaKernel.except(viaChain).isEmpty && viaChain.except(viaKernel).isEmpty,
      "kernel and chain disagree on some document")
  }

  test("kernel reproduces the chain's shared-delimiter skip on adversarial repeats") {
    // the documented deviation from canonical BPE must be IDENTICAL in
    // both forms — these words are built to trigger it
    val s = spark
    import s.implicits._
    val words = Seq("aaaaa", "aaaa", "ababab", "abab", "aabbaabb",
      "abcabcabc", "xxyyxxyy", "zzzzzzzz", "a", "ab")
    val merges = Seq((1L, "a", "a", 0L), (2L, "a", "b", 0L), (3L, "ab", "ab", 0L),
      (4L, "aa", "bb", 0L), (5L, "x", "x", 0L), (6L, "z", "z", 0L),
      (7L, "zz", "zz", 0L), (8L, "a", "b", 0L)) // (a,b) relearned at a later rank
    val kern = new Bpe.EncodeKernel(merges.map(m => (m._2, m._3)).toArray)
    val seq0 = concat(regexp_replace(col("word"), "(.)", " $1"), lit(" "))
    val chain = size(split(trim(Bpe.applyMerges(seq0, merges)), " "))
    val got = words.toDF("word")
      .select(col("word"), chain.as("chain")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    got.foreach { case (w, c) =>
      assert(kern.tokenCount(w) === c, s"kernel != chain on '$w'")
    }
    // the canonical examples from the scaladoc, pinned literally
    val aa = new Bpe.EncodeKernel(Array(("a", "a")))
    assert(aa.tokens("aaaaa").toSeq === Seq("aa", "a", "aa"))
    val ab = new Bpe.EncodeKernel(Array(("a", "b")))
    assert(ab.tokens("abab").toSeq === Seq("ab", "a", "b"))
  }

  test("pack by real tokens: packs respect the BPE budget accounting") {
    val packs = Bpe.packByBpe(spark, sf)
    assert(packs.count() > 0)
    // pack totals reconcile with the per-doc encode totals (same
    // words, same merge table — the two queries must agree on the
    // corpus-wide token count)
    val packTotal = packs.agg(sum("pack_tokens")).collect().head.getLong(0)
    val encTotal = Bpe.encode(spark, sf).agg(sum("n_tokens")).collect().head.getLong(0)
    assert(packTotal === encTotal, s"pack tokens $packTotal == encode tokens $encTotal")
  }
}
