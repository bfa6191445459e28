package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×-corpus probe for the dedup/ANN cap CONSTANTS (SURVEY §5): the
  * 100-copy specs prove the caps bound adversarial blowups; this run
  * proves the documented sizing rules hold when N itself grows 10×
  * (50k docs / 20k vectors vs sf0.1's 5k/2k). Prints the cap-margin /
  * recall table recorded in SURVEY.md §5.
  *
  * The replicated corpus lives under tmp/scale10 (repo-local, git-
  * ignored) and preserves DUP DENSITY, not just row count: every token
  * of replica r > 0 gets a per-replica suffix, so each replica keeps
  * the base corpus's internal near-dup structure in its own disjoint
  * shingle space (per-shingle df is UNCHANGED; candidate volume grows
  * linearly with N). Naively appending one marker token instead makes
  * every doc a 10-clique of near-dups — df ×10, join volume ×100, a
  * dup-density change masquerading as a scale-up (measured: a single
  * skewed sort task ran >30 min). Embedding replicas are circular
  * component shifts — norm-preserving, deterministic, and
  * direction-diverse so cells fill geometrically rather than as one
  * mass-duplicate cluster.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // optional section filter: any of corpus|ngram|srp|semdedup|ann
    // (no args = run everything)
    def on(section: String): Boolean = args.isEmpty || args.contains(section)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "tmp/scale10"
    val reps = 10

    val repl = spark.range(0, reps).select(col("id").as("r"))
    if (on("corpus")) {
      core.Tables.load(spark, src, "documents")
        .crossJoin(repl)
        .select(
          (col("doc_id") + col("r") * lit(10000000L)).as("doc_id"),
          when(col("r") === 0, col("text"))
            // per-replica suffix on each token, IN the reference
            // tokenizer's own alphabet: the kernel keeps [A-Za-z] only,
            // so the suffix must be letters (a digit suffix is stripped
            // → all nine replicas collapse into ONE shared token space,
            // 9-cliques per base doc — measured 200k pairs vs the
            // expected ~2.5k) and the raw tokens are pre-stripped to
            // letters (suffixing "foo," as "foo,qa" would tokenize into
            // foo + qa — a bridge token at every punctuation site)
            .otherwise(expr(
              """array_join(transform(
                |  filter(transform(split(text, ' '), x -> regexp_replace(x, '[^A-Za-z]', '')),
                |         x -> x <> ''),
                |  x -> concat(x, 'q', substr('abcdefghi', CAST(r AS INT), 1))), ' ')""".stripMargin))
            .as("text"),
          col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val dim = core.Tables.load(spark, src, "embeddings")
        .select(size(col("embedding")).as("d")).head.getInt(0)
      core.Tables.load(spark, src, "embeddings")
        .crossJoin(repl)
        .select(
          (col("vec_id") + col("r") * lit(10000000L)).as("vec_id"),
          expr(s"concat(slice(embedding, CAST(r AS INT) + 1, $dim - CAST(r AS INT)), slice(embedding, 1, CAST(r AS INT)))")
            .as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
      val nVecs = spark.read.parquet(s"$out/embeddings.parquet").count()
      println(s"[probe] corpus: $nDocs docs, $nVecs vectors")
    }

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // ngram-jaccard df-cap margin: max shingle document frequency vs
    // the cap (1000) at both scales
    if (on("ngram")) {
      for (d <- Seq(src, out)) {
        val sh = core.Tables.load(spark, d, "documents")
          .select(col("doc_id"), explode(graft.functions.Signatures.shinglesCol(col("text"), 3)).as("shingle"))
        val mx = sh.groupBy("shingle").agg(count(lit(1)).as("df")).agg(max("df")).head.getLong(0)
        println(s"[probe] ngram max shingle df @ $d = $mx (cap 1000)")
      }
      timed("dedup_ngram_jaccard @1x")(SparkEntry.queries("dedup_ngram_jaccard")(spark, src).count())
      timed("dedup_ngram_jaccard @10x")(SparkEntry.queries("dedup_ngram_jaccard")(spark, out).count())
    }

    // SRP cell sizes vs the relative cap (16x geometric expectation,
    // floor 64), at the default bits=4 AND at the documented
    // bits ~ log2(N / bucket-size) sizing (10x N -> bits+3 keeps cells
    // at the sf0.1 size). The candidate volume for each setting is
    // computed ANALYTICALLY from the cell sizes (sum over cells of
    // (1+bits)*bsz^2/2 — hamming-1 probing multiplies by 1+bits);
    // running the fixed-bits join at 10x N IS the quadratic the rule
    // exists to avoid (first probe attempt: one skewed sort task >10
    // min), so only the correctly-sized join runs end-to-end.
    if (on("srp")) {
      for ((d, bits) <- Seq((src, 4), (out, 4), (out, 7))) {
        val nT = 10
        val e = graft.similarity.Ann.emb(spark, d)
          .select(col("vec_id"), graft.similarity.Ann.srpBuckets(col("v"), nT, bits).as("bk"))
        val cells = e.select(posexplode(col("bk"))).toDF("tbl", "bucket")
          .groupBy("tbl", "bucket").agg(count(lit(1)).as("bsz"))
        val row = cells.agg(max("bsz"), sum("bsz"),
          sum((col("bsz") * col("bsz") * (bits + 1) / 2).cast("long"))).head
        val (mx, total, cand) = (row.getLong(0), row.getLong(1), row.getLong(2))
        val expect = total.toDouble / (nT * (1 << bits))
        println(f"[probe] SRP cells @ $d bits=$bits: max=$mx expect=${expect}%.0f ratio=${mx / expect}%.2f candidates~${cand}")
      }
      timed("dedup_embedding @10x (bits=7, rule-sized)")(
        graft.dedup.Dedup.embeddingDups(spark, out, bits = 7).count())
    }

    // SemDeDup cluster sizes: fixed k=16 at 10x (documents the
    // kCentroids ~ N/cluster-size rule: cells grow linearly with N
    // when k is held), plus the properly-scaled k=160 run
    if (on("semdedup")) {
      val corpus = graft.similarity.Ann.emb(spark, out).cache()
      for (k <- Seq(16, 160)) {
        val cents = graft.similarity.Ann.trainQuantizer(corpus, k, 2)
        val sizes = corpus.withColumn("cid", graft.similarity.Ann.nearestUdf(cents)(col("v")))
          .groupBy("cid").agg(count(lit(1)).as("n"))
        val row = sizes.agg(max("n"), avg("n")).head
        val (mx, mean) = (row.getLong(0), row.getDouble(1))
        println(f"[probe] semdedup k=$k @10x: max cell=$mx avg=${mean}%.0f pair-work~${"%e".format(mx.toDouble * mx)}")
      }
      corpus.unpersist()
      timed("dedup_semantic @10x (k=16)")(SparkEntry.queries("dedup_semantic")(spark, out).count())
    }

    // multimodal phash dedup at 10x: the 10^7 replica id offset is
    // divisible by 4, so every replica keeps the 4-variant base
    // grouping — pair volume must grow exactly linearly (banding is
    // per-cell, never all-pairs) and stay cross-base-clean
    if (on("phash")) {
      for (d <- Seq(src, out)) {
        val t0 = System.nanoTime()
        val pairs = graft.multimodal.Multimodal.phashDedup(spark, d)
        val n = pairs.count()
        val crossBase = pairs.filter(expr("id_a DIV 4 <> id_b DIV 4")).count()
        println(f"[probe] multimodal_phash @ $d: pairs=$n crossBase=$crossBase time=${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }

    // BPE at realistic merge counts (round-6 item 9): train time vs k
    // at 10x (the vocab-bound claim — train cost is k small jobs over
    // a word-frequency table whose size does NOT grow with corpus
    // size, so time should be ~linear in k and corpus-size-invariant),
    // and the encode expression-depth ceiling (k nested replace()
    // calls; Spark splits oversized codegen into methods and falls
    // back to interpreted past the Janino 64 KiB limit — the probe
    // records where that bites in wall time).
    if (on("bpe")) {
      for (k <- Seq(16, 64, 128)) {
        val t0 = System.nanoTime()
        val merges = graft.operators.Bpe.trainMerges(spark, out, k)
        val trainS = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n = graft.operators.Bpe.encode(spark, out, k)
          .agg(sum("n_tokens")).head.getLong(0)
        val encS = (System.nanoTime() - t1) / 1e9
        println(f"[probe] bpe @10x k=$k: merges=${merges.size} train=${trainS}%.1f s encode(total incl retrain)=${encS}%.1f s tokens=$n")
      }
    }

    // ann_lsh / ann_pq recall vs brute force on the 10x corpus (pq:
    // the codebook stays 8x16x8 regardless of N — what must scale is
    // the nCand re-rank cut relative to corpus size, so the fixed-cut
    // recall at 10x is the number that validates the default)
    if (on("ann")) {
      val bf = SparkEntry.queries("ann_bruteforce")(spark, out)
        .select(col("q_id"), col("neighbor_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      val lsh = SparkEntry.queries("ann_lsh")(spark, out)
        .select(col("q_id"), col("neighbor_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[probe] ann_lsh @10x: recall=${(bf & lsh).size.toDouble / bf.size}%.3f time=${(System.nanoTime() - t0) / 1e9}%.1f s (|bf|=${bf.size})")
      // (500, 256) is the PRODUCTION code size (8-bit codes, the
      // pqTopK scaladoc's documented ceiling) — the round-7 row that
      // shows the adaptive seam extrapolates past its ksub=64 rule
      // point at this N rather than being tuned to it
      for ((nCand, ksub) <- Seq((50, 16), (500, 16), (500, 64), (500, 256))) {
        val t1 = System.nanoTime()
        val pq = graft.similarity.Ann.pqTopK(spark, out, nCand = nCand, ksub = ksub)
          .select(col("q_id"), col("neighbor_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[probe] ann_pq @10x nCand=$nCand ksub=$ksub: recall=${(bf & pq).size.toDouble / bf.size}%.3f time=${(System.nanoTime() - t1) / 1e9}%.1f s")
      }
      // round-6 gate: with the adaptive seam, DEFAULT arguments at 10x
      // must resolve to the rule sizes (ksub=64/nCand=500/kC=160) and
      // deliver recall >= 0.75 — round 5 measured 0.34 here at the
      // then-fixed defaults
      for ((nm, f) <- Seq(
          ("ann_pq DEFAULTS", () => graft.similarity.Ann.pqTopK(spark, out)),
          ("ann_ivfpq DEFAULTS", () => graft.similarity.Ann.ivfpqTopK(spark, out)),
          ("ann_ivf DEFAULTS", () => graft.similarity.Ann.ivfTopK(spark, out)),
          // 1 bit/dim with the 2.5%-of-N re-rank cut engaged (fixed
          // nCand=50 would be 0.25% at this N)
          ("ann_binary DEFAULTS", () => graft.similarity.Ann.binaryTopK(spark, out)),
          ("ann_binary nCand=50 (fixed)", () =>
            graft.similarity.Ann.binaryTopK(spark, out, nCand0 = 50)))) {
        val t1 = System.nanoTime()
        val got = f().select(col("q_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[probe] $nm @10x: recall=${(bf & got).size.toDouble / bf.size}%.3f time=${(System.nanoTime() - t1) / 1e9}%.1f s")
      }
    }
    spark.stop()
  }
}
