package graft

import org.apache.spark.sql.functions._
import graft.core.MapReduce
import graft.functions.TextFunctions
import graft.multimodal.Multimodal

class TextMultimodalSpec extends SparkSpec {

  test("refTokens Column matches the Scala reference tokenizer") {
    import TestSpark.spark.implicits._
    val samples = Seq("Hello,  World don't 42x end.", "", "   ", "UPPER lower",
      "a-b c_d 1 2 3", "tabs\tstay in token")
    val viaColumn = samples.toDF("text")
      .select(TextFunctions.refTokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0).toList)
    val viaScala = samples.map(MapReduce.referenceTokens(_).toList)
    assert(viaColumn.toSeq === viaScala)
  }

  test("langId picks the profile with most stopword hits") {
    import TestSpark.spark.implicits._
    val df = Seq(
      ("the cat and the dog is in that house", "en"),
      ("der hund und die katze ist nicht hier", "de"),
      ("el perro es un animal que vive", "es"),
      ("le chien est dans les maisons que nous avons", "fr"),
      ("zzz qqq xxx", "und")).toDF("text", "want")
    val got = df.select(
        TextFunctions.langId(TextFunctions.wsTokens(lower(col("text")))).as("got"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("fingerprint is deterministic and content-sensitive") {
    import TestSpark.spark.implicits._
    val df = Seq("abc", "abc", "abd").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp")).collect().map(_.getLong(0))
    assert(df(0) === df(1))
    assert(df(0) !== df(2))
  }

  test("shingles builds exactly n-token windows") {
    import TestSpark.spark.implicits._
    val got = Seq("a b c d").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.wsTokens(col("text")), 3).as("sh"))
      .head.getSeq[String](0)
    assert(got.toSet === Set("a b c", "b c d"))
  }

  test("multimodal: features are deterministic and batch-shaped") {
    val media = Multimodal.mediaTable(spark, sf)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq) // batch size must not change results
    assert(f1.forall(_.n_bytes === 256L))
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
    // payloads differ per id → checksums (near-)unique
    assert(f1.map(_.checksum).distinct.length === f1.length)
  }

  test("multimodal resize shrinks payloads 4x and halves dimensions") {
    val media = Multimodal.mediaTable(spark, sf)
    val resized = Multimodal.resizeAll(media).collect()
    assert(resized.forall(_.payload.length === 64))
    assert(resized.forall(r => r.meta.width === 8 && r.meta.height === 8))
    // deterministic: same input → same resized bytes
    val again = Multimodal.resizeAll(media).collect().sortBy(_.media_id)
    assert(resized.sortBy(_.media_id).map(_.payload.toSeq).toSeq ===
      again.map(_.payload.toSeq).toSeq)
  }

  test("multimodal stats aggregates over the fake decoder output") {
    val row = Multimodal.mediaStats(spark, sf).head
    assert(row.getAs[String]("format") === "fake/rgb8")
    assert(row.getAs[Long]("n") === 500L)
  }

  test("multimodal embed + topk: k neighbors per query, cosine descending") {
    val df = Multimodal.mediaTopK(spark, sf).cache()
    val perQuery = df.groupBy("q_id").count().collect()
    assert(perQuery.length === 5)
    assert(perQuery.forall(_.getLong(1) === 3))
    df.collect().groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cosine"))
      assert(byRank.sameElements(byRank.sortBy(-(_: Double))))
    }
    // embeddings are deterministic (fake codec is a pure function)
    val again = Multimodal.mediaTopK(spark, sf).collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === again)
  }

  test("multimodal frame-sample keeps every stride-th fixed-size frame") {
    val media = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 4).collect()
    // 256-byte payload / 64-byte frames = 4 frames, stride 4 → frame 0 only
    assert(frames.length === 500)
    assert(frames.forall(f => f.frame_no === 0 && f.frame.length === 64))
    val dense = Multimodal.frameSample(media, frameBytes = 64, stride = 1).collect()
    assert(dense.length === 2000)
    assert(dense.map(_.frame_no).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    // sampled frame bytes are the exact payload slice
    val one = dense.find(f => f.media_id === 1L && f.frame_no === 2).get
    val payload = media.filter(_.media_id == 1L).head().payload
    assert(one.frame.toSeq === payload.slice(128, 192).toSeq)
  }

  test("multimodal phash dedup: full recall on variant groups, zero cross-base pairs") {
    val pairs = Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("hamming")))
    // the controlled corpus has 125 bases x 4 variants: every C(4,2)=6
    // within-base pair must be recovered (<=3 flipped low bits land
    // within the radius-3 banding guarantee)...
    assert(pairs.length === 125 * 6, s"got ${pairs.length} pairs")
    assert(pairs.forall { case (a, b, _) => a / 4 === b / 4 },
      "a reported near-dup pair crossed variant groups")
    // ...and unrelated payloads (~32 bits apart) never collide in
    assert(pairs.forall(_._3 <= 3))
    // perturbation really is sub-hamming-1-per-flip: the 0-vs-1
    // variant differs in exactly the one sampled byte
    val ph = Multimodal.variantMediaTable(spark, sf).toDF()
      .select(col("media_id"), Multimodal.phashUdf(col("payload")).as("ph"))
      .filter(col("media_id") < 2).collect().map(_.getAs[Long]("ph"))
    assert(java.lang.Long.bitCount(ph(0) ^ ph(1)) <= 1)
  }

  test("chunk/pack boundary arithmetic: coverage, sizes, and budgets at edge token counts") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    // token counts straddling every boundary: stride (24), chunk (32),
    // their multiples, and the 1-token degenerate doc
    val sizes = Seq(1, 2, 23, 24, 25, 31, 32, 33, 47, 48, 49, 95, 96, 97)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(j => s"w$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val chunks = operators.TextAnalysis.chunkDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    for ((n, i) <- sizes.zipWithIndex) {
      val mine = chunks.filter(_._1 == i.toLong).sortBy(_._2)
      assert(mine.length === (n - 1) / 24 + 1, s"n=$n chunk count")
      // ids contiguous from 0; sizes in [1, 32]; text matches its count;
      // the last chunk ends exactly at token n (full coverage, no overrun)
      assert(mine.map(_._2).toSeq === (0L until mine.length.toLong))
      assert(mine.forall(c => c._3 >= 1 && c._3 <= 32))
      assert(mine.forall(c => c._4.split(" ").length == c._3))
      val last = mine.last
      assert(last._2 * 24 + last._3 === n.toLong, s"n=$n last chunk end")
    }
    // non-overlapping pack path: token mass is conserved per document
    val tmp = java.nio.file.Files.createTempDirectory("graft-packspec").toString
    docs.write.parquet(s"$tmp/documents.parquet")
    val packs = operators.TextAnalysis.pack(TestSpark.spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((n, i) <- sizes.zipWithIndex) {
      val mine = packs.filter(_._1 == i.toLong).sortBy(_._2)
      assert(mine.map(_._4).sum === n.toLong, s"n=$n pack token mass")
      // contiguous ids from 0 (chunks are <= 32 tokens < the 64 budget,
      // so the running sum can never skip a budget bucket)
      assert(mine.map(_._2).toSeq === (0L until mine.length.toLong), s"n=$n pack ids")
    }
  }

  test("cdc chunks: partition the bytes, content-defined cuts align across docs, edits stay local") {
    import graft.functions.Signatures
    val rnd = new scala.util.Random(7)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randText(400)
    val a = randText(150) + shared + randText(130)
    val b = randText(90) + shared + randText(200)
    def chunksOf(t: String) = Signatures.cdcChunks(t)
    // 1. chunks PARTITION the document: contiguous, full coverage,
    // bounds respected (last chunk may undershoot minLen)
    for (t <- Seq(a, b)) {
      val cs = chunksOf(t)
      assert(cs.head.start === 0)
      assert(cs.map(c => c.start + c.len).last === t.getBytes("UTF-8").length)
      cs.sliding(2).foreach { case Array(x, y) =>
        assert(x.start + x.len === y.start); case _ => }
      cs.dropRight(1).foreach(c => assert(c.len >= 24 && c.len <= 128))
    }
    // 2. the shared 400-byte run yields IDENTICAL interior chunks in
    // both docs despite different offsets — the alignment-free
    // property the operator's dedup rides on
    val ha = chunksOf(a).map(c => (c.hash, c.len)).toSet
    val common = chunksOf(b).map(c => (c.hash, c.len)).filter(ha)
    assert(common.map(_._2).sum >= 150,
      s"shared run must surface as shared chunks (got ${common.map(_._2).sum} bytes)")
    // 3. a single-char edit changes only the chunks around it
    val edited = a.updated(a.length / 2, '!')
    val he = chunksOf(edited).map(c => (c.hash, c.len)).toSet
    val survived = chunksOf(a).map(c => (c.hash, c.len)).count(he)
    assert(survived >= chunksOf(a).length - 3,
      "an edit must invalidate only the chunk(s) containing it")
    // 4. determinism + hash == fingerprint of the chunk's bytes
    val c0 = chunksOf(a)(1)
    val sub = new String(a.getBytes("UTF-8").slice(c0.start, c0.start + c0.len), "UTF-8")
    assert(Signatures.fingerprint64(sub) === c0.hash,
      "chunk hash is the polynomial fingerprint of exactly its bytes")
  }

  test("contamination flags the train copy of a bench doc; df cap gates candidates") {
    import TestSpark.spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-contamspec").toString
    val toks = ('a' to 'l').map(c => s"tok$c$c")
    val benchText = toks.mkString(" ") // 12 tokens -> 10 distinct 3-shingles
    def alpha(n: Long) = n.toString.map(c => ('a' + (c - '0')).toChar).mkString
    val docs = (Seq((0L, benchText), (1L, benchText)) ++
      (2L until 15L).map(i => (i, (1 to 8).map(j => s"f${alpha(i)}x${alpha(j)}").mkString(" "))))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // doc 0 is bench (0 % 20 == 0), doc 1 its train-side copy
    val hits = operators.TextAnalysis.contamination(TestSpark.spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 1L, 10L)), s"got ${hits.mkString(",")}")
    // a cap below every shingle's df empties the candidate key set
    assert(operators.TextAnalysis.contamination(TestSpark.spark, tmp,
      maxShingleDf = 1).count() === 0)
  }

  test("contamination: hot shingles count toward overlap of rare-keyed candidates") {
    import TestSpark.spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-contamhot").toString
    // head shared by 4 docs (df=4 -> hot at cap 3); tail unique to the
    // bench/train pair (df=2 -> rare, generates the candidate)
    val hot = "alpha beta gamma delta epsilon"
    val full = hot + " uniqa uniqb uniqc"
    val docs = Seq((0L, full), (1L, full), (4L, hot), (5L, hot)).toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // pair (1,0) shares 3 hot head-shingles + 3 rare cross/tail
    // shingles; minCommon=6 is only reachable if hot overlap is added
    // back onto the rare-keyed candidate
    val hits = operators.TextAnalysis.contamination(TestSpark.spark, tmp,
      minCommon = 6, maxShingleDf = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((1L, 1L, 6L)), s"got ${hits.mkString(",")}")
    // docs 4/5 overlap the bench doc ONLY on hot shingles -> never
    // become candidates (candidate generation stays rare-keyed)
    assert(!hits.exists(h => h._1 == 4L || h._1 == 5L))
  }
}
