package graft

import org.apache.spark.sql.functions._
import graft.plans.VectorExpressions.{nearestNative, probesNative}
import graft.similarity.Ann

/** Bit-exactness of the native nearest-centroid / probe-list codegen
  * expressions against the ScalaUDFs they replace (round-11: the N×K
  * ANN build pass moves from per-row Seq-boxed UDFs into whole-stage
  * codegen). The UDFs stay in the tree as the reference
  * implementation; every oracle replay is pinned on the two producing
  * IDENTICAL assignments, so the spec compares them row-for-row on
  * the real corpus and on adversarial synthetic vectors (zero
  * vectors, exact ties, short vectors).
  */
class VectorAssignSpec extends SparkSpec {

  test("nearestNative matches nearestUdf row-for-row on the real corpus") {
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val cs = Ann.trainQuantizer(corpus, 16, 2)
      val both = corpus
        .withColumn("native", nearestNative(col("v"), cs))
        .withColumn("udf", Ann.nearestUdf(cs)(col("v")))
        .select("vec_id", "native", "udf").collect()
      assert(both.nonEmpty)
      val diff = both.filter(r => r.getInt(1) != r.getInt(2))
      assert(diff.isEmpty,
        s"${diff.length} rows assign differently, e.g. ${diff.take(3).mkString(", ")}")
    } finally corpus.unpersist()
  }

  test("probesNative matches probesUdf ordering exactly at every probe depth") {
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val cs = Ann.trainQuantizer(corpus, 16, 2)
      for (nProbe <- Seq(1, 4, 16)) {
        val both = corpus
          .withColumn("native", probesNative(col("v"), cs, nProbe))
          .withColumn("udf", Ann.probesUdf(cs, nProbe)(col("v")))
          .select("vec_id", "native", "udf").collect()
        val diff = both.filter(r => r.getSeq[Int](1) != r.getSeq[Int](2))
        assert(diff.isEmpty,
          s"nProbe=$nProbe: ${diff.length} rows probe differently, " +
            s"e.g. ${diff.take(3).mkString(", ")}")
      }
    } finally corpus.unpersist()
  }

  test("probesNative with nProbe = 0 returns the empty list, interpreted and codegen") {
    // round-12 advice: the bounded-heap rewrite read slot 0 of
    // zero-length heap arrays where the old repeated scan returned an
    // empty list — unreachable from the drivers (nProbe >= 1
    // everywhere) but a silent contract tightening; both eval paths
    // now early-return the empty list
    val corpus = Ann.emb(spark, sf).limit(10).cache()
    try {
      val cs = Ann.trainQuantizer(corpus, 8, 1)
      // codegen path (column input) and interpreted path (foldable
      // literal input — constant-folded through nullSafeEval)
      val litVec = org.apache.spark.sql.functions.array(
        (0 until cs(0).length).map(i => lit(cs(0)(i))): _*)
      val rows = corpus
        .withColumn("gen", probesNative(col("v"), cs, 0))
        .withColumn("interp", probesNative(litVec, cs, 0))
        .select("gen", "interp").collect()
      assert(rows.forall(r => r.getSeq[Int](0).isEmpty && r.getSeq[Int](1).isEmpty),
        "nProbe = 0 must select nothing on both eval paths")
    } finally corpus.unpersist()
  }

  test("adversarial vectors: zero vector, exact ties, short vectors agree with the UDFs") {
    import TestSpark.spark.implicits._
    // handcrafted codebook with an exact duplicate centroid (tie must
    // keep the LOWER index) and a zero centroid (dot 0.0 everywhere)
    val cs = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0), // duplicate of 1: ties -> index 1
      Array(0.0, 0.0, 0.0, 0.0)) // zero centroid: dot 0.0
    val vecs = Seq(
      Seq(0.0, 1.0, 0.0, 0.0),   // exact tie between centroids 1 and 2
      Seq(0.0, 0.0, 0.0, 0.0),   // zero vector: all dots 0.0, first wins
      Seq(-1.0, -1.0, -1.0, -1.0), // all negative dots: zero centroid wins
      Seq(0.5, 0.5),             // SHORT vector: dot over its own length
      Seq(1.0, 0.0, 0.0, 0.0))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "v")
    val got = df
      .withColumn("native", nearestNative(col("v"), cs))
      .withColumn("udf", Ann.nearestUdf(cs)(col("v")))
      .withColumn("pNative", probesNative(col("v"), cs, 3))
      .withColumn("pUdf", Ann.probesUdf(cs, 3)(col("v")))
      .orderBy("vec_id").collect()
    got.foreach { r =>
      assert(r.getInt(2) === r.getInt(3), s"nearest differs on vec ${r.getLong(0)}")
      assert(r.getSeq[Int](4) === r.getSeq[Int](5),
        s"probes differ on vec ${r.getLong(0)}")
    }
    // pin the semantics, not just the agreement
    assert(got.map(_.getInt(2)).toSeq === Seq(1, 0, 3, 0, 0))
    // a NULL element nulls the result (the documented all-or-nothing
    // contract, matching DotProduct)
    val withNull = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE)) AS v")
      .select(nearestNative(col("v"), cs).as("c"), probesNative(col("v"), cs, 2).as("p"))
      .head()
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
  }

  test("NearestInCell matches a driver-side reference and composes into the two-level id") {
    val corpus = Ann.emb(spark, sf).cache()
    try {
      // small handcrafted two-level shape: 4 coarse cells x 8 subs
      val coarse = Ann.trainQuantizer(corpus, 4, 2)
      val (c2, dim) = (8, 64)
      // deterministic sub-books: perturbed copies of the coarse cells
      val books = new Array[Double](4 * c2 * dim)
      for (c <- 0 until 4; j <- 0 until c2; d <- 0 until dim)
        books((c * c2 + j) * dim + d) =
          coarse(c)(d) + Ann.planeComponent(c * c2 + j, d) * 0.05
      val got = Ann.assignTwoLevel(corpus, coarse, books, c2)
        .select("vec_id", "v", "cid").collect()
      assert(got.nonEmpty)
      got.foreach { r =>
        val v = r.getSeq[Double](1).toArray
        def dot(off: Int): Double =
          (0 until dim).map(i => v(i) * books(off + i)).sum
        // reference: nearest coarse (strict >, first wins), then
        // nearest sub within that cell's slice
        val c1 = coarse.indices.maxBy(c =>
          (coarse(c).zip(v).map { case (a, b) => a * b }.sum, -c))
        val sub = (0 until c2).maxBy(j => (dot((c1 * c2 + j) * dim), -j))
        assert(r.getInt(2) === c1 * c2 + sub,
          s"vec ${r.getLong(0)}: expected ${c1 * c2 + sub}, got ${r.getInt(2)}")
      }
    } finally corpus.unpersist()
  }

  test("pqCodesNative / pqScoreNative match the PQ UDFs bit-for-bit on the real corpus") {
    import graft.plans.VectorExpressions.{pqCodesNative, pqScoreNative}
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val (nSub, sub) = (8, 8)
      val books = Ann.trainPq(corpus, nSub, 16, 2)
      val coded = corpus
        .withColumn("native", pqCodesNative(col("v"), books))
        .withColumn("udf", Ann.pqCodesUdf(books, sub)(col("v")))
      val codeDiff = coded.select("vec_id", "native", "udf").collect()
        .filter(r => r.getSeq[Int](1) != r.getSeq[Int](2))
      assert(codeDiff.isEmpty,
        s"${codeDiff.length} rows code differently, e.g. ${codeDiff.take(3).mkString(", ")}")
      // ADC scores: every (vector, query) pair of a small cross —
      // bit-equality, not approximate (the summation tree is pinned)
      val q = corpus.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val scored = coded.select("vec_id", "native").crossJoin(broadcast(q))
        .withColumn("sNative", pqScoreNative(col("native"), col("qv"), books))
        .withColumn("sUdf", Ann.pqScoreUdf(books, sub)(col("native"), col("qv")))
        .collect()
      val scoreDiff = scored.filter(r =>
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("sNative")) !=
          java.lang.Double.doubleToRawLongBits(r.getAs[Double]("sUdf")))
      assert(scoreDiff.isEmpty, s"${scoreDiff.length} ADC scores differ")
    } finally corpus.unpersist()
  }

  test("srpBuckets (native) matches the SRP UDF bit-for-bit on the real corpus") {
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val (tables, bits) = (Ann.LshTables, Ann.LshBits)
      val both = corpus
        .withColumn("native", Ann.srpBuckets(col("v"), tables, bits))
        .withColumn("udf", Ann.srpBucketsUdf(tables, bits)(col("v")))
        .select("vec_id", "native", "udf").collect()
      assert(both.nonEmpty)
      val diff = both.filter(r => r.getSeq[Long](1) != r.getSeq[Long](2))
      assert(diff.isEmpty,
        s"${diff.length} rows bucket differently, e.g. ${diff.take(3).mkString(", ")}")
      // a vector whose length differs from the plane dim falls back
      // to the UDF (per-length planes) through the coalesce — the
      // dim-8 dedup cap spec relies on this staying exact
      val dim8 = spark.sql(
        "SELECT array(0.5D, -0.2D, 0.1D, 0.9D, -0.4D, 0.3D, 0.0D, -0.8D) AS v")
        .select(Ann.srpBuckets(col("v"), tables, bits).as("b"),
          Ann.srpBucketsUdf(tables, bits)(col("v")).as("u")).head()
      assert(dim8.getSeq[Long](0) === dim8.getSeq[Long](1),
        "non-64-dim vectors must take the exact UDF fallback")
    } finally corpus.unpersist()
  }

  test("the assignment stage plans as a codegen expression, not a ScalaUDF") {
    val corpus = Ann.emb(spark, sf)
    val cs = Array.tabulate(8, 64)((c, d) => if (d % 8 == c) 1.0 else 0.0)
    val assigned = corpus.withColumn("cid", nearestNative(col("v"), cs))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"assignment must not plan a ScalaUDF:\n$plan")
    // constant-folding path (interpreted eval) agrees with codegen:
    // a foldable input evaluates at optimization time through
    // nullSafeEval, the column path through doGenCode
    val litVec = array((0 until 64).map(i => lit(i / 64.0)): _*)
    val folded = spark.range(1)
      .select(nearestNative(litVec, cs).as("c"), probesNative(litVec, cs, 3).as("p"))
      .head()
    val viaCol = spark.range(1).select(litVec.as("v"))
      .select(nearestNative(col("v"), cs).as("c"), probesNative(col("v"), cs, 3).as("p"))
      .head()
    assert(folded.getInt(0) === viaCol.getInt(0))
    assert(folded.getSeq[Int](1) === viaCol.getSeq[Int](1))
  }

  test("heap probe selection matches the sort reference at large K, deep nProbe, dense ties") {
    // round-12: ProbeCentroids' selection moved from an O(K·nProbe)
    // repeated scan to an O(K log nProbe) bounded heap — this pins
    // the heap against probesUdf's full-sort reference at depths the
    // small-K tests never reach, on a codebook built to collide
    // (components quantized to 1/4, so many exact dot ties exercise
    // the (neg, idx) tie order through the heap's sift paths)
    val k = 512
    val dim = 8
    val cs = Array.tabulate(k, dim)((c, d) =>
      math.floor(math.sin(c * 0.7 + d * 1.3) * 4.0) / 4.0)
    val vecs = spark.range(0, 200).select(col("id").as("vec_id"),
      array((0 until dim).map(d =>
        round(sin(col("id") * lit(0.37 + d * 0.11)) * 4.0) / 4.0): _*).as("v"))
    for (nProbe <- Seq(1, 13, 128, 512)) {
      val both = vecs
        .withColumn("native", probesNative(col("v"), cs, nProbe))
        .withColumn("udf", Ann.probesUdf(cs, nProbe)(col("v")))
        .select("vec_id", "native", "udf").collect()
      val diff = both.filter(r => r.getSeq[Int](1) != r.getSeq[Int](2))
      assert(diff.isEmpty,
        s"nProbe=$nProbe: ${diff.length} rows differ, " +
          s"e.g. ${diff.take(2).mkString(", ")}")
    }
  }

  test("signBitsNative matches signBitsUdf bit-for-bit on the real corpus") {
    import graft.plans.VectorExpressions.signBitsNative
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val both = corpus
        .withColumn("native", signBitsNative(col("v")))
        .withColumn("udf", Ann.signBitsUdf(col("v")))
        .select("vec_id", "native", "udf").collect()
      assert(both.nonEmpty)
      val diff = both.filter(r => r.getLong(1) != r.getLong(2))
      assert(diff.isEmpty,
        s"${diff.length} rows pack differently, e.g. ${diff.take(3).mkString(", ")}")
    } finally corpus.unpersist()
    // adversarial: zeros pack 0 bits (strict >), short vectors pack
    // what they have, negatives never set a bit
    val edge = spark.sql(
      "SELECT array(0.0D, -1.0D, 1e-300D, -0.0D, 5.0D) AS v")
      .select(signBitsNative(col("v")).as("n"), Ann.signBitsUdf(col("v")).as("u"))
      .head()
    assert(edge.getLong(0) === edge.getLong(1))
    assert(edge.getLong(0) === ((1L << 2) | (1L << 4)))
  }

  test("int8 codes/scale/dot natives match quantizeUdf/quantDotUdf exactly") {
    import graft.plans.VectorExpressions.{int8CodesNative, int8DotNative, int8ScaleNative}
    val corpus = Ann.emb(spark, sf).cache()
    try {
      val both = corpus
        .withColumn("qz", Ann.quantizeUdf(col("v")))
        .select(col("vec_id"),
          int8CodesNative(col("v")).as("nc"), col("qz._1").as("uc"),
          int8ScaleNative(col("v")).as("ns"), col("qz._2").as("us"))
        .collect()
      assert(both.nonEmpty)
      val diff = both.filter(r =>
        !java.util.Arrays.equals(r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2)) ||
          r.getDouble(3) != r.getDouble(4))
      assert(diff.isEmpty,
        s"${diff.length} rows quantize differently, e.g. ${diff.take(3).mkString(", ")}")
      // the full scoring chain (raw long dot ÷ scale product) equals
      // the UDF's double on every corpus pair against one query
      val q = both.head
      val scored = corpus.limit(200)
        .select(col("vec_id"),
          (int8DotNative(int8CodesNative(col("v")), lit(q.getAs[Array[Byte]](1)))
            .cast("double") / (int8ScaleNative(col("v")) * lit(q.getDouble(3))))
            .as("native"),
          Ann.quantDotUdf(int8CodesNative(col("v")), lit(q.getAs[Array[Byte]](1)),
            int8ScaleNative(col("v")), lit(q.getDouble(3))).as("udf"))
        .collect()
      val sdiff = scored.filter(r => r.getDouble(1) != r.getDouble(2))
      assert(sdiff.isEmpty,
        s"${sdiff.length} scores differ, e.g. ${sdiff.take(3).mkString(", ")}")
    } finally corpus.unpersist()
    // adversarial: the negative-half round (floor(x+0.5), not a
    // library round) and the zero vector's 1e-30 floor
    val edge = spark.sql(
      "SELECT array(-0.5D, 0.5D, -1.5D, 1.0D) AS v, array(0.0D, 0.0D) AS z")
      .select(int8CodesNative(col("v")).as("nc"),
        Ann.quantizeUdf(col("v")).getField("_1").as("uc"),
        int8ScaleNative(col("z")).as("zs"),
        Ann.quantizeUdf(col("z")).getField("_2").as("zu"))
      .head()
    assert(java.util.Arrays.equals(edge.getAs[Array[Byte]](0), edge.getAs[Array[Byte]](1)))
    assert(edge.getDouble(2) === edge.getDouble(3))
  }

  test("the binary and int8 build/score stages plan as codegen, not ScalaUDF") {
    import graft.plans.VectorExpressions.{int8CodesNative, int8DotNative, int8ScaleNative, signBitsNative}
    val corpus = Ann.emb(spark, sf)
    val staged = corpus.select(col("vec_id"),
      signBitsNative(col("v")).as("w"),
      int8CodesNative(col("v")).as("qv8"),
      int8ScaleNative(col("v")).as("scale"))
    val plan = staged.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"binary/int8 build must not plan a ScalaUDF:\n$plan")
    val scored = staged.as("a").join(staged.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select((int8DotNative(col("a.qv8"), col("b.qv8")).cast("double") /
        (col("a.scale") * col("b.scale"))).as("qscore"))
    val splan = scored.queryExecution.executedPlan.toString
    assert(!splan.contains("ScalaUDF"),
      s"int8 scoring must not plan a ScalaUDF:\n$splan")
  }
}
