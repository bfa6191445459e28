package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured constants for the round-12 capabilities (SURVEY §5's
  * artifact-per-claim rule):
  *
  *  1. SIGN-BIT PACKING AS CODEGEN: the last two per-row ScalaUDF
  *     families in the vector hot path (round-11 verdict finding #2)
  *     — signBitsUdf and quantizeUdf/quantDotUdf — replaced by
  *     whole-stage-codegen expressions. Same flop count, no Seq
  *     boxing or catalyst↔scala conversion per row. Measured on a
  *     synthetic 2M × dim-64 corpus: isolated pass over the packing /
  *     quantization stage, then the int8 scoring pass over a 2M-pair
  *     candidate join. MEASURED (local[32], min of 3; two runs):
  *       sign_bits     native 0.15–0.31 s vs udf 1.1–1.6 s — 5–8×
  *       int8_quantize native 0.15–0.28 s vs udf 0.5–0.7 s — 2.6–3.4×
  *       int8_dot      native 0.10–0.14 s vs udf 0.11–0.22 s — 1.0–1.5×
  *     The dot shows little isolated win (honest note: per-pair work
  *     is one 64-byte loop either way and the join dominates); it
  *     moves anyway so the whole scoring projection stays in one
  *     whole-stage-codegen span with no ScalaUDF boundary.
  *
  *  2. PROBE-SELECTION HEAP (SURVEY gap #2, round-11 verdict missing
  *     #4): ProbeCentroids' nProbe-list selection from an
  *     O(K·nProbe) repeated scan to an O(K log nProbe) bounded
  *     worst-at-root heap with the identical (neg, idx) total order.
  *     MEASURED at the 2^18-list ceiling (nProbe = K/32 = 8192),
  *     selection loops alone, one query row:
  *       heap 0.0087 s vs scan 5.3 s — 605×, identical output
  *     (below ~1k lists both are sub-millisecond noise — the heap
  *     matters exactly where the two-level quantizer's list counts
  *     live, past ~32M corpus rows).
  *
  * Run: `tools/runmain.sh graft.ProbeRound12` (self-contained
  * synthetic corpus).
  */
object ProbeRound12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plans.VectorExpressions.{int8CodesNative, int8DotNative, int8ScaleNative, signBitsNative}
    import graft.similarity.Ann.{quantDotUdf, quantizeUdf, signBitsUdf}

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(n: Int)(f: => Unit): Double = (1 to n).map(_ => timed(f)).min

    // deterministic synthetic corpus: 2M rows × 64 dims (the
    // embeddings table's dim), values spanning signs and magnitudes
    val n = 2000000L
    val corpus = spark.range(0, n).select(col("id").as("vec_id"),
      array((0 until 64).map(d =>
        sin(col("id") * lit(0.37 + d * 0.011)) * lit(1.0 + d % 5)): _*).as("v"))
      .localCheckpoint()

    // warm codegen + JIT on both paths (bit_count keeps the forcing
    // aggregate inside long range — raw sign words sum past 2^63)
    corpus.limit(100000).select(sum(bit_count(signBitsNative(col("v"))))).collect()
    corpus.limit(100000).select(sum(bit_count(signBitsUdf(col("v"))))).collect()

    val tSignN = best(3)(corpus.select(sum(bit_count(signBitsNative(col("v"))))).collect())
    val tSignU = best(3)(corpus.select(sum(bit_count(signBitsUdf(col("v"))))).collect())
    println(f"[probe-r12] sign_bits 2M x 64: native $tSignN%.3f s, " +
      f"udf $tSignU%.3f s, speedup ${tSignU / tSignN}%.1fx")

    val tQzN = best(3)(corpus.select(
      sum(length(int8CodesNative(col("v")))), sum(int8ScaleNative(col("v")))).collect())
    val tQzU = best(3)(corpus.select(
      sum(length(quantizeUdf(col("v")).getField("_1"))),
      sum(quantizeUdf(col("v")).getField("_2"))).collect())
    println(f"[probe-r12] int8_quantize 2M x 64: native $tQzN%.3f s, " +
      f"udf $tQzU%.3f s, speedup ${tQzU / tQzN}%.1fx")

    // scoring pass: 2M candidate pairs against one broadcast query
    val staged = corpus.select(col("vec_id"),
      int8CodesNative(col("v")).as("qv8"), int8ScaleNative(col("v")).as("scale"))
      .localCheckpoint()
    val q = staged.limit(1).collect().head
    val qc = q.getAs[Array[Byte]](1)
    val qs = q.getDouble(2)
    staged.select(sum((int8DotNative(col("qv8"), lit(qc)).cast("double") /
      (col("scale") * lit(qs)))).as("s")).collect() // warm
    val tDotN = best(3)(staged.select(
      sum(int8DotNative(col("qv8"), lit(qc)).cast("double") /
        (col("scale") * lit(qs)))).collect())
    val tDotU = best(3)(staged.select(
      sum(quantDotUdf(col("qv8"), lit(qc), col("scale"), lit(qs)))).collect())
    println(f"[probe-r12] int8_dot 2M pairs: native $tDotN%.3f s, " +
      f"udf $tDotU%.3f s, speedup ${tDotU / tDotN}%.1fx")

    // 2. PROBE-SELECTION HEAP (SURVEY gap #2): the query-side
    // nProbe-list selection at the two-level quantizer's 2^18-list
    // ceiling. Driver-side micro-bench of the two SELECTION loops
    // alone (dots precomputed — they are O(K·dim) either way): the
    // retired O(K·nProbe) repeated scan vs the bounded heap now in
    // ProbeCentroids, at K = 2^18, nProbe = K/32 = 8192.
    {
      val k = 1 << 18
      val nProbe = k / 32
      val rnd = new scala.util.Random(42)
      val neg = Array.fill(k)(rnd.nextDouble() - 0.5)
      def scanSelect(): Array[Int] = {
        val used = new Array[Boolean](k)
        val out = new Array[Int](nProbe)
        var slot = 0
        while (slot < nProbe) {
          var bc = -1
          var c = 0
          while (c < k) {
            if (!used(c) && (bc < 0 || java.lang.Double.compare(neg(c), neg(bc)) < 0)) bc = c
            c += 1
          }
          used(bc) = true; out(slot) = bc; slot += 1
        }
        out
      }
      def heapSelect(): Array[Int] = {
        val hNeg = new Array[Double](nProbe)
        val hIdx = new Array[Int](nProbe)
        def worse(n1: Double, i1: Int, n2: Double, i2: Int): Boolean = {
          val cmp = java.lang.Double.compare(n1, n2)
          cmp > 0 || (cmp == 0 && i1 > i2)
        }
        def sift(root: Int, size: Int): Unit = {
          var p = root
          var done = false
          while (!done) {
            val l = 2 * p + 1; val r = l + 1; var w = p
            if (l < size && worse(hNeg(l), hIdx(l), hNeg(w), hIdx(w))) w = l
            if (r < size && worse(hNeg(r), hIdx(r), hNeg(w), hIdx(w))) w = r
            if (w == p) done = true
            else {
              val tn = hNeg(p); val ti = hIdx(p)
              hNeg(p) = hNeg(w); hIdx(p) = hIdx(w); hNeg(w) = tn; hIdx(w) = ti
              p = w
            }
          }
        }
        var c = 0
        while (c < nProbe) { hNeg(c) = neg(c); hIdx(c) = c; c += 1 }
        var h = nProbe / 2 - 1
        while (h >= 0) { sift(h, nProbe); h -= 1 }
        c = nProbe
        while (c < k) {
          if (worse(hNeg(0), hIdx(0), neg(c), c)) {
            hNeg(0) = neg(c); hIdx(0) = c; sift(0, nProbe)
          }
          c += 1
        }
        val out = new Array[Int](nProbe)
        var size = nProbe
        while (size > 0) {
          out(size - 1) = hIdx(0); size -= 1
          hNeg(0) = hNeg(size); hIdx(0) = hIdx(size); sift(0, size)
        }
        out
      }
      val heapOut = heapSelect() // warm + result
      val tHeap = best(3)(heapSelect())
      val tScan = timed(assert(scanSelect().sameElements(heapOut),
        "heap and scan must select the identical ordered probe list"))
      println(f"[probe-r12] probe_select K=2^18 nProbe=8192 (one row): " +
        f"heap $tHeap%.4f s, scan $tScan%.1f s, speedup ${tScan / tHeap}%.0fx")
    }

    spark.stop()
  }
}
