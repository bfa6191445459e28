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
  *     candidate join. MEASURED (local[32], min of 3):
  *       sign_bits     native 0.146 s vs udf 1.128 s —  7.7×
  *       int8_quantize native 0.154 s vs udf 0.524 s —  3.4×
  *       int8_dot      native 0.103 s vs udf 0.107 s —  1.0×
  *     The dot shows NO isolated win (honest note: per-pair work is
  *     one 64-byte loop either way and the join dominates); it moves
  *     anyway so the whole scoring projection stays in one
  *     whole-stage-codegen span with no ScalaUDF boundary.
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

    spark.stop()
  }
}
