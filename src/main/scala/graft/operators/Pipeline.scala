package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Composed end-to-end corpus construction (SURVEY.md §2.3/§2.5
  * operators chained the way a nightly training-data build runs them):
  * quality-filter → exact-dedup → per-language corpus report.
  *
  * Scale shape: the quality stage is pure narrow codegen expressions
  * over the scan; the dedup stage groups on 16-byte (hash, length)
  * keys — the only shuffle that sees every surviving row; the report
  * aggregates the already-tiny canonical set. Nothing ever shuffles
  * document text.
  */
object Pipeline {

  val MinTokens = 20
  val MaxTokens = 5000
  val MinAlphaRatio = 0.815

  def corpusBuild(spark: SparkSession, dir: String): DataFrame = {
    val stats = t(spark, dir, "documents").select(
      col("doc_id"), col("lang"), col("text"),
      nTokens(col("text")).as("n_tokens"),
      alphaRatio(col("text")).as("alpha_ratio"))
    val kept = stats.filter(
      col("n_tokens") >= MinTokens && col("n_tokens") <= MaxTokens &&
        col("alpha_ratio") > MinAlphaRatio)
    val canon = kept
      .groupBy(xxhash64(col("text")).as("h"), length(col("text")).as("len"))
      .agg(
        min("doc_id").as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_tokens"), col("doc_id")).as("n_tokens"))
    canon.groupBy("lang")
      .agg(cnt.as("n_docs"), sum("n_tokens").cast("long").as("n_tokens"))
  }
}
