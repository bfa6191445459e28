package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The reference's MapReduce job surface re-expressed over the driver
  * testdata (SURVEY.md §2.1). Word count / sort / grep / inverted
  * index / histogram are the canonical MapReduce workloads; each here
  * is a single declarative plan with map-side partial aggregation
  * where the reference had combiner-less shuffles.
  */
object MRJobs {

  /** documents is a single parquet file locally → fan the tokenize/
    * explode stage out to all cores (no-op cost on a multi-split
    * cluster scan).
    */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").repartition(spark.sparkContext.defaultParallelism)

  /** Word count over documents.text with the reference tokenizer
    * (mapreduce.c:94 do_map + :176 do_reduce + :352 do_merge order).
    */
  def wordcount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(explode(graft.functions.Signatures.refTokensFast(col("text"))).as("word"))
      .groupBy("word")
      .agg(cnt.as("n"))
      .orderBy(col("n").desc, col("word").desc)

  /** Distributed total-order sort (reference --sort mode: range
    * partition + per-partition sort + ordered concat).
    */
  def numbersort(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_extendedprice"))
      .orderBy(col("l_extendedprice").asc)

  /** Map-only distributed grep. */
  def grep(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("text").contains("spark"))
      .select("doc_id", "lang", "n_chars")

  /** Inverted index: word → distinct docs + total occurrences. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(graft.functions.Signatures.refTokensFast(col("text"))).as("word"))
      .groupBy("word")
      .agg(countDistinct("doc_id").cast("long").as("n_docs"), cnt.as("n_occurrences"))

  /** Range-bucket histogram — the do_sort_map partitioner
    * (mapreduce.c:162-166, uniform-width buckets) as an aggregation.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(floor(col("l_extendedprice") / 10000.0).cast("long").as("bucket"))
      .agg(cnt.as("n"))
}
