package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Complex-type battery (SURVEY.md §2.2 continued): native JSON
  * parsing (from_json, not regex), array functions, and map
  * construction/explosion. All narrow codegen expressions; the only
  * shuffles are the final aggregates. Array-valued results are
  * emitted as joined strings so the oracle harness can hash them.
  */
object ComplexTypes {

  /** Typed JSON parsing: from_json with an explicit schema (the
    * codegen JSON path — q_json_extract's regexp variant exists for
    * engines without a parser; this is the native one).
    */
  def qJsonTyped(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_mod"))
      .agg(cnt.as("n"), min("k").as("min_k"), max("k").as("max_k"))

  /** Array-function battery over tokenized part names: size, sort,
    * membership, slicing, distinct.
    */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_name"), " ")
    t(spark, dir, "part").select(
      col("p_partkey"),
      size(words).cast("long").as("n_words"),
      concat_ws(",", sort_array(words)).as("sorted_words"),
      array_contains(words, "green").as("has_green"),
      concat_ws(",", slice(words, 1, 2)).as("first_two"),
      size(array_distinct(words)).cast("long").as("n_distinct_words"))
  }

  /** Map construction + explosion round-trip: per-priority status
    * counts collected into a map column (struct collect →
    * map_from_entries), then exploded back to rows — the
    * build-a-keyed-summary-then-fan-out shape.
    */
  def qMapOps(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .groupBy("o_orderpriority", "o_orderstatus").agg(cnt.as("n"))
    base.groupBy("o_orderpriority")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("o_orderstatus"), col("n"))))).as("m"))
      .select(col("o_orderpriority"), explode(col("m")))
      .select(col("o_orderpriority"), col("key").as("o_orderstatus"), col("value").as("n"))
  }
}
