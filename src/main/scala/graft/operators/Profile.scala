package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling and weighted sampling (SURVEY.md §2.2) — the
  * two "look at the data before training on it" primitives.
  */
object Profile {

  /** One-pass column profile of `orders` — the ANALYZE-TABLE shape:
    * per column, row/null/exact-distinct counts plus numeric min/max
    * (timestamps as epoch-µs doubles; varchar min/max left NULL —
    * string rendering differs across engines, so a profile that must
    * be engine-portable carries numeric bounds only).
    *
    * Plan shape: ONE aggregation over one scan. The multiple exact
    * COUNT(DISTINCT) columns make Catalyst plan a single Expand
    * (scan rows × #distinct-aggs into one shuffle) — the standard
    * multi-distinct plan; at 100 TB the same profile would swap
    * exact distinct for approx_count_distinct and drop the Expand,
    * which is a one-line change per column (q_approx_distinct shows
    * that path's accuracy contract). The wide one-row aggregate is
    * then exploded into the long (col, stats) form — driver never
    * touches data.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    // stored timestamps are NTZ; the UTC session makes the LTZ cast a
    // plain reinterpretation, so epoch-µs matches DuckDB's epoch_us
    def micros(c: Column): Column = unix_micros(c.cast("timestamp")).cast("double")
    val wide = o.agg(
      cnt.as("n_rows"),
      count(col("o_orderkey")).as("k_nn"), countDistinct(col("o_orderkey")).as("k_nd"),
      min(col("o_orderkey")).cast("double").as("k_min"), max(col("o_orderkey")).cast("double").as("k_max"),
      count(col("o_custkey")).as("c_nn"), countDistinct(col("o_custkey")).as("c_nd"),
      min(col("o_custkey")).cast("double").as("c_min"), max(col("o_custkey")).cast("double").as("c_max"),
      count(col("o_totalprice")).as("p_nn"), countDistinct(col("o_totalprice")).as("p_nd"),
      min(col("o_totalprice")).cast("double").as("p_min"), max(col("o_totalprice")).cast("double").as("p_max"),
      count(col("o_orderdate")).as("d_nn"), countDistinct(col("o_orderdate")).as("d_nd"),
      micros(min(col("o_orderdate"))).as("d_min"), micros(max(col("o_orderdate"))).as("d_max"),
      count(col("o_orderstatus")).as("s_nn"), countDistinct(col("o_orderstatus")).as("s_nd"),
      count(col("o_orderpriority")).as("pr_nn"), countDistinct(col("o_orderpriority")).as("pr_nd"))
    def row(name: String, nn: String, nd: String, mn: Column, mx: Column) =
      struct(lit(name).as("col_name"), col("n_rows"),
        (col("n_rows") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
        mn.cast("double").as("min_d"), mx.cast("double").as("max_d"))
    val nul = lit(null).cast("double")
    wide.select(explode(array(
        row("o_orderkey", "k_nn", "k_nd", col("k_min"), col("k_max")),
        row("o_custkey", "c_nn", "c_nd", col("c_min"), col("c_max")),
        row("o_totalprice", "p_nn", "p_nd", col("p_min"), col("p_max")),
        row("o_orderdate", "d_nn", "d_nd", col("d_min"), col("d_max")),
        row("o_orderstatus", "s_nn", "s_nd", nul, nul),
        row("o_orderpriority", "pr_nn", "pr_nd", nul, nul))).as("r"))
      .select(col("r.*"))
  }

  /** Weighted sample without replacement — Duffield–Lund–Thorup
    * PRIORITY SAMPLING (JACM '07): each row gets priority w/u for a
    * uniform u, the k largest priorities are the sample (their
    * subset-sum estimator is unbiased with near-optimal variance).
    *
    * Determinism: u is splitmix64(o_orderkey) — a per-row pure
    * function, so the sample is reproducible across engines, runs,
    * and partitionings (no rand()). All arithmetic is integer:
    * u32 = (h >>> 33) + 1 ∈ [1, 2^31], w in exact cents,
    * priority = (cents · 2^31) div u32 — the oracle replays the hash
    * chain in HUGEINT SQL and the division exactly.
    *
    * Plan shape: one narrow pass to attach priorities, then a
    * TakeOrderedAndProject top-k — per-partition heaps, no global
    * sort, no shuffle of the losers; the 100 TB plan is identical.
    */
  def qWeightedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val o = t(spark, dir, "orders")
    val h = graft.functions.Signatures.splitmixUdf(col("o_orderkey"))
    o.select(col("o_orderkey"), col("o_totalprice"),
        (shiftrightunsigned(h, 33) + 1L).as("u32"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .select(col("o_orderkey"), col("o_totalprice"),
        expr("(cents * 2147483648L) DIV u32").as("priority"))
      .orderBy(col("priority").desc, col("o_orderkey").asc)
      .limit(k)
  }
}
