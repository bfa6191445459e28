package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared builder for the (order, part) incidence behind every
  * co-occurrence pair self-join — mr_pagerank, graph_triangles,
  * graph_bfs and q_market_basket all join this table with itself on
  * l_orderkey, so an order (basket) with m distinct parts emits
  * O(m²) pair rows. On TPC-H-shaped data baskets are ≤7 rows and the
  * join is invisible; ONE pathological 100k-part order would emit
  * 10¹⁰ pairs from a single key — the same mass-duplicate quadratic
  * the dedup family caps everywhere (shingle df cap, LSH band-cell
  * caps, SRP relative cell cap). This is the matching guard for the
  * graph/basket family.
  *
  * Guard shape: baskets above [[MaxBasket]] are deterministically
  * SAMPLED down to the cap (lowest xxhash64(order, part) ranks win),
  * not dropped — a hot order keeps a bounded, unbiased slice of its
  * co-occurrence signal instead of vanishing from the graph. The
  * basket-size aggregate is map-side partial (duplicate (o,p) rows
  * collapse before the shuffle), the hot set is aggregated-tiny
  * (normally EMPTY), and the rank window runs only over hot baskets'
  * rows — zero cost when the cap is non-binding. Per the §5
  * no-silent-caps policy the dropped volume is a first-class
  * oracle-checked query ([[capAudit]], registered as
  * q_basket_cap_audit) rather than a log line: it reports 0 hot
  * baskets on the test corpora, which is also the proof the four
  * graph/basket oracles are unaffected by the guard.
  */
object Incidence {

  /** Per-order distinct-part cap. One order contributes at most
    * cap² ≈ 10⁶ pair rows (vs 10¹⁰ for a raw 100k-part basket).
    * 1000 sits ~140× above the largest real basket (7 distinct parts
    * per order at every TPC-H SF — basket size is a per-order
    * property of the schema, not a scale-dependent quantity, so the
    * margin HOLDS at 100 TB; only corrupt/adversarial feeds cross it).
    */
  val MaxBasket = 1000

  /** Distinct (l_orderkey, l_partkey) incidence with the hot-basket
    * guard applied, materialized once (every caller immediately
    * self-joins it at least twice; the localCheckpoint is the same
    * multi-consumer policy as triangles' oriented edge set).
    */
  def capped(spark: SparkSession, dir: String, cap: Int = MaxBasket): DataFrame =
    cappedFrom(t(spark, dir, "lineitem"), cap)

  /** Same guard over an arbitrary (l_orderkey, l_partkey)-shaped
    * input — the spec entry point (synthetic hot-basket corpora).
    */
  private[graft] def cappedFrom(li: DataFrame, cap: Int): DataFrame = {
    // r13 optimization (guide §2.4 "remove shuffles outright"): the
    // previous form paid FOUR exchanges and TWO materializations —
    // distinct() (exchange on (o, p)) + checkpoint, a groupBy for the
    // hot set (exchange), an anti-join + hot-side join/union, and a
    // final repartition(o) (exchange) + checkpoint. One pinned
    // repartition on l_orderkey up front makes everything downstream
    // exchange-free: the dedup aggregate's required clustering on
    // (o, p) is satisfied by hash(o) (subset rule), and the rank
    // window's clustering on o likewise — so distinct-collapse, the
    // hot-basket cap and the caller-wanted hash(o) layout all ride
    // ONE exchange and ONE materialization. The cap now applies as a
    // single rank window over every basket (the anti-join fast path
    // saved the rank sort on normal rows but cost two extra exchanges
    // — a bad trade, measured): rank ≤ cap keeps normal baskets whole
    // (their size never exceeds cap) and samples hot ones by the
    // identical (xxhash64(o, p), p) rule as before, so the OUTPUT SET
    // is unchanged row for row. The explicit partition count pins the
    // exchange at the configured shuffle width (AQE would coalesce
    // this small-bytes exchange under the per-row cost of the pair
    // self-joins every caller runs on it).
    val p = pinnedShufflePartitions(li)
    li.select("l_orderkey", "l_partkey")
      .repartition(p, col("l_orderkey"))
      .dropDuplicates("l_orderkey", "l_partkey")
      .withColumn("rk", row_number().over(
        Window.partitionBy("l_orderkey")
          .orderBy(xxhash64(col("l_orderkey"), col("l_partkey")), col("l_partkey"))))
      .filter(col("rk") <= cap)
      .drop("rk")
      .localCheckpoint()
  }

  /** No-silent-caps audit: how many baskets exceed the cap, how many
    * incidence rows the sample would shed, and the observed maximum —
    * the cap-margin evidence (max_basket = 7 vs cap 1000 on testdata).
    */
  def capAudit(spark: SparkSession, dir: String, cap: Int = MaxBasket): DataFrame =
    t(spark, dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_orderkey").agg(cnt.as("basket_sz"))
      .agg(
        sum(when(col("basket_sz") > cap, 1L).otherwise(0L)).as("n_hot_baskets"),
        sum(when(col("basket_sz") > cap, col("basket_sz") - cap).otherwise(0L))
          .as("rows_dropped"),
        max(col("basket_sz")).as("max_basket"))
}
