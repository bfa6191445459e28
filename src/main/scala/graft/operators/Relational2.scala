package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational battery (SURVEY.md §2.2 continued): window
  * frames, decorrelated subqueries, array aggregation, grouping sets,
  * null semantics, sampling.
  */
object Relational2 {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** 7-row moving average over the daily order-total series. Window
    * sums go through DECIMAL so the sliding aggregation is exact and
    * engine-independent (segment-tree vs running-sum implementations
    * differ in float rounding). Note: the final series is one window
    * partition — at 100 TB you'd process the (tiny) daily aggregate on
    * one node anyway, the heavy groupBy below is what distributes.
    */
  def qMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sumMoney(col("o_totalprice")).as("total"))
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    daily.withColumn("ma7",
      sum(dec(col("total"))).over(w).cast("double") / count(lit(1)).over(w))
  }

  /** ntile + percent_rank over a deterministic total order — WITHOUT
    * the single-partition global window: [[TotalOrderRank]] computes
    * the global rank with range partitioning + broadcast offsets +
    * parallel per-partition windows, and the ntile bucket /
    * percent_rank derive arithmetically from (rank, n). Bit-equal to
    * the single-window formulation because the composite sort key is
    * unique (rank == row_number, ntile is positional).
    */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val keys = Seq(col("o_totalprice").asc, col("o_orderkey").asc)
    TotalOrderRank.withGlobalRank(spark,
        t(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
        keys, "_r", keepTotal = true)
      .select(col("o_orderkey"),
        TotalOrderRank.ntileFromRank(col("_r"), col("_n"), 4).as("quartile"),
        TotalOrderRank.percentRankFromRank(col("_r"), col("_n")).as("pct_rank"))
  }

  /** cume_dist over a deterministic total order — the second consumer
    * of [[TotalOrderRank]] (rank/n under a unique key is exactly SQL
    * cume_dist); distributed like q_ntile, never a single-partition
    * window.
    */
  def qCumeDist(spark: SparkSession, dir: String): DataFrame =
    TotalOrderRank.withGlobalRank(spark,
        t(spark, dir, "customer").select("c_custkey", "c_acctbal"),
        Seq(col("c_acctbal").asc, col("c_custkey").asc), "_r", keepTotal = true)
      .select(col("c_custkey"), col("c_acctbal"),
        (col("_r").cast("double") / col("_n").cast("double")).as("cume"))

  /** Correlated aggregate subquery (orders above their own customer's
    * average), decorrelated to a window computation — one shuffle on
    * o_custkey instead of a per-row subquery.
    */
  def qCorrelatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    t(spark, dir, "orders")
      .withColumn("cavg",
        sum(dec(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("cavg"))
      .groupBy("o_orderpriority")
      .agg(cnt.as("n"))
  }

  /** Array aggregation: per-order sorted line numbers. sort_array makes
    * collect_list deterministic under any partitioning; the array is
    * emitted as a comma-joined string so the result is hashable by the
    * oracle harness (pandas cannot sort raw array cells).
    */
  def qArrayAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("lines"),
        cnt.as("n_lines"))

  /** NULL-semantics battery: nullif/coalesce/conditional null. */
  def qNullFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("IS_BUILDING")).as("seg2"),
      when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("pos_bal"),
      col("c_acctbal").isNull.cast("long").as("bal_is_null"))

  /** Small-dims cross join (BroadcastNestedLoop by construction). */
  def qCrossJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "region").crossJoin(broadcast(t(spark, dir, "nation")))
      .select("r_name", "n_name")

  /** CUBE grouping sets over two dimensions. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(cnt.as("n"), sumMoney(col("o_totalprice")).as("total"))

  /** Sketch aggregation: HyperLogLog++ distinct counts next to exact
    * ones. The raw estimate is engine-specific (no cross-engine value
    * to compare), so the output carries the sketch's ACCURACY CONTRACT
    * — |approx−exact|/exact < 5% — as a checked boolean: the oracle
    * asserts the contract holds per group, which gate-fails if the
    * sketch ever degrades, while the spec still bounds the raw error.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).cast("long").as("approx_parts"),
        countDistinct(col("l_partkey")).cast("long").as("exact_parts"),
        cnt.as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") < 0.05).as("sketch_within_5pct"))

  /** Statistical aggregates — variance/stddev/correlation computed
    * from exact DECIMAL power sums, then combined in double arithmetic
    * with an identical op sequence on both engines. The built-in
    * stddev/corr use streaming (Welford/merge) updates whose float
    * rounding depends on partition order — unreproducible at scale.
    */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    // Quantize to integer cents/units first (NOTE: the shipped prices
    // carry sub-cent noise, so the statistics are of the cent-quantized
    // series — both engines quantize identically, which is the point).
    // Power sums then stay exact DECIMAL: no mid-chain decimal rounding
    // whose HALF_UP/HALF_EVEN mode differs across engines.
    val cx = round(col("l_extendedprice") * 100).cast(DecimalType(18, 0))
    val qy = round(col("l_quantity")).cast(DecimalType(18, 0))
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        cnt.as("n"),
        (sum(cx).cast("double") / 100.0).as("sum_x"),
        (sum(cx * cx).cast("double") / 10000.0).as("sum_xx"),
        (sum(cx * qy).cast("double") / 100.0).as("sum_xy"),
        sum(qy).cast("double").as("sum_y"),
        sum(qy * qy).cast("double").as("sum_yy"))
      .select(
        col("l_returnflag"), col("n"),
        (col("sum_x") / col("n")).as("mean_x"),
        // NULLIF guards: n=1 groups and zero-variance denominators must
        // yield NULL (as the oracle does), not an ANSI DIVIDE_BY_ZERO
        ((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) /
          nullif((col("n") - 1).cast("double"), lit(0.0))).as("var_x"),
        sqrt((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) /
          nullif((col("n") - 1).cast("double"), lit(0.0))).as("stddev_x"),
        ((col("sum_xy") - col("sum_x") * col("sum_y") / col("n")) /
          nullif(sqrt(col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) *
            sqrt(col("sum_yy") - col("sum_y") * col("sum_y") / col("n")), lit(0.0))).as("corr_xy"))
  }

  /** arg_max/arg_min with a composite (value, key) comparator so ties
    * resolve deterministically.
    */
  def qArgMax(spark: SparkSession, dir: String): DataFrame = {
    // Deterministic (price, key) comparator without struct support in
    // DuckDB's arg_max: price quantized to EXACT 1e-4 units via round()
    // (a bare double→DECIMAL cast rounds HALF_UP in Spark but by binary
    // value in DuckDB), then shifted left by 1e13 — far above any key —
    // so the key term can never outweigh a real price difference.
    val composite = round(col("o_totalprice") * 10000).cast(DecimalType(38, 0)) *
      lit(10000000000000L) + col("o_orderkey")
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        max_by(col("o_orderkey"), composite).as("top_order"),
        min_by(col("o_orderkey"), composite).as("bottom_order"),
        cnt.as("n"))
  }

  /** Window navigation battery: lag/lead/first/last over a total
    * per-user event order.
    */
  def qWindowNav(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "events").select(
      col("event_id"),
      col("user_id"),
      lag("value", 1).over(w).as("prev_value"),
      lead("value", 1).over(w).as("next_value"),
      first("value").over(full).as("first_value"),
      last("value").over(full).as("last_value"))
  }

  /** Ordered string aggregation (LISTAGG/string_agg shape). */
  def qStringAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        cnt.as("n_nations"))

  /** Regex battery: rlike + extract + count. */
  def qRegex(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      col("p_type").rlike("^ECONOMY|PROMO").cast("boolean").as("is_cheap_line"),
      regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_word"),
      size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))).cast("long").as("vowel_runs"))

  /** HAVING: post-aggregation filter on the aggregate value. */
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sumMoney(col("l_quantity")).as("total_qty"), cnt.as("n"))
      .filter(col("total_qty") > 500.0)

  /** FULL OUTER join between per-user event aggregates and the
    * customer dimension — classifies rows into both/left-only/
    * right-only sides.
    */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ue = t(spark, dir, "events").groupBy("user_id").agg(cnt.as("n_events"))
    val c = t(spark, dir, "customer").select(col("c_custkey"))
    ue.join(c, col("user_id") === col("c_custkey"), "full_outer")
      .select(
        when(col("user_id").isNull, lit("cust_only"))
          .when(col("c_custkey").isNull, lit("event_only"))
          .otherwise(lit("both")).as("side"))
      .groupBy("side").agg(cnt.as("n"))
  }

  /** Native top-k-per-group through the custom logical/physical
    * operator (graft.plans.TopKPerGroup): bounded heaps, no window
    * sort. Same semantics as row_number()<=k, oracle-checked.
    */
  def qTopkNative(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerGroup(
      t(spark, dir, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice"),
      Seq("o_orderpriority"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)

  /** Deterministic systematic sample (hash-free modulus on the key —
    * reproducible across engines, unlike TABLESAMPLE randomness).
    */
  def qSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(20)) === 0)
      .groupBy("l_returnflag")
      .agg(cnt.as("n"), sumMoney(col("l_extendedprice")).as("sum_price"))

  /** Explicit GROUPING SETS (beyond cube/rollup): each-dimension-alone
    * plus the grand total, with grouping_id disambiguating aggregation
    * NULLs from data NULLs. One Expand + one shuffle, not a union of
    * separate aggregations.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"), cnt.as("n"),
        sumMoney(col("o_totalprice")).as("total"))

  /** Unpivot/melt: wide measure columns to (measure, value) rows —
    * a narrow per-row transform, no shuffle.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")

  /** RANGE window frame: trailing-90-day spend per customer at each
    * order. Peers at the same instant all enter the frame — semantics
    * a ROWS frame can't express. Ordered by exact epoch seconds so the
    * frame bound arithmetic is integral on both engines.
    */
  def qRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("ts_s"))
      .rangeBetween(-90L * 86400L, 0L)
    t(spark, dir, "orders")
      .withColumn("ts_s", unix_timestamp(col("o_orderdate")))
      .select(col("o_orderkey"), col("o_custkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("trailing_90d"))
  }

  /** Lateral explode with position (LATERAL VIEW posexplode shape):
    * one output row per array element, 1-based position.
    */
  def qExplode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), posexplode(split(col("p_name"), " ")))
      .select(col("p_partkey"), (col("pos") + 1).cast("long").as("pos"), col("col").as("word"))

  /** Bag-semantics set operations: INTERSECT ALL / EXCEPT ALL keep
    * duplicate multiplicity (the plain variants dedup).
    */
  def qSetopsAll(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING").select("o_custkey")
    val big = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0).select(col("o_custkey"))
    building.intersectAll(big).withColumn("tag", lit("both_all"))
      .unionByName(building.exceptAll(big).withColumn("tag", lit("only_building_all")))
      .groupBy("tag", "o_custkey").agg(cnt.as("n"))
  }

  /** Conditional/boolean aggregates: count_if, bool_and, bool_or. */
  def qCondAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count_if(col("l_quantity") > 25.0).cast("long").as("n_bulk"),
        bool_and(col("l_discount") <= 0.1).as("all_low_disc"),
        bool_or(col("l_tax") > 0.07).as("any_high_tax"),
        cnt.as("n"))

  /** Bitwise aggregates over integer keys. */
  def qBitAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        bit_and(col("l_linenumber")).cast("long").as("band"),
        bit_or(col("l_linenumber")).cast("long").as("bor"),
        bit_xor(col("l_linenumber")).cast("long").as("bxor"),
        cnt.as("n"))

  /** Exact median per group (interpolated, = quantile_cont 0.5). */
  def qMedian(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(median(col("o_totalprice")).as("median_price"), cnt.as("n"))

  /** Heavy-hitters (frequent-items) sketch next to its exact twin —
    * the third approx/exact pair after q_approx_distinct and
    * q_approx_percentile. `stat.freqItems` is the one-pass
    * Karp/Shenker/Papadimitriou counter: a single scan, mergeable,
    * with the GUARANTEE that every value of support ≥ s is returned
    * (false positives possible, false negatives not). The oracle
    * checks exactly that contract: each exactly-frequent value carries
    * in_sketch=TRUE. The sketch itself is ≤ 1/s values — the only
    * driver-side data.
    */
  def qFreqItems(spark: SparkSession, dir: String, support: Double = 0.015): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_quantity").cast("int").as("q"))
    val sketch = li.stat.freqItems(Seq("q"), support)
      .collect()(0).getSeq[Int](0)
    val total = li.agg(cnt.as("total"))
    li.groupBy("q").agg(cnt.as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n").cast("double") / col("total").cast("double") >= support)
      .select(col("q").cast("long").as("quantity"), col("n"),
        col("q").isin(sketch: _*).as("in_sketch"))
  }

  /** Mergeable-sketch RE-aggregation — the pattern that matters at
    * 100 TB: per-group DataSketches HLL sketches are materialized once
    * (in production: stored in a partial-aggregate table), then the
    * global estimate comes from `hll_union_agg` over the SKETCHES —
    * the raw fact table is never rescanned for the rollup. The oracle
    * checks the union estimate's accuracy contract against the exact
    * global distinct (within 5%), per the q_approx_distinct pattern.
    */
  def qHllUnion(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val unioned = per.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("est"),
      cnt.as("n_groups"))
    val exact = t(spark, dir, "lineitem")
      .agg(countDistinct(col("l_partkey")).cast("long").as("exact_parts"))
    unioned.crossJoin(broadcast(exact))
      .select(col("exact_parts"), col("n_groups"),
        (abs(col("est") - col("exact_parts")).cast("double") /
          col("exact_parts").cast("double") < 0.05).as("union_within_5pct"))
  }

  /** Approximate-percentile serving twin of [[Relational.qPercentile]]:
    * at 100 TB an exact per-group percentile is a per-group sort, while
    * `approx_percentile` (KLL/GK sketch) is a mergeable map-side
    * aggregate — the shape a dashboard query actually runs. The raw
    * sketch value is engine-internal, so the oracle checks the
    * sketch's RANK-ERROR CONTRACT instead (the q_approx_distinct
    * pattern): with default accuracy 10000 the rank error is 1e-4, so
    * the approx value must lie between the exact interpolated
    * quantiles at q∓0.01 — an engine-independent TRUE on both sides.
    */
  def qApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        // array forms: one sketch buffer + one sorted buffer per
        // group, not 2 + 4 separate aggregates
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D))").as("ap"),
        expr("percentile(l_extendedprice, array(0.49D, 0.51D, 0.89D, 0.91D))").as("ex"),
        cnt.as("n"))
      .select(col("l_returnflag"), col("n"),
        (col("ap").getItem(0) >= col("ex").getItem(0) &&
          col("ap").getItem(0) <= col("ex").getItem(1)).as("p50_in_rank_eps"),
        (col("ap").getItem(1) >= col("ex").getItem(2) &&
          col("ap").getItem(1) <= col("ex").getItem(3)).as("p90_in_rank_eps"))

  // per-JVM deserialized-sketch memo (keyed by the broadcast byte
  // array's identity) so the point-query UDF doesn't rebuild the
  // ~eps⁻¹-wide counter table per row. Unlike planeCache's bounded
  // (nPlanes, dim) key space, every invocation collects a FRESH byte
  // array → a fresh identity key, so the cache is explicitly bounded:
  // stale sketches are evicted rather than retained for the JVM's life
  private val cmsCache =
    new java.util.concurrent.ConcurrentHashMap[Array[Byte], org.apache.spark.util.sketch.CountMinSketch]()

  private def cmsFor(bytes: Array[Byte]): org.apache.spark.util.sketch.CountMinSketch = {
    if (cmsCache.size > 4) cmsCache.clear()
    cmsCache.computeIfAbsent(bytes, b =>
      org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
  }

  /** Count-Min-Sketch point-frequency serving: ONE mergeable sketch
    * aggregate over the fact table (map-side partial, counter-table
    * merge is commutative → partition-independent estimates), then
    * per-key frequency estimates from the broadcast sketch. At 100 TB
    * the sketch (w·d counters, ~100 KB at eps=1e-3) replaces a
    * key-cardinality-sized exact count table for "how often does X
    * occur" serving. The one-row sketch collect is the same
    * partial-aggregate handoff as qFreqItems' freqItems. Oracle checks
    * the CMS contracts: estimate ≥ exact ALWAYS (counters only add —
    * deterministic, so a hard boolean), and estimate ≤ exact + eps·N
    * for ≥ 90% of keys (holds per-key with prob `conf`; fixed seed +
    * fixed data make the realized fraction deterministic).
    */
  def qCountMin(spark: SparkSession, dir: String, eps: Double = 0.001,
      conf: Double = 0.99): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val bytes = li
      .agg(expr(s"count_min_sketch(l_suppkey, CAST($eps AS DOUBLE), CAST($conf AS DOUBLE), 42)"))
      .collect()(0).getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(bytes)
    val est = udf { (key: Long) => cmsFor(bc.value).estimateCount(key) }
    // N comes from the sketch itself (totalCount = rows it absorbed) —
    // no third fact-table scan just for a count
    val total = cmsFor(bytes).totalCount()
    li.groupBy("l_suppkey").agg(cnt.as("exact_n"))
      .select(col("l_suppkey"), col("exact_n"), lit(total).as("total"),
        est(col("l_suppkey")).as("cms_n"))
      .agg(
        cnt.as("n_keys"),
        min(col("cms_n") >= col("exact_n")).as("never_underestimates"),
        (sum(when(col("cms_n") <= col("exact_n") + ceil(lit(eps) * col("total")), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)) >= 0.9).as("mostly_within_eps"))
  }

  /** The from-scratch TypedImperativeAggregate end-to-end: per
    * priority, the 5 orders with the highest totalprice via
    * [[graft.plans.TopKByWeight]] — O(k) state per group, map-side
    * combined, shuffle carries ≤k pairs per partial (see the
    * aggregate's scaladoc). The result array is emitted as a joined
    * string so the oracle (a plain ORDER BY ... LIMIT list build)
    * hashes identically.
    */
  def qTopkWeighted(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("k"))
      .agg(array_join(
        graft.plans.TopKByWeight.topkBy(col("o_orderkey"), col("o_totalprice"), 5)
          .cast("array<string>"), ",").as("top_orders"))
}
