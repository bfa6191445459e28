package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third relational batch (SURVEY.md §2.2): mode, windowed distinct
  * counting, and incremental aggregate maintenance.
  */
object Relational3 {

  /** Exact per-group mode with a DETERMINISTIC tie-break (highest
    * count, then lexicographically smallest value). Spark's built-in
    * `mode()` is tie-nondeterministic — the count + row_number form
    * is the portable contract, and it is two hash shuffles on keys
    * whose cardinality is the (status × priority) pair space, not the
    * fact table.
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority").agg(cnt.as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority").asc)
    c.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
  }

  /** Running COUNT(DISTINCT) over a window — an operator Spark's
    * window functions REFUSE natively (DISTINCT aggregates are
    * unsupported in window frames). Rewrite: when the frame is
    * cumulative and ordered by the counted expression itself,
    * running-distinct == dense_rank — one window pass, no distinct
    * state. The oracle runs DuckDB's NATIVE distinct window
    * aggregate, so the rewrite is checked against a real
    * implementation of the semantics, not against itself.
    */
  def qWindowDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
    val w = Window.partitionBy("o_custkey").orderBy("month")
    o.withColumn("n_distinct_months", dense_rank().over(w).cast("long"))
  }

  /** Winsorization — clip a measure at per-group p01/p99 before
    * aggregating, the standard heavy-tail taming step before
    * training-statistics jobs. Both bounds come from ONE percentile
    * array aggregate (the qPercentile lesson); the per-group bounds
    * table has fixed cardinality (one row per returnflag) so its
    * join-back broadcasts at any SF. Clipped sums run through the
    * DECIMAL chain; clip counts are exact integers.
    *
    * Scale modes — `exact` (default, the oracle-checked form) uses
    * `percentile()`, whose ONE aggregation buffer holds EVERY group
    * value (~N/3 doubles per returnflag here): fine at test SF,
    * executor-OOM at 100×. `exactBoundaries = false` swaps the
    * boundary aggregate for `approx_percentile(..., 10000)` — a
    * Greenwald–Khanna sketch with O(accuracy·log N) memory and rank
    * error ≤ N/10000, which is the 100 TB path: clipping thresholds
    * are statistical knobs, not ledger values, so a 0.01 % rank slip
    * moves only which borderline rows clip (PercentileScaleSpec pins
    * the drift bound). Everything downstream of the boundary table is
    * identical in both modes.
    */
  def qWinsorize(spark: SparkSession, dir: String,
      exactBoundaries: Boolean = true): DataFrame = {
    val li = t(spark, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val pctl = if (exactBoundaries) "percentile(l_extendedprice, array(0.01D, 0.99D))"
      else "approx_percentile(l_extendedprice, array(0.01D, 0.99D), 10000)"
    val bounds = li.groupBy("l_returnflag")
      .agg(expr(pctl).as("ps"))
      .select(col("l_returnflag"), col("ps").getItem(0).as("lo"), col("ps").getItem(1).as("hi"))
    li.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"),
        least(greatest(col("l_extendedprice"), col("lo")), col("hi")).as("clipped"),
        (col("l_extendedprice") < col("lo")).as("is_lo"),
        (col("l_extendedprice") > col("hi")).as("is_hi"))
      .groupBy("l_returnflag")
      .agg(cnt.as("n"), sumMoney(col("clipped")).as("sum_clipped"),
        sum(when(col("is_lo"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("is_hi"), 1L).otherwise(0L)).as("n_clipped_high"))
  }

  /** Robust outlier detection via MAD (median absolute deviation):
    * |x − median| > 3·MAD flags — the data-quality screen that
    * survives the heavy tails that break z-scores. Two dependent
    * median passes (MAD needs the median first) with the tiny
    * per-group medians broadcast back between them; exact
    * interpolated medians keep both engines bit-identical.
    *
    * Scale modes — same convention as [[qWinsorize]]: the default
    * exact `percentile()` buffers every group value TWICE here (one
    * pass for the median, one for the MAD), so `exactBoundaries =
    * false` runs both passes on the bounded-memory
    * `approx_percentile` sketch instead. An outlier screen needs a
    * robust threshold, not an exact one — the flag-count drift the
    * sketch introduces is bounded by its rank error
    * (PercentileScaleSpec).
    */
  def qOutliers(spark: SparkSession, dir: String,
      exactBoundaries: Boolean = true): DataFrame = {
    def p50(c: String) = if (exactBoundaries) s"percentile($c, 0.5D)"
      else s"approx_percentile($c, 0.5D, 10000)"
    val li = t(spark, dir, "lineitem").select("l_returnflag", "l_extendedprice")
    val med = li.groupBy("l_returnflag")
      .agg(expr(p50("l_extendedprice")).as("med"))
    val dev = li.join(broadcast(med), "l_returnflag")
      .select(col("l_returnflag"), col("med"),
        abs(col("l_extendedprice") - col("med")).as("adev"))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr(p50("adev")).as("mad"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(cnt.as("n"), min(col("med")).as("med"), min(col("mad")).as("mad"),
        sum(when(col("adev") > col("mad") * 3.0, 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Cohort retention matrix — the classic product-analytics shape:
    * users grouped by first-activity week (their cohort), counted in
    * each subsequent week they stay active. Two aggregations and one
    * shuffle join on user_id; the (user, week) activity set is
    * distinct-collapsed FIRST so the join carries one row per active
    * week, not one per event — at 100 TB that collapse is the
    * difference between joining events and joining users×weeks.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val wk = t(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_week"))
    wk.join(cohort, "user_id")
      .select(col("cohort_week"),
        expr("CAST(datediff(wk, cohort_week) DIV 7 AS BIGINT)").as("week_offset"))
      .groupBy("cohort_week", "week_offset").agg(cnt.as("n_active"))
  }

  /** Incremental aggregate maintenance — the materialized-view
    * refresh shape: a per-key STATE aggregate (history up to a
    * cutoff) is merged with the DELTA batch's partial aggregate via
    * a full-outer coalesce, producing the refreshed view WITHOUT
    * rescanning history. Here both sides derive from the same table
    * split at the cutoff (so the oracle can check the merged result
    * against a one-shot aggregate); in production the state side is
    * a stored table and only the delta is scanned — the plan past
    * the two leaf aggregates is identical. Counts and DECIMAL sums
    * are the mergeable pair (avg is re-derived, never merged).
    */
  def qIncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val cutoff = lit("1997-01-01").cast("timestamp_ntz")
    def part(df: DataFrame) = df.groupBy("o_custkey").agg(
      cnt.as("n"), sum(col("o_totalprice").cast(DecimalType(18, 4))).as("total"))
    val state = part(o.filter(col("o_orderdate") < cutoff))
      .withColumnRenamed("n", "sn").withColumnRenamed("total", "stotal")
    val delta = part(o.filter(col("o_orderdate") >= cutoff))
      .withColumnRenamed("n", "dn").withColumnRenamed("total", "dtotal")
    state.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("sn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_orders"),
        (coalesce(col("stotal"), lit(0).cast(DecimalType(18, 4)))
          + coalesce(col("dtotal"), lit(0).cast(DecimalType(18, 4))))
          .cast("double").as("total_price"))
  }

  /** Per-group standardization (z-score feature scaling) — the
    * feature-engineering step before any numeric model input. The
    * group mean and variance come from order-independent EXACT
    * integer sums (price quantized to 1e-4 units, |q| < 2^31), so the
    * derived double chain (mean, E[x²], var = E[x²]−mean², sd,
    * (x−mean)/sd) is bit-identical in any engine and under any
    * partitioning — stddev_samp/Welford internals never enter the
    * picture.
    *
    * Moments cost (the round-7 audit, ProbeStandardize at sf1): the
    * previous DECIMAL(38,0) per-row sums were 10.6 s of the 13.7 s
    * query — precision 38 is past Spark's 18-digit compact-long
    * representation, so every row paid a BigDecimal add. The moments
    * now run entirely in codegen LONG arithmetic: q² (exact, < 2^62)
    * is split hi = q² >> 31, lo = q² & (2^31−1), and summed per
    * (group, input-partition) — the partition id in the key bounds
    * every long sum by partitionRows × 2^31 (overflow needs a 2^32-row
    * partition; real partitions are ~10^6–10^7 rows), and partial
    * aggregation collapses each partition to one row per group before
    * the shuffle, so the exchange carries 3 × P tiny rows. DECIMAL
    * enters only in the second-stage combine over those 3 × P rows
    * (Σq² = 2^31·Σhi + Σlo, exact), where its cost is nil. Exactness
    * improves on the old path, which squared in IEEE doubles (exact
    * only to 2^53); one narrow map for the scaling, as before.
    */
  def qStandardize(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("x"))
    val q2 = col("q") * col("q")
    val partials = li
      .withColumn("q", round(col("x") * 1e4).cast("long"))
      .groupBy(col("l_returnflag"), spark_partition_id().as("pid"))
      .agg(cnt.as("n"), sum(col("q")).as("sq"),
        sum(shiftright(q2, 31)).as("shi"),
        sum(q2.bitwiseAND(lit(0x7fffffffL))).as("slo"))
    val moments = partials.groupBy("l_returnflag").agg(
      sum("n").as("n"),
      sum(col("sq").cast(DecimalType(38, 0))).cast("double").as("sx"),
      (sum(col("shi").cast(DecimalType(38, 0))) * lit(2147483648L)
        + sum(col("slo").cast(DecimalType(38, 0)))).cast("double").as("sx2"))
    li.join(broadcast(moments), "l_returnflag")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("x"),
        round((col("x") - (col("sx") / 1e4) / col("n")) /
          sqrt((col("sx2") / 1e8) / col("n")
            - ((col("sx") / 1e4) / col("n")) * ((col("sx") / 1e4) / col("n"))), 6)
          .as("z"))
  }

  /** RFM customer scoring — recency / frequency / monetary quartile
    * scores, the standard segmentation input. Scores come from
    * QUARTILE BOUNDARIES (one percentile-array aggregate per metric,
    * a one-row broadcast) applied as integer comparisons — NOT from a
    * global ntile window, which would funnel every customer through
    * one partition at scale (the TotalOrderRank lesson, avoided
    * rather than paid three times). score = 1 + Σ(x > qᵢ), so 4 is
    * best on every axis; comparisons against the shared boundary
    * doubles are engine-exact.
    *
    * Scale modes — the exact default is the WORST buffer case of the
    * family: ONE global `percentile` buffer holding all customers × 3
    * metrics. `exactBoundaries = false` computes the quartile cuts
    * with `approx_percentile(..., 10000)` (bounded sketch memory,
    * rank error <= n_customers/10000) — segmentation cut points are
    * arbitrary to within sampling noise anyway, so only customers
    * within the error band of a cut can change score
    * (PercentileScaleSpec pins the changed-score fraction).
    */
  def qRfm(spark: SparkSession, dir: String,
      exactBoundaries: Boolean = true): DataFrame = {
    def quart(c: String) = if (exactBoundaries)
      s"percentile($c, array(0.25D, 0.5D, 0.75D))"
      else s"approx_percentile($c, array(0.25D, 0.5D, 0.75D), 10000)"
    val perCust = t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        datediff(max(col("o_orderdate")).cast("date"), lit("1990-01-01").cast("date"))
          .cast("long").as("rec_days"),
        cnt.as("freq"),
        sumMoney(col("o_totalprice")).as("monetary"))
    val cuts = perCust.agg(
      expr(quart("rec_days")).as("rq"),
      expr(quart("freq")).as("fq"),
      expr(quart("monetary")).as("mq"))
    def score(x: org.apache.spark.sql.Column, q: String) =
      (lit(1L) + (x > col(q).getItem(0)).cast("long")
        + (x > col(q).getItem(1)).cast("long")
        + (x > col(q).getItem(2)).cast("long"))
    perCust.crossJoin(broadcast(cuts))
      .select(col("o_custkey"), col("rec_days"), col("freq"), col("monetary"),
        score(col("rec_days"), "rq").as("r_score"),
        score(col("freq"), "fq").as("f_score"),
        score(col("monetary"), "mq").as("m_score"))
  }

  /** Data-quality rule audit — one row per rule with checked and
    * violation counts, the pre-ingest contract gate: null keys,
    * range rules, referential integrity (orphan foreign keys via
    * LEFT ANTI join — the shuffle carries key columns only), and a
    * cross-table temporal rule (shipment before its order date).
    * Each rule is an independent scan-aggregate or key-only
    * anti-join; the union is five one-row aggregates, so the audit
    * costs one pass over each fact table at any scale.
    */
  def qDqAudit(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    val c = t(spark, dir, "customer")
    def rule(name: String, checked: DataFrame, violations: DataFrame): DataFrame =
      checked.agg(cnt.as("n_checked"))
        .crossJoin(violations.agg(cnt.as("n_violations")))
        .select(lit(name).as("rule"), col("n_checked"), col("n_violations"))
    val orphans = o.select("o_custkey")
      .join(c.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
    val early = li.select("l_orderkey", "l_shipdate")
      .join(o.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") < col("o_orderdate"))
    rule("orders_null_custkey", o, o.filter(col("o_custkey").isNull))
      .unionByName(rule("orders_orphan_custkey", o, orphans))
      .unionByName(rule("lineitem_nonpositive_price", li,
        li.filter(col("l_extendedprice") <= 0)))
      .unionByName(rule("lineitem_ship_before_order", li, early))
      .unionByName(rule("customer_negative_balance", c,
        c.filter(col("c_acctbal") < 0)))
  }

  /** Market-basket affinity: part pairs bought together with
    * support and LIFT (P(a,b)/(P(a)·P(b)) — >1 means genuinely
    * associated, not just individually popular). The basket self-join
    * runs on (order, part) pairs deduped FIRST (the shuffle carries
    * 16-byte keys co-partitioned by order), the min-support filter
    * cuts the pair table before the per-part count joins, the global
    * order count rides a one-row broadcast, and the final top-k is
    * TakeOrdered — no global sort. Lift arithmetic is one fixed
    * double chain (counts cast, multiply, divide) mirrored in the
    * oracle, ranked at full precision, rounded at the output edge.
    */
  def qMarketBasket(spark: SparkSession, dir: String, minSupport: Int = 3,
      k: Int = 50): DataFrame = {
    // shared hot-basket guard (Incidence): per-part supports and pair
    // counts both read the CAPPED incidence so support and n_ab stay
    // mutually consistent if the cap ever binds (it doesn't on
    // testdata — q_basket_cap_audit pins that)
    val li = Incidence.capped(spark, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val nOrders = li.select(countDistinct("o").as("n_orders"))
    val partCnt = li.groupBy("p").agg(cnt.as("n_p"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb")).agg(cnt.as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(partCnt.select(col("p").as("pa"), col("n_p").as("n_a")), "pa")
      .join(partCnt.select(col("p").as("pb"), col("n_p").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("n_ab").cast("double") * col("n_orders").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double")))
      .orderBy(col("lift").desc, col("pa").asc, col("pb").asc)
      .limit(k)
      .select(col("pa"), col("pb"), col("n_ab"), round(col("lift"), 6).as("lift"))
  }

  /** Distribution-drift report between two time slices of the event
    * stream — the data-monitoring shape every production training
    * pipeline runs before ingesting a new dump: equi-width value
    * buckets (deterministic integer floor — quantile edges would put
    * floats on bucket boundaries), per-slice proportions, and the
    * per-bucket absolute shift (Σshift/2 = total-variation distance).
    * Two partial-aggregated scans + a bucket-keyed join; the totals
    * ride a one-row broadcast cross join (cardinality fixed at any
    * SF). Proportions are n/total double divisions — one fixed op
    * chain, engine-exact — rounded at the output edge only.
    */
  def qDrift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val ev = t(spark, dir, "events").select(col("value"), col("ts"))
    def slice(cond: org.apache.spark.sql.Column, n: String) =
      ev.filter(cond)
        .groupBy(floor(col("value") / 32).cast("long").as("bucket"))
        .agg(cnt.as(n))
    val refB = slice(col("ts") < cut, "n_ref")
    val curB = slice(col("ts") >= cut, "n_cur")
    val tots = refB.agg(sum("n_ref").as("t_ref"))
      .crossJoin(curB.agg(sum("n_cur").as("t_cur")))
    refB.join(curB, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(broadcast(tots))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("n_ref").cast("double") / col("t_ref").cast("double"), 6).as("p_ref"),
        round(col("n_cur").cast("double") / col("t_cur").cast("double"), 6).as("p_cur"),
        round(abs(col("n_ref").cast("double") / col("t_ref").cast("double")
          - col("n_cur").cast("double") / col("t_cur").cast("double")), 6).as("shift"))
  }

  /** Native `session_window` in BATCH mode — the declarative twin of
    * the window-lag sessionization (qSessionize) and the streaming
    * session_window spec: one groupBy, no self-join, no explicit lag
    * chain. Timestamps are second-floored FIRST (the q_sessionize
    * precision rule: the raw parquet is nanos, Spark truncates to µs
    * — flooring both engines to whole seconds removes the precision
    * mismatch) so the 30-minute gap semantics replay exactly: a gap
    * ≥ 1800 s starts a new session (windows [t, t+gap) merge only on
    * strict overlap).
    */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"), to_timestamp(col("ts").cast("long")).as("tss"))
      .groupBy(col("user_id"), session_window(col("tss"), "30 minutes").as("sw"))
      .agg(cnt.as("n_events"))
      .select(col("user_id"),
        col("sw.start").cast("long").as("session_start_s"),
        (col("sw.end").cast("long") - 1800).as("last_event_s"),
        col("n_events"))

  /** The 2D price/size Pareto sweep over one sorted iterator: keep a
    * row iff no seen row has (price ≤, size ≥, one strict). Rows MUST
    * arrive sorted (price asc, size desc); `maxPrev` is the best size
    * among strictly-cheaper rows, `maxCur` within the current price.
    */
  private def sweep(it: Iterator[(Long, Double, Int)]): Iterator[(Long, Double, Int)] = {
    var curPrice = Double.NaN
    var maxPrev = Int.MinValue
    var maxCur = Int.MinValue
    it.filter { case (_, price, size) =>
      if (price != curPrice) {
        maxPrev = math.max(maxPrev, maxCur); curPrice = price; maxCur = Int.MinValue
      }
      // dominated by a strictly-cheaper ≥-size row, or an equal-price
      // strictly-bigger row (equal price+size duplicates both survive)
      val dominated = maxPrev >= size || maxCur > size
      maxCur = math.max(maxCur, size)
      !dominated
    }
  }

  /** Skyline (Pareto frontier) of parts on (cheap price, big size) —
    * multi-objective shortlists without a scoring function. The
    * distributed shape is the classic two-phase skyline: a NARROW
    * partition-local sweep first (sortWithinPartitions + one-pass
    * filter — no shuffle; the global skyline is always a subset of
    * every partition's local skyline), then the exact sweep on the
    * few survivors in one task. The all-pairs dominance join the
    * oracle runs (NOT EXISTS — fine at 60k rows) is exactly what
    * this shape avoids at scale: stage-1 discards ~everything
    * map-side, and stage 2's single partition sees only frontier
    * candidates (≤ skyline size × partition count).
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = t(spark, dir, "part")
      .select(col("p_partkey").as("_1"), col("p_retailprice").as("_2"), col("p_size").as("_3"))
      .as[(Long, Double, Int)]
    val local = parts
      .sortWithinPartitions(col("_2").asc, col("_3").desc)
      .mapPartitions(sweep)
    val global = local
      .repartition(1)
      .sortWithinPartitions(col("_2").asc, col("_3").desc)
      .mapPartitions(sweep)
    global.toDF("p_partkey", "p_retailprice", "p_size")
  }
}
