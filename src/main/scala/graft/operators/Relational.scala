package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational / OLAP operator battery (SURVEY.md §2.2).
  *
  * Every query is a declarative DataFrame plan: filters sit directly on
  * scans (parquet pushdown), only referenced columns are read (column
  * pruning), and all money aggregates go through
  * [[graft.operators.sumMoney]] so results are exact and
  * partitioning-independent. Explicit `broadcast()` hints appear ONLY
  * on fixed-cardinality inputs (nation = 25 rows, region = 5 rows,
  * one-row aggregates); joins against SF-scaling tables
  * (customer/supplier/part) are left to AQE's size-checked strategy
  * choice so the same plan that broadcasts at small SF degrades to a
  * shuffle join instead of an OOM at sf100k.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan+filter+hash-aggregate with
    * map-side partial aggregation. Shuffles only 6 groups.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avgMoney(col("l_quantity")).as("avg_qty"),
        cnt.as("count_order"))

  /** TPC-H Q3-style: 3-way join + agg + deterministic top-k.
    * customer scales with SF, so its join strategy is AQE's call (it
    * still broadcasts at small SF — spec-pinned); orders⋈lineitem
    * shuffles on orderkey. Top-k is orderBy+limit
    * (TakeOrderedAndProject — no full sort materialization).
    */
  def q3Topk(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val orders = t(spark, dir, "orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val lineitem = t(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "revenue", "o_orderdate")
  }

  /** TPC-H Q5-style: 6-way join, revenue per nation. Fixed-size dims
    * (nation/region) broadcast explicitly; customer/supplier scale
    * with SF so AQE picks their strategy (broadcast at small SF,
    * shuffle join beyond the threshold).
    */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val customer = t(spark, dir, "customer")
    val supplier = t(spark, dir, "supplier")
    val orders = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val lineitem = t(spark, dir, "lineitem")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Broadcast-hash join fact×dim: zero shuffle on the fact side
    * until the final 25-group aggregate. part scales with SF, so the
    * broadcast is AQE's size-checked decision (pinned at small SF in
    * PlanAuditSpec), not a forced hint that would OOM at sf100k.
    */
  def qBroadcastJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sumMoney(col("l_quantity")).as("sum_qty"), cnt.as("n_items"))

  /** Left-semi join (EXISTS): customers that have at least one order. */
  def qSemijoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(cnt.as("n_customers"), sumMoney(col("c_acctbal")).as("sum_acctbal"))

  /** Left-anti join (NOT EXISTS): customers with no high-value order. */
  def qAntijoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))

  /** Shuffle dedup. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()

  /** INTERSECT + EXCEPT + UNION ALL in one plan. */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    val building = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bigSpenders = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0).select(col("o_custkey").as("c_custkey"))
    val both = building.intersect(bigSpenders).select(lit("both").as("tag"), col("c_custkey"))
    val custOnly = building.except(bigSpenders).select(lit("only_cust").as("tag"), col("c_custkey"))
    both.unionAll(custOnly)
  }

  /** Window rank: top-3 orders by price within each priority class. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
  }

  /** row_number dedup-per-key: top spender per nation. */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(spark, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
  }

  /** ROLLUP grouping sets — pre-aggregated: the base groupBy collapses
    * the fact table to its 6 (flag,status) groups FIRST, and only that
    * tiny intermediate goes through the ×3 Expand. Rolling up the raw
    * table would triple-scan every fact row through Expand; at 100 TB
    * that's the whole job. Summing exact DECIMAL partials re-aggregates
    * losslessly.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val pre = t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(cnt.as("pn"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).as("pq"))
    pre.rollup("l_returnflag", "l_linestatus")
      .agg(sum("pn").cast("long").as("n"), sum("pq").cast("double").as("sum_qty"))
  }

  /** Pivot via conditional aggregation (shuffle once, no per-status
    * scans).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    def statusTotal(s: String) =
      sum(when(col("o_orderstatus") === s, col("o_totalprice")).otherwise(lit(null))
        .cast(DecimalType(18, 4))).cast("double")
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        statusTotal("F").as("total_f"),
        statusTotal("O").as("total_o"),
        statusTotal("P").as("total_p"),
        cnt.as("n_orders"))
  }

  /** Scalar subquery: orders above the global average price. The 1-row
    * aggregate is broadcast, not collected on the driver.
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val avgPrice = orders.agg(avgMoney(col("o_totalprice")).as("avg_price"))
    orders.join(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy("o_orderstatus")
      .agg(cnt.as("n"), sumMoney(col("o_totalprice")).as("total"))
  }

  /** Exact interpolated percentiles per group. Both quantiles come
    * from ONE percentile aggregate (array form) — one per-group sorted
    * buffer instead of two (measured ~2× on the sf0.1 bench).
    */
  def qPercentile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
        cnt.as("n"))
      .select(col("l_returnflag"),
        col("ps").getItem(0).as("p50"), col("ps").getItem(1).as("p90"), col("n"))

  /** Per-row string expression battery (all codegen'd built-ins). */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      substring(col("p_type"), 1, 5).as("type_prefix"),
      length(col("p_name")).cast("long").as("name_len"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      length(regexp_replace(lower(col("p_name")), "[^aeiou]", "")).cast("long").as("n_vowels"))

  /** Date extraction + aggregation by month. */
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(cnt.as("n_orders"), sumMoney(col("o_totalprice")).as("total"))

  /** JSON field extraction from the events props column. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .groupBy("k")
      .agg(cnt.as("n"), sumMoney(col("value")).as("total_value"))

  /** Gap-based sessionization (30 min) via window lag. Second-floored
    * epochs on both engines so µs precision can't flip a boundary.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    t(spark, dir, "events")
      .withColumn("prev_s", unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("prev_s").isNull || unix_timestamp(col("ts")) - col("prev_s") > 1800L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_sess").cast("long").as("n_sessions"), cnt.as("n_events"))
  }

  /** Event-time tumbling window aggregation (batch twin of the
    * Structured Streaming pipeline in graft.streaming).
    */
  def qWindowTumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).cast("string").as("hour"),
        col("event_type"))
      .agg(cnt.as("n"), sumMoney(col("value")).as("total_value"))

  /** High-cardinality aggregation on the (zipf-ish) user_id key. At
    * scale AQE skew-join/partial-agg handles the hot keys; here the
    * partial aggregate already collapses them map-side.
    */
  def qSkewAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(cnt.as("n_events"), sumMoney(col("value")).as("total_value"),
        countDistinct("event_type").cast("long").as("n_types"))
}
