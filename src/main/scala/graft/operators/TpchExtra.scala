package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional classic TPC-H query shapes over the available star
  * schema. No partsupp table ships with the test data, so the
  * partsupp-centric shapes (q2/q9/q11, like q16/q20) are adapted with
  * lineitem as the part↔supplier bridge: per-(part,supplier) facts
  * come from a map-side-partial aggregate over lineitem, and
  * ps_supplycost is proxied by observed unit price / part retail
  * price. q12's receipt-past-commit lateness (columns absent) is
  * proxied by ship-past-order lateness. The PLAN shapes — the thing
  * that matters at 100 TB — are preserved exactly.
  *
  * Join-strategy policy: only FIXED-cardinality dims (nation = 25,
  * region = 5 rows at ANY scale factor) carry an explicit
  * `broadcast()` hint. customer/supplier/part grow linearly with SF —
  * a forced hint on them bypasses AQE's size check and OOMs the build
  * side at large SF, so their joins are left to AQE, which still
  * picks BroadcastHashJoin at small SF (spec-pinned in PlanAuditSpec)
  * and falls back to shuffle joins when the table outgrows the
  * threshold.
  */
object TpchExtra {

  /** TPC-H Q7 shape (volume shipping): revenue flowing between every
    * DISTINCT nation pair, by ship year (the classic query pins one
    * pair; the all-pairs form is scale-factor-independent and the
    * same plan shape). The nation dims broadcast (25 rows at any SF);
    * supplier/customer join strategy is AQE's call — they scale with
    * the data.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = t(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(spark, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** TPC-H Q10 shape (returned items): top 20 customers by revenue
    * lost to returns in a quarter; the final top-k is a
    * TakeOrderedAndProject, never a global sort.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1996-07-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)

  /** TPC-H Q18 shape (large-quantity orders): orders whose line
    * quantities sum past a threshold, with their customers. The
    * qualifying-orderkey set comes from one fact aggregation (partial
    * map-side combine), then rejoins the facts.
    */
  def q18BigOrders(spark: SparkSession, dir: String, minQty: Double = 250.0): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sumMoney(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
  }

  /** TPC-H Q6 shape (forecasting revenue change): one scan, every
    * predicate pushed to parquet (date range + discount band +
    * quantity cap all appear in PushedFilters — spec-pinned), a single
    * partial-then-final aggregate. The canonical "is the scan doing
    * the work" probe: at 100 TB this query is pure IO + row-group
    * skipping.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(sumMoney(col("l_extendedprice") * col("l_discount")).as("revenue"),
        cnt.as("n_items"))

  /** TPC-H Q4 shape (order-priority checking): orders in a quarter
    * with at least one returned item, counted per priority. The EXISTS
    * plans as a left-semi join — the returned-items side is collapsed
    * to distinct orderkeys by the semi-join itself, no pre-distinct
    * pass.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .join(t(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(cnt.as("n_orders"))

  /** TPC-H Q14 shape (promotion effect): promo revenue share of a
    * month's part-joined revenue. Both sums come from ONE conditional
    * aggregation pass; the share divides two exact-DECIMAL-derived
    * doubles, so it is bit-stable across engines and partitionings.
    */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        sumMoney(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))).as("promo_revenue"),
        sumMoney(rev).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") /
          nullif(col("total_revenue"), lit(0.0))).as("promo_share"))
  }

  /** TPC-H Q15 shape (top supplier): revenue per supplier over a
    * quarter, keep the supplier(s) achieving the maximum. The max is a
    * one-row broadcast over the (supplier-cardinality) revenue
    * aggregate — never a driver collect — and the equality compares
    * two copies of the SAME exact-DECIMAL-derived double, so it cannot
    * flip on float noise.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("total_revenue"))
    val best = rev.agg(max("total_revenue").as("best_rev"))
    rev.join(broadcast(best))
      .filter(col("total_revenue") === col("best_rev"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): revenue from
    * orders below 20% of their part's average quantity, for one brand.
    * The correlated per-part average decorrelates to a WINDOW over the
    * brand-filtered fact subset: the brand join is inner, so
    * restricting the threshold computation to the 1/|brands| slice
    * that survives it is semantics-preserving and shrinks both the
    * shuffle and the aggregate ~25×, and the whole-partition window
    * (no ORDER BY — frame is the entire partkey group) replaces the
    * second fact scan + self-join of the naive decorrelation with one
    * scan and one shuffle. The window's decimal sum is
    * partition-order-independent, so the threshold and comparison are
    * bit-stable across engines.
    */
  def q17SmallQty(spark: SparkSession, dir: String, brand: String = "Brand#1"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_brand") === brand).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("qty_threshold",
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
          .cast("double") / count(lit(1)).over(w) * 0.2)
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg((sumMoney(col("l_extendedprice")) / 7.0).as("avg_yearly"), cnt.as("n_items"))
  }

  /** TPC-H Q22 shape (global sales opportunity): customers holding
    * above-average positive balances who never placed a large order
    * (this schema's every customer has SOME order, so the idle test is
    * against the filtered high-value set — the same plan shape). The
    * global average is a one-row broadcast (never a driver collect);
    * the no-large-orders test is a left-anti join whose right side is
    * pre-filtered at the scan.
    */
  def q22Idle(spark: SparkSession, dir: String, minOrder: Double = 400000.0): DataFrame = {
    val customer = t(spark, dir, "customer")
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg(avgMoney(col("c_acctbal")).as("avg_bal"))
    customer
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(t(spark, dir, "orders").filter(col("o_totalprice") > minOrder),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(cnt.as("n_customers"), sumMoney(col("c_acctbal")).as("total_bal"))
  }

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's revenue for one part type, by order year. The share
    * numerator is a conditional sum inside the SAME aggregation pass
    * as the denominator — one shuffle, and the division of two
    * exact-DECIMAL-derived doubles is bit-stable. Only the
    * fixed-cardinality nation/region dims broadcast; customer/supplier
    * strategy stays AQE's call.
    */
  def q8MarketShare(spark: SparkSession, dir: String, partType: String = "ECONOMY",
      shareNation: String = "NATION_3", regionName: String = "ASIA"): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val custNation = t(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val suppNation = t(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_type") === partType).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === regionName)),
        col("c_rk") === col("r_regionkey"))
      .join(t(spark, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sumMoney(when(col("supp_nation") === shareNation, rev).otherwise(lit(0.0))).as("nation_revenue"),
        sumMoney(rev).as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        (col("nation_revenue") / nullif(col("total_revenue"), lit(0.0))).as("mkt_share"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with the filter IN the join condition (customers keeping
    * zero matching orders still appear with count 0), then a second
    * tiny aggregation over the per-customer counts. Both aggregations
    * are map-side partial; the second one's key space is the max order
    * count — a few dozen groups at any SF.
    */
  def q13CustDist(spark: SparkSession, dir: String, excludePriority: String = "1-URGENT"): DataFrame =
    t(spark, dir, "customer").select("c_custkey")
      .join(t(spark, dir, "orders")
          .filter(col("o_orderpriority") =!= excludePriority)
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(cnt.as("custdist"))

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    * OR of brand/size/quantity conjunction groups across the
    * lineitem⋈part join. The part-only disjunction (brand ∧ size
    * ranges) is applied ON THE PART SCAN as well — the manual
    * common-factor extraction Catalyst's CNF pushdown doesn't do for
    * cross-table ORs — so the build side is pruned before the join
    * instead of carrying every part row to a post-join filter.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val partPred =
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(10, 30)) ||
      (col("p_brand") === "Brand#16" && col("p_size").between(20, 50))
    val fullPred =
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 30.0)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10.0, 40.0)) ||
      (col("p_brand") === "Brand#16" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20.0, 50.0))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(partPred), col("l_partkey") === col("p_partkey"))
      .filter(fullPred)
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        cnt.as("n_items"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting, adapted to
    * this schema's columns): suppliers with a RETURNED line in a
    * finished multi-supplier order where NO other supplier's line was
    * returned — returnflag stands in for the reference's
    * receipt-past-commit lateness, preserving the plan shape: a fact
    * self-semi-join (another supplier exists) and self-anti-join (no
    * other returned supplier) both equi-keyed on orderkey with the
    * supplier inequality as a residual. Final top-k is a
    * TakeOrderedAndProject with the suppkey tiebreak.
    */
  def q21Waiting(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    val li = t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(t(spark, dir, "orders").filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
    val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    l1.join(l2, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"), "left_anti")
      .groupBy("l_suppkey")
      .agg(cnt.as("numwait"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(topK)
  }

  /** TPC-H Q16 shape (supplier-count statistics, adapted: lineitem is
    * the part↔supplier bridge — this schema ships no partsupp):
    * distinct suppliers per surviving (brand, type) after excluding
    * one brand, a size band, and a supplier denylist. The NOT IN is a
    * left-anti join; the distinct-pair collapse is a map-side partial
    * aggregate BEFORE any join, so the join carries one row per
    * (part, supplier), not one per lineitem.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
      .join(t(spark, dir, "supplier").filter(col("s_acctbal") < 0.0).select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(t(spark, dir, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_size").between(10, 40)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** TPC-H Q2 shape (minimum-cost supplier, adapted: the supply cost
    * of a (part, supplier) pair is the minimum observed unit price
    * over lineitem — this schema ships no partsupp). For parts of one
    * type/size band, find the cheapest supplier(s) within one region.
    * The correlated min-cost subquery decorrelates to a
    * whole-partition window MIN over partkey (one scan, no
    * self-join), and the equality compares a value against the min of
    * a set containing it — exact, never a float-noise flip. Only the
    * fixed-cardinality nation/region dims broadcast; the final top-k
    * is a TakeOrderedAndProject.
    */
  def q2MinCost(spark: SparkSession, dir: String, partType: String = "ECONOMY",
      regionName: String = "EUROPE", topK: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    val ps = t(spark, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
    // region scoping BEFORE the window min — Q2's correlated subquery
    // ranges over the region's suppliers only (a part whose global
    // minimum sits in another region must still report its cheapest
    // REGIONAL supplier)
    ps.join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .join(t(spark, dir, "part")
          .filter(col("p_type") === partType && col("p_size").between(10, 30))
          .select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost", min("supply_cost").over(w))
      .filter(col("supply_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), col("s_suppkey"), col("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc, col("s_suppkey").asc)
      .limit(topK)
  }

  /** TPC-H Q9 shape (product-type profit, adapted: unit supply cost is
    * proxied by half the part's retail price). Profit on every line of
    * parts whose name matches a token, grouped by supplier nation and
    * order year. Four fact-dim joins where only nation broadcasts
    * unconditionally; the part side is pre-filtered at its scan by the
    * pushed LIKE, and the profit sum is exact-DECIMAL then DOUBLE, so
    * the result is partition-order-independent.
    */
  def q9Profit(spark: SparkSession, dir: String, nameToken: String = "red"): DataFrame = {
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_name").contains(nameToken))
          .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sumMoney(profit).as("sum_profit"))
  }

  /** TPC-H Q11 shape (important stock, adapted: shipped revenue stands
    * in for partsupp stock value): parts whose revenue shipped by one
    * nation's suppliers exceeds a fraction of that nation's total. The
    * global total re-aggregates the per-part aggregate (tiny input)
    * and joins back as a ONE-ROW broadcast — never a driver collect;
    * the supplier filter is a semi-join through the broadcast nation
    * dim, so the fact shuffle carries only the 1/|nations| slice.
    */
  def q11Important(spark: SparkSession, dir: String, nationName: String = "NATION_3",
      frac: Double = 0.001): DataFrame = {
    val natSupp = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation").filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = t(spark, dir, "lineitem")
      .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sumMoney(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("part_value"))
    // Re-cast to DECIMAL before the global total: part_value carries
    // ≤4 decimal digits by construction, so the cast is lossless-mod-
    // rounding and the total is order-independent (a plain double sum
    // would drift with partitioning and could flip a borderline part
    // against the oracle's threshold).
    val total = perPart.agg(
      sum(col("part_value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
        .cast("double").as("total_value"))
    perPart.join(broadcast(total))
      .filter(col("part_value") > col("total_value") * frac)
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey").asc)
  }

  /** TPC-H Q12 shape (shipping-priority audit, adapted: ship-lag
    * stands in for the reference's receipt-past-commit lateness, and
    * returnflag for shipmode — those columns don't ship with this
    * schema): lines shipped more than `lagDays` after their order
    * date in a year, split into urgent/non-urgent order counts per
    * flag. One fact scan with the date range pushed to parquet, one
    * join, both counts from a single conditional-aggregation pass.
    */
  def q12ShipPriority(spark: SparkSession, dir: String, lagDays: Int = 60): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") + expr(s"INTERVAL $lagDays DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .cast("long").as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .cast("long").as("low_line_count"))

  /** TPC-H Q20 shape (excess concentration, adapted: shipped quantity
    * stands in for partsupp availability): suppliers holding more than
    * `minShare` of a part's total shipped quantity in a year, with how
    * many parts they dominate. Per-(part,supplier) quantities stay
    * DECIMAL through the whole-partition window total, so the share
    * divides two exact values — one fact scan, two shuffles (pair agg,
    * then partkey window), no self-join.
    */
  def q20Excess(spark: SparkSession, dir: String, minShare: Double = 0.5): DataFrame = {
    val ps = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("qty"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    ps.withColumn("share", col("qty").cast("double") / sum("qty").over(w).cast("double"))
      .filter(col("share") > minShare)
      .groupBy("l_suppkey")
      .agg(cnt.as("n_parts_dominated"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts_dominated"))
  }
}
