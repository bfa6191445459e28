package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Time-series resample with forward-fill: the daily order-total
    * series re-gridded onto a complete date spine (sequence() explode
    * — no driver-side date loop), missing days carrying the last
    * observed value forward via last_value IGNORE NULLS. The spine is
    * derived from the data's own min/max (one tiny aggregate,
    * broadcast by construction); the fill is one window pass over the
    * DAILY series — a single partition by design, like qMovingAvg:
    * at 100 TB the heavy groupBy upstream is what distributes, and
    * the daily aggregate it emits is tiny.
    */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    // the tiny daily aggregate feeds BOTH the spine bounds and the
    // fill join — materialize it once (eager localCheckpoint) so the
    // fact table is scanned once, not twice
    val daily = t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sumMoney(col("o_totalprice")).as("total"))
      .localCheckpoint()
    val spine = daily.agg(min("d").as("lo"), max("d").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("d"), "left")
      .select(col("d"), col("total").isNotNull.as("observed"),
        last("total", ignoreNulls = true).over(w).as("total_ffill"))
  }

  /** Funnel analysis: per-user ordered-sequence conversion through
    * view → click → purchase, each stage within 1 day of the previous
    * stage's earliest qualifying event. Stage times come from
    * per-stage aggregations chained by equi-joins on user_id (each a
    * single shuffle of the already-filtered stage events), then one
    * tiny stage rollup — the standard product-analytics funnel
    * without windowed self-joins.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val evs = t(spark, dir, "events")
    val views = evs.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val clicks = evs.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ts") > col("t_view") &&
        col("ts") <= col("t_view") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchases = evs.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ts") > col("t_click") &&
        col("ts") <= col("t_click") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .agg(
        cnt.as("n_view"),
        count(col("t_click")).as("n_view_click"),
        count(col("t_purchase")).as("n_view_click_purchase"))
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

  /** SCD2 (slowly-changing-dimension type 2) interval build: each
    * user's event stream becomes validity intervals — a row's state
    * holds from its own timestamp until the NEXT event's (lead), the
    * newest row stays open (`is_current`). ONE window pass per user
    * partition builds the whole history — the standard
    * change-log → dimension-snapshot transform, no self-join. Times
    * are emitted (and ordered) as epoch SECONDS so the comparison is
    * identical across engines regardless of sub-second timestamp
    * handling (the q_sessionize precedent).
    */
  /** MERGE INTO (upsert) as a batch shape: a change batch (per-customer
    * order deltas) merges into a target dimension slice — matched rows
    * UPDATE (balance + delta), source-only rows INSERT, target-only
    * rows are KEPT. One full-outer join on the key, every action
    * decided by null-side classification — the engine-agnostic core of
    * what lakehouse MERGE does, minus the transactional file rewrite.
    * At scale the join is key-partitioned on both sides (no hint — a
    * small change batch broadcasts by AQE's size check).
    */
  def qUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = t(spark, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0) // a dim slice, so INSERTs exist
      .select(col("c_custkey"), col("c_acctbal"))
    val changes = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("o_custkey")
      .agg(sumMoney(col("o_totalprice")).as("delta"))
    target.join(changes, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("c_custkey"),
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "update")
          .when(col("c_custkey").isNull, "insert")
          .otherwise("keep").as("action"),
        (coalesce(col("c_acctbal"), lit(0.0)) + coalesce(col("delta"), lit(0.0))).as("new_bal"))
  }

  /** CDC apply (change-data-capture): collapse an ordered change log
    * into the current snapshot — per key, the LAST operation wins
    * (ordered by event time with the event id as the deterministic
    * tiebreaker), and keys whose last operation is a delete vanish.
    * The third lakehouse-maintenance shape next to qUpsert (one merge
    * batch) and qScd2 (full history): ONE window pass per key
    * partition, no self-join, no driver loop. At 100 TB the window
    * partitions by key — the same distribution the downstream merge
    * would use — and the change log is read once. Events stand in as
    * the change log: view/click upsert the user's row with the event
    * value; purchase deletes it (semantics are arbitrary; the
    * last-writer-wins + delete-filter SHAPE is the operator).
    */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    // ordering runs on SECOND-floored epochs (+ event_id tiebreak) so
    // both engines rank identically regardless of sub-second timestamp
    // precision — the q_scd2/q_sessionize precedent
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s").desc, col("event_id").desc)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"),
        when(col("event_type") === "purchase", "delete").otherwise("upsert").as("op"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "upsert")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts_s").as("updated_s"), col("value").as("current_value"))
  }

  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("valid_from_s"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").cast("long").as("valid_from_s"))
      .withColumn("valid_to_s", lead(col("valid_from_s"), 1).over(w))
      .withColumn("is_current", col("valid_to_s").isNull)
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    * user (the classic day − row_number() grouper: constant within a
    * run, distinct across runs). Every step is keyed by user_id —
    * distinct shuffles on (user, day), the window and the final
    * aggregate both ride partitionBy(user_id) — so the shape is
    * per-key parallel at any scale; no global window anywhere.
    */
  def qIslands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("day")
    t(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min("day").as("island_start"), max("day").as("island_end"),
        cnt.as("days"))
      .drop("grp")
  }
}
