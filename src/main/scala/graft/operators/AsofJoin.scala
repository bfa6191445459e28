package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same
  * key and time ≤ left time.
  *
  * Spark has no ASOF JOIN operator; the naive encoding
  * (inequality join + groupBy max) explodes to |L|×|R| per key. This
  * implementation uses the union + sorted-window technique instead:
  * tag both sides, sort by (key, time, side, tiebreak) in ONE range
  * exchange, and carry the last-seen right row forward with a running
  * `last(ignoreNulls)` window. Cost is a single sort shuffle of
  * |L|+|R| rows — the plan you want at 100 TB.
  */
object AsofJoin {

  /** Generic as-of join. Right-side payload columns are returned
    * struct-packed then unpacked; ties on time resolve to the largest
    * `rightTiebreak` (compared in its own type — no lossy cast).
    *
    * Null handling, mirroring what an inequality join would produce:
    * right rows with NULL key or NULL time can never satisfy
    * `key = key AND time <= t` and are dropped; left rows always
    * survive (left-outer contract) — NULL-key left rows bypass the
    * window and come back with a NULL match, NULL-time left rows sort
    * before every right row (NULLS FIRST) and so match nothing.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTiebreak: Column,
      rightPayload: Seq[(String, Column)]): DataFrame = {
    val payload = struct(rightPayload.map { case (n, c) => c.as(n) }: _*)
    // A NULL-key or NULL-time right row never matches; dropped up
    // front it also can't be co-partitioned with other NULL keys or
    // sorted ahead of every left time (NULLS FIRST) where
    // last(ignoreNulls) would fabricate matches from it.
    val r0 = right.filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(rightKey.as("_k"), rightTime.as("_t"), lit(0).as("_side"),
        rightTiebreak.as("_tb"), payload.as("_p"))
    val lAll = left.select(leftKey.as("_k"), leftTime.as("_t"), lit(1).as("_side"),
      lit(null).cast(r0.schema("_tb").dataType).as("_tb"),
      lit(null).cast(r0.schema("_p").dataType).as("_p"),
      struct(col("*")).as("_row"))
    val l = lAll.filter(col("_k").isNotNull)
    val r = r0.withColumn("_row", lit(null).cast(lAll.schema("_row").dataType))
    // events sort before the left rows at equal time (side 0 < 1), so
    // "time <= left time" is inclusive; among equal times the largest
    // tiebreak is seen last and wins.
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r.unionByName(l)
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_row.*"), col("_match"))
    // NULL-key left rows match nothing but must still appear (left
    // outer); they skip the shuffle entirely.
    val nullKeyLeft = lAll.filter(col("_k").isNull)
      .select(col("_row.*"), col("_p").as("_match"))
    joined.unionByName(nullKeyLeft)
  }

  /** For every event: the user's latest order at or before the event
    * time (the "state of the user at event time" feature-join shape).
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val events = t(spark, dir, "events")
    asofJoin(
      events, orders,
      col("user_id"), col("o_custkey"),
      col("ts"), col("o_orderdate"),
      col("o_orderkey"),
      Seq("o_orderkey" -> col("o_orderkey"), "o_orderstatus" -> col("o_orderstatus")))
      .filter(col("_match").isNotNull)
      .select(col("event_id"), col("_match.o_orderkey").as("o_orderkey"),
        col("_match.o_orderstatus").as("o_orderstatus"))
  }
}
