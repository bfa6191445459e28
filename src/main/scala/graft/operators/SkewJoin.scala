package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §5).
  *
  * When one join key carries a disproportionate share of rows, the
  * task holding that key becomes the straggler. Salting splits each
  * hot key into `salts` sub-keys: the skewed side gets a deterministic
  * salt derived from its row content, the other side is replicated
  * `salts`× so every sub-key can still match. AQE's skew-join split
  * handles moderate skew automatically; explicit salting is the tool
  * for the pathological keys AQE can't split (single-key hot spots in
  * a shuffle hash join at 100 TB).
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, with `left` treated as
    * the skewed side. `saltSource` must be a left column (any content
    * column) used to derive the deterministic salt.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltSource: Column, salts: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
          salted(key) === replicated(key))
      .drop("_salt")
      .drop(replicated(key)) // keep one unambiguous key column
  }

  /** events⋈customer on the (zipf-skewed) user key, salted; same
    * result as the plain join, but hot users fan out over 8 tasks.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = t(spark, dir, "events")
      .select(col("user_id").as("join_key"), col("event_id"), col("value"))
    val customer = t(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("join_key"), col("c_mktsegment"))
    saltedJoin(events, customer, "join_key", col("event_id"))
      .groupBy("c_mktsegment")
      .agg(cnt.as("n_events"), sumMoney(col("value")).as("total_value"))
  }
}
