package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a 100× (sf10-equivalent) table set under tmp/sf10 — the
  * round-9 verdict's item 7: a SECOND measured decade on the
  * scale-probe axis, so the "2.5–2.75× per 10×" sf0.1→sf1
  * extrapolation becomes two measured decades (sf0.1→sf1→sf10).
  *
  * Same density-preserving discipline as [[Sf1Build]] — scale SIZE
  * without touching per-key DENSITY — with each recipe generalized
  * from 10 to 100 replicas:
  *
  *  - key families shift by +r·10⁷ consistently across tables (an
  *    order's lineitems follow it, a customer keeps their orders);
  *    r ≤ 99 keeps every shifted key < 10⁹, well inside Long.
  *  - p_name suffixes keep the pairwise-length-gap > tau property at
  *    100 replicas: suffix length 3r (gaps are multiples of 3 > tau=2)
  *    with content drawn from repeat(md5(name),10) — 320 hash chars
  *    cover the 297-char worst case, and per-name content avoids the
  *    uniform-run boilerplate Sf1Build measured (130 s residual).
  *  - document token spaces stay disjoint per replica via a TWO-letter
  *    suffix code ('q' + chr(97+r/10) + chr(97+r%10)): 100 distinct
  *    alpha-only suffixes, so shingle df — dup DENSITY — is exactly
  *    sf0.1's in every replica.
  *  - embeddings: 64-dim vectors admit only 64 distinct circular
  *    shifts, so replicas r ≥ 64 NEGATE the rotated vector
  *    (norm-preserving, cosine(v,−v) = −1 keeps them out of every
  *    near-dup band) — 128 distinct isometries cover 100 replicas.
  *
  * Run: sbt "Test/runMain graft.Sf10Build" (or tools/runmain.sh)
  */
object Sf10Build {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "tmp/sf10"
    val reps = 100
    val repl = spark.range(0, reps).select(col("id").as("r"))

    def t(name: String): DataFrame = core.Tables.load(spark, src, name)
    def shift(c: String) = (col(c) + col("r") * lit(Off)).as(c)
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sf10] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    write(t("region"), "region")
    write(t("nation"), "nation")
    write(t("customer").crossJoin(repl).select(shift("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    write(t("supplier").crossJoin(repl).select(shift("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal")), "supplier")
    write(t("part").crossJoin(repl).select(shift("p_partkey"),
      when(col("r") === 0, col("p_name"))
        .otherwise(concat(col("p_name"), lit(" "),
          expr("substr(repeat(md5(p_name), 10), 1, 3 * CAST(r AS INT))"))).as("p_name"),
      col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")
    write(t("orders").crossJoin(repl).select(shift("o_orderkey"),
      shift("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")), "orders")
    write(t("lineitem").crossJoin(repl).select(shift("l_orderkey"),
      shift("l_partkey"), shift("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")), "lineitem")
    write(t("events").crossJoin(repl).select(shift("event_id"), col("ts"),
      shift("user_id"), col("event_type"), col("value"), col("props")), "events")
    write(t("documents").crossJoin(repl).select(
      shift("doc_id"),
      when(col("r") === 0, col("text")).otherwise(expr(
        """array_join(transform(
          |  filter(transform(split(text, ' '), x -> regexp_replace(x, '[^A-Za-z]', '')),
          |         x -> x <> ''),
          |  x -> concat(x, 'q', chr(97 + CAST(r / 10 AS INT)),
          |                      chr(97 + CAST(r % 10 AS INT)))), ' ')""".stripMargin))
        .as("text"),
      col("lang"), col("source"), col("n_chars")), "documents")
    val dim = t("embeddings").select(size(col("embedding")).as("d")).head.getInt(0)
    write(t("embeddings").crossJoin(repl).select(
      shift("vec_id"),
      expr(s"""transform(
        |  concat(slice(embedding, CAST(r % $dim AS INT) + 1, $dim - CAST(r % $dim AS INT)),
        |         slice(embedding, 1, CAST(r % $dim AS INT))),
        |  x -> IF(r >= $dim, -x, x))""".stripMargin).cast("array<float>").as("embedding"),
      col("label")), "embeddings")
    spark.stop()
  }
}
