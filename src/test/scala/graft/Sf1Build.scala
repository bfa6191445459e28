package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds a full 10× (sf1-equivalent) table set under tmp/sf1 for the
  * whole-suite scale bench (round-4 item 6) — the ScaleProbe only
  * scaled documents/embeddings for targeted probes; this scales ALL
  * ten tables so `graft.Bench` can run the complete suite at 10×.
  *
  * Replication follows the probe's lesson: scale SIZE without
  * touching per-key DENSITY. Relational replicas remap every key
  * family by +r·10⁷ CONSISTENTLY across tables (an order's lineitems
  * follow it into the replica, a customer keeps their orders), so
  * per-order basket sizes, per-customer order counts and per-user
  * event streams are exactly the sf0.1 distributions — only
  * cardinality grows. Dimensions (region/nation) stay fixed, like a
  * real warehouse. documents/embeddings reuse the probe's
  * dup-density-preserving recipes (letter-suffixed token spaces,
  * norm-preserving circular shifts).
  *
  * Run: sbt "Test/runMain graft.Sf1Build"
  */
object Sf1Build {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val out = "tmp/sf1"
    val reps = 10
    val repl = spark.range(0, reps).select(col("id").as("r"))

    def t(name: String): DataFrame = core.Tables.load(spark, src, name)
    def shift(c: String) = (col(c) + col("r") * lit(Off)).as(c)
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[sf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // fixed dimensions
    write(t("region"), "region")
    write(t("nation"), "nation")
    // entity tables: remap only the key family; attributes replicate
    write(t("customer").crossJoin(repl).select(shift("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    write(t("supplier").crossJoin(repl).select(shift("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal")), "supplier")
    // p_name gets a per-replica suffix whose LENGTHS are pairwise
    // > tau apart (3r trailing chars): raw replication makes 10
    // identical copies of every name, which violates q_fuzzy_join's
    // exact-dedup-first contract and inflates its output ~100x
    // (k copies ARE C(k,2) pairs — measured 265 s vs 2 s); an
    // equal-length tag is not enough either, because PassJoin buckets
    // by (length, segment) and same-length replicas share prefix
    // segments — candidate volume x81 despite a clean output
    // (measured 394 s). Length separation > tau makes the size filter
    // itself keep replicas apart, so each replica is an independent
    // 1x-shaped name corpus; prefix/contains LIKE predicates other
    // queries use still match.
    // suffix CONTENT is hash-derived per name (a uniform letter run
    // would itself be boilerplate: every replica-r name sharing one
    // q-run makes giant (length, segment) buckets — measured 130 s
    // residual superlinearity before this)
    write(t("part").crossJoin(repl).select(shift("p_partkey"),
      when(col("r") === 0, col("p_name"))
        .otherwise(concat(col("p_name"), lit(" "),
          expr("substr(md5(p_name), 1, 3 * CAST(r AS INT))"))).as("p_name"),
      col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")
    // fact tables: every foreign key shifts WITH its replica
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
    // corpus tables: the ScaleProbe recipes (distinct token space per
    // replica so shingle df — dup DENSITY — is preserved; embedding
    // replicas are norm-preserving circular shifts)
    write(t("documents").crossJoin(repl).select(
      shift("doc_id"),
      when(col("r") === 0, col("text")).otherwise(expr(
        """array_join(transform(
          |  filter(transform(split(text, ' '), x -> regexp_replace(x, '[^A-Za-z]', '')),
          |         x -> x <> ''),
          |  x -> concat(x, 'q', substr('abcdefghi', CAST(r AS INT), 1))), ' ')""".stripMargin))
        .as("text"),
      col("lang"), col("source"), col("n_chars")), "documents")
    val dim = t("embeddings").select(size(col("embedding")).as("d")).head.getInt(0)
    write(t("embeddings").crossJoin(repl).select(
      shift("vec_id"),
      expr(s"concat(slice(embedding, CAST(r AS INT) + 1, $dim - CAST(r AS INT))," +
        s" slice(embedding, 1, CAST(r AS INT)))").as("embedding"),
      col("label")), "embeddings")
    spark.stop()
  }
}
