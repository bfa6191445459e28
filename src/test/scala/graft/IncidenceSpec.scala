package graft

import org.apache.spark.sql.functions._
import graft.operators.Incidence

/** Hot-basket guard for the co-occurrence pair self-join family
  * (SURVEY §5): one pathological order must not make the
  * pagerank/triangles/bfs/market-basket incidence join quadratic.
  * The spec drives [[Incidence.cappedFrom]] on a synthetic corpus
  * with one 10k-part hot order amid normal baskets and pins (a) the
  * bound, (b) that normal baskets pass through untouched, (c) that
  * the kept slice is deterministic, and (d) that the cap is
  * non-binding on the real test corpus (so the four oracle queries
  * are provably unaffected by the guard).
  */
class IncidenceSpec extends SparkSpec {

  private val Cap = 100
  private val HotParts = 10000

  private def synth = {
    val s = spark
    import s.implicits._
    // order 1: a 10k-part hot basket (raw pair join: 10⁸ rows);
    // orders 2..11: normal 5-part baskets, with duplicate lines so
    // the pre-distinct collapse is exercised too
    val hot = (1 to HotParts).map(p => (1L, p.toLong))
    val normal = for { o <- 2 to 11; p <- 1 to 5; _ <- 1 to 2 }
      yield (o.toLong, (o * 100 + p).toLong)
    (hot ++ normal).toDF("l_orderkey", "l_partkey")
  }

  test("hot basket is sampled to the cap; pair volume is bounded") {
    val capped = Incidence.cappedFrom(synth, Cap)
    val perOrder = capped.groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perOrder(1L) === Cap.toLong, "hot basket cut to exactly the cap")
    (2 to 11).foreach(o => assert(perOrder(o.toLong) === 5L, s"normal basket $o intact"))
    // the quadratic step itself: directed pair volume from the hot
    // order is cap·(cap−1), not 10k·(10k−1)
    val pairs = capped.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(capped.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") =!= col("b"))
    val hotPairs = pairs.filter(col("l_orderkey") === 1L).count()
    assert(hotPairs === Cap.toLong * (Cap - 1),
      s"hot-order pair volume bounded by cap² (got $hotPairs)")
  }

  test("normal baskets pass through exactly; kept slice is deterministic") {
    val capped = Incidence.cappedFrom(synth, Cap)
    val normalIn = synth.filter(col("l_orderkey") > 1L)
      .select("l_orderkey", "l_partkey").distinct()
    val normalOut = capped.filter(col("l_orderkey") > 1L)
    assert(normalOut.except(normalIn).isEmpty && normalIn.except(normalOut).isEmpty,
      "sub-cap baskets are byte-identical through the guard")
    val again = Incidence.cappedFrom(synth, Cap)
    assert(capped.except(again).isEmpty && again.except(capped).isEmpty,
      "hash-rank sampling is deterministic across runs")
  }

  test("capped incidence self-join survives sort-merge planning (the sf1 zip bug)") {
    // At bench scale the pair self-join plans as SMJ, whose
    // zipPartitions requires the two sides' ACTUAL partition counts to
    // agree with the claimed co-partitioning. The pre-fix union
    // (anti-join branch + window branch) reported a co-partitioned
    // hash layout while physically holding both branches' partitions —
    // graph_bfs/graph_triangles/mr_pagerank all failed at sf1 with
    // "Can't zip RDDs with unequal numbers of partitions: List(32, 64)".
    // Forcing SMJ at test SF reproduces that planning path.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Incidence.cappedFrom(synth, Cap)
      val pairs = li.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint() // the graph_bfs shape: checkpoint ON the join
      assert(pairs.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("cap is non-binding on the test corpus (oracle-neutral)") {
    val audit = Incidence.capAudit(spark, sf).collect().head
    assert(audit.getLong(0) === 0L, "no hot baskets at test SF")
    assert(audit.getLong(1) === 0L, "nothing would be dropped")
    assert(audit.getLong(2) <= Incidence.MaxBasket.toLong,
      s"max basket ${audit.getLong(2)} within cap ${Incidence.MaxBasket}")
    // and the guarded incidence is exactly the unguarded one
    val raw = core.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    val capped = Incidence.capped(spark, sf)
    assert(capped.except(raw).isEmpty && raw.except(capped).isEmpty,
      "guard is the identity on real data")
  }
}
