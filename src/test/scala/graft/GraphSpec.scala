package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Graph operators (SURVEY.md §2.1 iterative-MR companions).
  *
  * Triangle counting's scale trick is the degree-ordered edge
  * orientation — but any acyclic orientation must enumerate the SAME
  * triangle set, so the spec recomputes counts with the naive a<b
  * orientation (the oracle's form) and requires equality. BFS is
  * pinned by its metric properties rather than a second
  * implementation: source at 0, neighbors differ by ≤1 hop.
  */
class GraphSpec extends SparkSpec {

  private def edges = {
    val li = core.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  test("triangle counts are orientation-independent (degree-ordered == a<b)") {
    val e = edges.cache()
    try {
      // naive a<b orientation: e1=(u,v), e2=(v,w), closing (u,w)
      val e1 = e.select(col("a").as("u"), col("b").as("v"))
      val e2 = e.select(col("a").as("v"), col("b").as("w"))
      val e3 = e.select(col("a").as("u"), col("b").as("w"))
      val tris = e1.join(e2, "v").join(e3, Seq("u", "w"))
      val naive = tris.select(col("u").as("part_id"))
        .unionAll(tris.select(col("v").as("part_id")))
        .unionAll(tris.select(col("w").as("part_id")))
        .groupBy("part_id").agg(count(lit(1)).as("n_triangles"))
      val fast = Graph.triangles(spark, sf)
      assert(fast.count() > 0, "test graph has triangles")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        "degree-ordered orientation must enumerate the identical triangle set")
    } finally e.unpersist()
  }

  test("degree orientation defuses the low-id hub that id-ordering squares on") {
    import TestSpark.spark.implicits._
    // adversarial graph: hub node 1 (LOWEST id) connected to 200
    // leaves — a<b orientation would give the hub outdeg 200 and the
    // wedge join C(200,2) pairs; degree-ordering points every edge AT
    // the hub (leaf deg 1 < hub deg 200), so hub outdeg is 0
    val und = (2L to 201L).map(leaf => (1L, leaf)).toDF("a", "b")
    val out = Graph.orientByDegree(und)
      .groupBy("src").agg(count(lit(1)).as("outdeg"))
    assert(out.filter(col("src") === 1L).isEmpty, "hub must have outdeg 0")
    val maxOut = out.agg(max("outdeg")).head.getLong(0)
    assert(maxOut <= 1L, s"every leaf orients its single edge at the hub (max=$maxOut)")
    // and the O(sqrt E) bound on a graph that HAS triangles: a 20-clique
    val clique = (for { i <- 1L to 20L; j <- (i + 1) to 20L } yield (i, j)).toDF("a", "b")
    val e = clique.count()
    val cliqueMax = Graph.orientByDegree(clique)
      .groupBy("src").agg(count(lit(1)).as("outdeg"))
      .agg(max("outdeg")).head.getLong(0)
    assert(cliqueMax <= math.ceil(math.sqrt(2.0 * e)).toLong + 1,
      s"clique max outdeg $cliqueMax exceeds the O(sqrt E) bound")
  }

  test("adjacency-intersection and wedge formulations agree per node") {
    import TestSpark.spark.implicits._
    // a 6-clique plus a pendant path: cliques stress the intersection
    // (every edge closes 4 triangles), the path contributes none
    val und = ((for { i <- 1L to 6L; j <- (i + 1) to 6L } yield (i, j)) ++
      Seq((6L, 7L), (7L, 8L))).toDF("a", "b")
    val oriented = Graph.orientByDegree(und).localCheckpoint()
    val adj = Graph.trianglesAdjacency(oriented)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wedge = Graph.trianglesWedge(oriented)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(adj === wedge)
    // each clique node sits in C(5,2) = 10 triangles; path nodes in none
    assert((1L to 6L).forall(adj(_) == 10L) && !adj.contains(8L))
  }

  test("bfs distances: source at 0, edge endpoints within 1 hop") {
    val d = Graph.bfs(spark, sf).cache()
    try {
      val srcRow = core.Tables.load(spark, sf, "lineitem")
        .agg(min("l_partkey").cast("long")).head.getLong(0)
      assert(d.filter(col("part_id") === srcRow && col("dist") === 0).count() == 1)
      // metric consistency: for every edge with both endpoints reached,
      // |d(u) - d(v)| <= 1 (a violated edge means a missed relaxation)
      val du = d.withColumnRenamed("part_id", "a").withColumnRenamed("dist", "da")
      val dv = d.withColumnRenamed("part_id", "b").withColumnRenamed("dist", "db")
      val bad = edges.join(du, "a").join(dv, "b")
        .filter(abs(col("da") - col("db")) > 1)
      assert(bad.isEmpty, "every reached edge must satisfy |d(u)-d(v)| <= 1")
    } finally d.unpersist()
  }
}
