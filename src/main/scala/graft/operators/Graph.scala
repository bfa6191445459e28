package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the part co-occurrence graph (parts sharing
  * an order — the same graph mr_pagerank walks; reference analogue:
  * the iterative-job surface of mapreduce.c:440+'s scheduler, which
  * classic MapReduce graph jobs like triangle counting / BFS were the
  * canonical users of).
  *
  * Both operators here are pure integer arithmetic on ids/hops, so
  * the DuckDB oracles replay them bit-exact (the mr_pagerank
  * pattern): no convergence contracts, exact hash equality.
  */
object Graph {

  /** Distinct (orderkey, partkey) incidence — collapsed BEFORE any
    * pair join so a part listed twice in an order can't inflate pair
    * volume, and hot-basket-capped so no single order can go
    * quadratic in the pair self-join (the shared [[Incidence]]
    * guard; cap non-binding on testdata, audit via
    * q_basket_cap_audit).
    */
  private def incidence(spark: SparkSession, dir: String): DataFrame =
    Incidence.capped(spark, dir)

  /** Undirected co-occurrence edge set, each edge ONCE as (a < b).
    * Dedup rides one pinned exchange on `a` (hash(a) satisfies the
    * (a, b) dedup clustering — the pagerank edge-build pattern) so
    * the downstream degree join starts co-partitioned.
    */
  private def undirectedEdges(li: DataFrame): DataFrame =
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .select("a", "b")
      .repartition(pinnedShufflePartitions(li), col("a"))
      .dropDuplicates("a", "b")

  /** Per-node triangle participation counts.
    *
    * Scale design — DEGREE-ORDERED orientation (Cohen's MR triangle
    * counting / Latapy): each undirected edge is oriented from its
    * lower-(degree, id) endpoint to the higher one, so every node's
    * OUT-degree is O(sqrt(E)) regardless of skew. The wedge self-join
    * (the quadratic step) then does sum(outdeg²) work, which
    * degree-ordering bounds by O(E^1.5) — an id-ordered orientation
    * leaves a low-id celebrity node with outdeg = its full degree and
    * the wedge join goes quadratic on exactly the hub the 100 TB
    * graph will have. The oracle uses the simple a<b orientation:
    * any acyclic orientation enumerates each triangle exactly once,
    * so the RESULT is orientation-independent — only the join volume
    * differs (documented asymmetry, not a semantic one).
    *
    * Three shuffle joins on ids (wedge + closing-edge + degree
    * attach), one aggregation; no driver-side data.
    */
  /** Degree-ordered acyclic orientation of a once-per-edge (a, b)
    * set: each edge points from its lower-(degree, id) endpoint to
    * the higher one, carrying the dst endpoint's degree as `ddeg`.
    * Guarantees max out-degree O(sqrt(E)) — the property the wedge
    * join's cost bound rests on (spec-pinned on an adversarial
    * low-id hub graph where id-ordering degenerates).
    */
  /** Pack a deduped directed pair set (a, b) — already hash(a)-
    * partitioned by the pinned dedup exchange — into CHUNKED adjacency
    * rows (a, targets array<long>, outdeg), zero-exchange on top of
    * the pair dedup (outdeg aggregate, its join-back, and the chunked
    * group-by all cluster on a subset of hash(a)'s keys).
    *
    * Why (r13 optimization, guide §2.3 "shuffle fewer bytes" applied
    * to the iterative reread): pagerank/bfs re-read their edge
    * checkpoint EVERY round, and flat (a, b, outdeg) row blocks
    * measured ~120 B/edge of block-manager volume (220 MB per round
    * at sf0.1); packed long arrays carry the same edges at ~8 B each,
    * a ~15× smaller per-round read, and the explode back to edge rows
    * is codegen inside the round's stage. The salt chunks every
    * node's targets at ≤ `chunk` entries (salt domain sized from the
    * node's own outdeg), so one 100 TB celebrity hub becomes
    * outdeg/chunk bounded rows, never one unbounded aggregation
    * buffer — the flat edge list's memory profile, preserved.
    * Contribution semantics are untouched: each (a, b) edge reappears
    * exactly once under its (a, chunk) row with the node's full
    * outdeg carried alongside.
    */
  private[graft] def adjacencyChunked(pairs: DataFrame, chunk: Int = 1024): DataFrame = {
    val outdeg = pairs.groupBy("a").agg(cnt.as("outdeg"))
    pairs.join(outdeg, "a")
      .withColumn("salt", pmod(xxhash64(col("b")),
        greatest(lit(1L), ceil(col("outdeg").cast("double") / chunk).cast("long"))))
      .groupBy(col("a"), col("salt"))
      .agg(collect_list(col("b")).as("targets"), max("outdeg").as("outdeg"))
      .drop("salt")
  }

  private[graft] def orientByDegree(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(cnt.as("deg"))
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "dega"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "degb"), "b")
    val aFirst = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("degb")).otherwise(col("dega")).as("ddeg"))
  }

  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(incidence(spark, dir))
    // materialized ONCE: the adjacency build and both edge joins read
    // it — without this the whole edge-build cascade (distinct + pair
    // self-join + degree joins) re-executes per branch (the
    // dupClustersStars lesson). Checkpointed PINNED on src (r13,
    // guide §2.5): the adjacency groupBy(src) and the u-side edge
    // join then both run exchange-free off the checkpoint's layout,
    // and the checkpoint holds the configured shuffle width instead
    // of whatever AQE coalesced the orientation joins to.
    val p = pinnedShufflePartitions(und)
    val oriented = orientByDegree(und)
      .repartition(p, col("src")).localCheckpoint()
    trianglesAdjacency(oriented)
  }

  /** EDGE-ITERATOR triangle counting over a degree-ordered oriented
    * edge set: for each oriented base edge (u, v), the closing nodes
    * are exactly `out(u) ∩ out(v)` (an acyclically oriented triangle
    * has one source u with out-edges to both others and a middle v
    * with an out-edge to the sink w — so each triangle is found ONCE,
    * at its unique (source, middle) base edge). Per-node counts: the
    * base edge's u and v each join |W| triangles through it, each
    * w ∈ W one.
    *
    * Why this shape over materializing the wedge set and joining it
    * with the closing edges: the wedge relation has Σ outdeg² rows
    * (34× the edge count on the test graph, and the gap widens with
    * density) — it must be produced as JOIN OUTPUT ROWS and pushed
    * through a second join. Here the same Σ outdeg² element volume
    * moves as PACKED ARRAYS replicated onto E edge rows (two
    * co-partitioned joins on node ids), and the quadratic step is
    * `array_intersect` — a tight per-row hash intersection inside
    * whole-stage codegen, no second join, no wedge rows. Degree
    * ordering still bounds every array at O(sqrt(E)), so a replicated
    * adjacency row is ≤ O(sqrt(E)) longs even on the 100 TB graph's
    * celebrity hubs, and the work stays O(E^1.5) — measured vs the
    * wedge join on identical oriented inputs (ProbeTriangles): 4.1 →
    * 1.3 s at sf0.1, 35.9 → 6.0 s at sf1 (12M edges, 18.8M
    * triangles; 6×, and the gap widens with scale exactly because
    * the avoided cost is the quadratic term's row machinery).
    */
  private[graft] def trianglesAdjacency(oriented: DataFrame): DataFrame = {
    val p = pinnedShufflePartitions(oriented)
    val adj = oriented.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    // u always has out-edges (v is one); a v with NO out-edges closes
    // nothing through this base edge — inner joins are exact
    //
    // HOW the arrays attach is the query's real cost (r13, measured —
    // guide §2.3 "shuffle keys and metadata instead of payloads"): the
    // adjacency TABLE carries exactly E longs across N rows (~6 MB at
    // sf0.1), but an edge row WITH its nu array attached averages
    // Σ outdeg²/E ≈ 34 longs — shuffling withU through the v-side
    // repartition moved 269 MB for a 6 MB edge set (the profiled 2.0 s
    // + 0.5 s dominant stage pair). Under the measured row gate the
    // whole adjacency broadcasts instead, BOTH attachments become
    // broadcast-hash probes, and the wedge volume never crosses an
    // exchange: scan → probe nu → probe nv → array_intersect, one
    // codegen stage at the checkpoint's pinned width. Past the gate
    // (the 100 TB graph) the shuffle shape below is the honest
    // fallback: both sides repartitioned to pinned width on the join
    // key (AQE coalesced this small-compressed-bytes exchange to 5
    // tasks while each row carries an O(√E)-array intersection).
    val e = oriented.count() // scalar over checkpointed blocks, no rescan
    val withUV =
      if (e <= IterativeBroadcastRowGate) {
        oriented.select(col("src").as("u"), col("dst").as("v"))
          .join(broadcast(adj.select(col("src").as("u"), col("nbrs").as("nu"))), "u")
          .join(broadcast(adj.select(col("src").as("v"), col("nbrs").as("nv"))), "v")
      } else {
        val withU = oriented.select(col("src").as("u"), col("dst").as("v"))
          .join(adj.select(col("src").as("u"), col("nbrs").as("nu")), "u")
        withU.repartition(p, col("v"))
          .join(adj.select(col("src").as("v"), col("nbrs").as("nv"))
            .repartition(p, col("v")), "v")
      }
    val closed = withUV
      .select(col("u"), col("v"), array_intersect(col("nu"), col("nv")).as("ws"))
      .withColumn("n_closed", size(col("ws")).cast("long"))
      .filter(col("n_closed") > 0)
      .localCheckpoint() // read twice below; the intersect runs ONCE
    val uv = closed.select(
      explode(array(col("u"), col("v"))).as("node"), col("n_closed").as("n"))
    val ws = closed.select(explode(col("ws")).as("node"), lit(1L).as("n"))
    uv.unionByName(ws).groupBy("node").agg(sum("n").cast("long").as("n_triangles"))
      .select(col("node").as("part_id"), col("n_triangles"))
  }

  /** The round-6 wedge-materialization formulation, kept for the
    * ProbeTriangles head-to-head (and as the fallback shape if a
    * future graph's adjacency arrays outgrow executor rows): wedges
    * u -> (v, w) with (deg,id)(v) < (deg,id)(w) as join output, then
    * one equi-join on (v, w) with the closing edge set — broadcast
    * under the measured gate, shuffle join past it.
    */
  private[graft] def trianglesWedge(oriented: DataFrame): DataFrame = {
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("vdeg"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("wdeg"))
    val wedges = o1.join(o2, "src")
      .filter(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
    // the edge side is checkpointed, which hides its (small) size
    // behind a LogicalRDD, so the planner can never pick the
    // broadcast join on its own — gate it HERE on the measured edge
    // count: under the gate the wedges stream through a broadcast-
    // hash probe with no exchange; over it (the 100 TB graph) this
    // falls back to the ordinary shuffle join.
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val closingSide = broadcastUnderGate(closing, oriented.count())
    val tris = wedges.join(closingSide, Seq("v", "w"))
      .select(col("src").as("u"), col("v"), col("w"))
    // one narrow explode per triangle row — a 3-arm union would
    // re-execute the wedge join three times
    tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(cnt.as("n_triangles"))
      .select(col("node").as("part_id"), col("n_triangles"))
  }

  /** Hop distance from the minimum part id, `rounds` relaxation
    * rounds of unit-weight Bellman-Ford (frontier join + min
    * aggregate per round — exactly one map/shuffle/reduce per round,
    * the iterative-MR shape). A FIXED round count (not
    * run-to-convergence) keeps the oracle bit-exact by unrolled CTEs
    * whatever the graph diameter; unreached nodes are absent. On the
    * dense co-occurrence graph 4 rounds reach everything reachable;
    * a caller chasing a high-diameter graph raises `rounds` (cost is
    * linear in rounds — same contract as mr_pagerank's iters).
    */
  def bfs(spark: SparkSession, dir: String, rounds: Int = 4): DataFrame = {
    val li = incidence(spark, dir)
    // both directions: frontier expansion needs src->dst for every
    // edge. Same one-pinned-exchange dedup as the pagerank edge build
    // (r13, guide §2.4/§2.5): hash(a) satisfies the (a, b) dedup
    // clustering, and the pinned width keeps every frontier-expansion
    // round (broadcast dist ⋈ pairs) at full parallelism instead of
    // the 2-partition checkpoint AQE left behind.
    val pairs = adjacencyChunked(
      li.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
        .filter(col("a") =!= col("b"))
        .select("a", "b")
        .repartition(pinnedShufflePartitions(li), col("a"))
        .dropDuplicates("a", "b"))
      .select(col("a"), col("targets")).localCheckpoint()
    // one-row aggregate scalars (graph parameters, not data): the BFS
    // source and the node count that gates the frontier broadcast
    val hdr = li.agg(min("l_partkey").cast("long"),
      countDistinct("l_partkey")).head
    val (src, n) = (hdr.getLong(0), hdr.getLong(1))
    // the frontier is at most one narrow row per node while the edge
    // set is ~avg-degree× larger, and the per-round localCheckpoint
    // hides the frontier's size — same measured-gate broadcast as
    // pagerank's rank table, shuffle-join fallback past the gate
    def small(df: DataFrame): DataFrame = broadcastUnderGate(df, n)
    var dist = li.sparkSession.range(1)
      .select(lit(src).as("node"), lit(0L).as("dist"))
    for (i <- 1 to rounds) {
      // frontier expansion over the packed adjacency: one broadcast
      // probe per chunk row, explode back to edge rows inside the
      // same codegen stage — identical (node, dist+1) stream as the
      // flat-edge join, read from the 15×-smaller checkpoint
      dist = dist.unionAll(
          small(dist).join(pairs, col("node") === col("a"))
            .select(explode(col("targets")).as("node"),
              (col("dist") + 1L).as("dist")))
        .groupBy("node").agg(min("dist").as("dist"))
      // `dist` appears TWICE per round (carry + expand), so an
      // unrolled plan doubles per round — the per-round checkpoint
      // that pagerank could drop (single reference there) is
      // mandatory here, exactly as in the CC loop
      if (i < rounds) dist = dist.localCheckpoint()
    }
    dist.select(col("node").as("part_id"), col("dist"))
  }
}
