package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head of the two graph_triangles formulations over the same
  * degree-ordered oriented edge set (see Graph.trianglesAdjacency's
  * scaladoc for the cost argument):
  *   wedge — materialize the Σ outdeg² wedge relation as join output,
  *           then join with the closing edges;
  *   adj   — per-edge array_intersect of packed adjacency lists (no
  *           wedge rows, no second join).
  * Asserts both produce IDENTICAL per-node counts before timing.
  * Run: `SPARK_GRAFT_SF_DIR=tmp/sf1 sbt "Test/runMain graft.ProbeTriangles"`.
  */
object ProbeTriangles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = operators.Incidence.capped(spark, sfDir)
    val und = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val oriented = operators.Graph.orientByDegree(und).localCheckpoint()
    println(s"[probe] edges=${oriented.count()}")
    // equality first: same per-node counts from both shapes
    val fromWedge = operators.Graph.trianglesWedge(oriented)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fromAdj = operators.Graph.trianglesAdjacency(oriented)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    require(fromWedge == fromAdj,
      s"formulations disagree: wedge=${fromWedge.size} nodes, adj=${fromAdj.size}")
    println(s"[probe] agree on ${fromAdj.size} nodes, " +
      s"${fromAdj.values.sum / 3} triangles")
    def timed(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label min=${ts.head}%.2f s all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    timed("wedge")(operators.Graph.trianglesWedge(oriented).count())
    timed("adj")(operators.Graph.trianglesAdjacency(oriented).count())
    spark.stop()
  }
}
