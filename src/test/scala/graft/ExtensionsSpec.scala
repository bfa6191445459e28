package graft

import org.apache.spark.sql.SparkSession
import graft.plans.{GraftExtensions, GraftFunctions}

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions exposes graft_dot to SQL") {
    // force a fresh session (same context) so extensions apply
    val prev = spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[2]")
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      val got = s.sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head.getDouble(0)
      assert(got === 32.0)
      val norm = s.sql("SELECT graft_normalize(array(3.0d, 4.0d)) AS v")
        .head.getSeq[Double](0)
      assert(norm === Seq(0.6, 0.8))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("UDF kernels register through the public session API") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT graft_simhash('alpha beta gamma') AS sh,
        |       size(graft_minhash('one two three four five')) AS msize,
        |       graft_ref_tokens('Hello, World!') AS toks""".stripMargin).head
    assert(row.getLong(0) !== 0L)
    assert(row.getInt(1) === 64)
    assert(row.getSeq[String](2) === Seq("hello", "world"))
  }
}
