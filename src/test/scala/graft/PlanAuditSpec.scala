package graft

import graft.operators.{MRJobs, Relational}

/** Physical-plan audit (SURVEY.md §5/§6): the scale properties we rely
  * on must be visible in the plan, not assumed — filter pushdown to
  * the parquet scan, column pruning, broadcast join selection for
  * dims, TakeOrdered for top-k, range partitioning for total sort.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan; schema pruned") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    // only the 6 referenced columns are read, not all 16
    assert(p.contains("l_returnflag") && !p.contains("l_orderkey"), "pruning")
  }

  test("q1: aggregation is partial (map-side combine) then final") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1500))
  }

  test("q5: dimension joins are broadcast, fact side never shuffles for them") {
    val p = plan(Relational.q5Multijoin(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"expected >=4 broadcast joins:\n${p.take(2000)}")
  }

  test("q3: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.q3Topk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("numbersort: total sort uses range partitioning (reference do_sort_map)") {
    val p = Relational.qDistinct(spark, sf) // warm no-op to keep session hot
    val s = MRJobs.numbersort(spark, sf).queryExecution.executedPlan.toString
    assert(s.contains("rangepartitioning") || s.contains("RangePartitioning"), s.take(1500))
  }

  test("semijoin plans as a join, not an aggregate-distinct rewrite") {
    val p = plan(Relational.qSemijoin(spark, sf))
    assert(p.contains("LeftSemi"), p.take(1500))
  }

  test("vector scan paths use the native normalize, not interpreted HOFs") {
    val p = plan(similarity.Ann.bruteforceTopK(spark, sf))
    assert(p.contains("graft_normalize"), p.take(1500))
    assert(!p.contains("zip_with"), "interpreted HOF normalize crept back:\n" + p.take(1500))
  }

  test("string funcs stay inside whole-stage codegen") {
    val p = Relational.qStringFuncs(spark, sf).queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in toString form
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p.take(1500))
  }
}
