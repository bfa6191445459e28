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

  test("q6: date range, discount band and quantity cap all reach the parquet scan") {
    // read the scan's own metadata — the plan toString truncates the
    // PushedFilters list
    val pushed = operators.TpchExtra.q6Revenue(spark, sf).queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("PushedFilters")
    }.mkString(";")
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount", "LessThan(l_quantity"))
      assert(pushed.contains(f), s"missing pushed filter $f in: $pushed")
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

  // --- join-strategy honesty: forced broadcast() only on fixed-size inputs ---

  /** Run a thunk with session confs overridden, restoring them after. */
  private def withConfs[T](kv: (String, String)*)(f: => T): T = {
    val prev = kv.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** With the auto-broadcast threshold disabled, any BroadcastHashJoin
    * that survives can only come from a forced hint.
    */
  private def withNoAutoBroadcast[T](f: => T): T =
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1")(f)

  test("SF-scaling tables are never hint-broadcast (threshold=-1 ⇒ no BHJ on them)") {
    withNoAutoBroadcast {
      // q3/q18/q_broadcast_join/tfidf join ONLY scaling tables → zero BHJ
      for ((name, df) <- Seq(
          "q3" -> Relational.q3Topk(spark, sf),
          "q18" -> operators.TpchExtra.q18BigOrders(spark, sf),
          "q_broadcast_join" -> Relational.qBroadcastJoin(spark, sf),
          "tfidf" -> operators.TextAnalysis.tfidf(spark, sf))) {
        val p = plan(df)
        assert(!p.contains("BroadcastHashJoin"),
          s"$name still hint-broadcasts a scaling table:\n${p.take(2000)}")
      }
      // q5/q7/q10 keep hints ONLY on nation/region: exactly those BHJs remain
      assert("BroadcastHashJoin".r.findAllIn(plan(Relational.q5Multijoin(spark, sf))).size == 2,
        "q5 must broadcast exactly nation+region under threshold=-1")
      assert("BroadcastHashJoin".r.findAllIn(plan(operators.TpchExtra.q7Volume(spark, sf))).size == 2,
        "q7 must broadcast exactly its two nation dims under threshold=-1")
      assert("BroadcastHashJoin".r.findAllIn(plan(operators.TpchExtra.q10Returns(spark, sf))).size == 1,
        "q10 must broadcast exactly nation under threshold=-1")
    }
  }

  test("at small SF the size-checked planner still broadcasts the scaling dims (plans unchanged)") {
    // same queries, default threshold: AQE/size estimates pick BHJ for
    // customer/part — the sf0.1 plans did not regress by dropping hints
    assert(plan(Relational.q3Topk(spark, sf)).contains("BroadcastHashJoin"), "q3 customer")
    assert(plan(Relational.qBroadcastJoin(spark, sf)).contains("BroadcastHashJoin"), "part")
    assert(plan(operators.TpchExtra.q18BigOrders(spark, sf)).contains("BroadcastHashJoin"), "q18 customer")
  }

  test("tfidf: the term join shuffles; only the one-row doc count is broadcast") {
    val p = withNoAutoBroadcast(plan(operators.TextAnalysis.tfidf(spark, sf)))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "tf⋈dfreq must be a shuffle join:\n" + p.take(2000))
  }

  test("runtime bloom filter injects into the fact side of fact⋈filtered-dim joins") {
    // the rule is ON by default (Spark 4 ships
    // spark.sql.optimizer.runtime.bloomFilter.enabled=true) but gated
    // by a 10 GB application-side scan threshold — exactly the 100 TB
    // regime. Zeroing the gate at test SF proves the plan SHAPE is
    // injectable: a selective dim filter becomes a bloom_filter_agg
    // subquery and the fact scan gains a might_contain predicate,
    // pruning fact rows before the shuffle.
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // the 100 TB join shape
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val q10 = operators.TpchExtra.q10Returns(spark, sf).queryExecution.optimizedPlan.toString
      assert(q10.contains("bloom_filter_agg") && q10.contains("might_contain"), q10.take(2500))
      val q3 = Relational.q3Topk(spark, sf).queryExecution.optimizedPlan.toString
      assert(q3.contains("might_contain"), q3.take(2500))
    }
  }

  test("AQE splits skewed shuffle-join partitions (OptimizeSkewedJoin fires)") {
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, when}
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0") {
      // 90% of rows share key 0 → one shuffle partition dwarfs the rest
      val big = spark.range(0L, 300000L)
        .select(when(col("id") % 10 < 9, 0L).otherwise(pmod(col("id"), lit(1000))).as("k"))
      val small = spark.range(0L, 1000L).select(col("id").as("k2"), (col("id") * 2).as("v"))
      val j = big.join(small, col("k") === col("k2")).agg(sum("v").as("sv"))
      j.collect() // AQE decides from runtime stats — must execute
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "OptimizeSkewedJoin did not rewrite:\n" + p.take(2500))
    }
  }

  test("no operator source carries broadcast() on an SF-scaling table (source audit)") {
    import scala.jdk.CollectionConverters._
    val roots = Seq("src/main/scala/graft/operators", "src/main/scala/graft/dedup",
      "src/main/scala/graft/similarity", "src/main/scala/graft/streaming")
    val scaling = Seq("customer", "supplier", "part\"", "dfreq")
    val offenders = roots.flatMap { r =>
      java.nio.file.Files.walk(java.nio.file.Paths.get(r)).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { f =>
          java.nio.file.Files.readAllLines(f).asScala.zipWithIndex.collect {
            case (line, i) if !line.trim.startsWith("*") && !line.trim.startsWith("//") &&
              line.contains("broadcast(") &&
              scaling.exists(line.contains(_)) => s"$f:${i + 1}: ${line.trim}"
          }
        }
    }
    assert(offenders.isEmpty, "forced broadcast on scaling tables:\n" + offenders.mkString("\n"))
  }
}
