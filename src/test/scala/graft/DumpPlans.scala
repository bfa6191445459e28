package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans for the flagship
  * queries, as reviewed evidence of scan pruning / pushdown /
  * broadcast / custom-operator placement.
  * Run: sbt "Test/runMain graft.DumpPlans"
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // the SQL read paths (q_sql_catalog / q_sql_partitioned) need
      // the same activation pair Verify/Bench set
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "q1_agg", "q3_topk", "q5_multijoin", "q_asof_join",
      "q_topk_native", "dedup_minhash_lsh", "ann_bruteforce", "q_rollup",
      "q_range_join", "ann_ivf", "ann_lsh", "dedup_embedding",
      "pipeline_corpus", "dedup_cross", "q_array_funcs", "text_repetition",
      "q7_volume", "q10_returns", "q_funnel",
      "q6_revenue", "text_tfidf", "text_chunk", "dedup_ngram_jaccard",
      // text_contamination omitted: its lazy localCheckpoint boundary
      // hides the parquet scans behind LogicalRDD, so the dump carries
      // no pushdown evidence for it
      "q8_market_share", "q13_custdist", "q19_disjunctive", "q21_waiting",
      "q20_excess", "q2_min_cost", "q9_profit", "q11_important",
      // ann_quantized omitted for the same localCheckpoint/LogicalRDD
      // reason as text_contamination — its dump would carry no scan
      // evidence (and would run the full quantize pass to get it)
      "q12_ship_priority", "q_resample_by_key", "q_topk_weighted",
      // graph_triangles / graph_bfs omitted since the 5f25929 rework:
      // their eager localCheckpoint boundary (oriented-edges reuse,
      // per-round BFS dist) hides the scans behind LogicalRDD — same
      // policy as text_contamination/ann_quantized below, and dumping
      // them would execute the full edge build for no plan evidence
      "text_lm_score", "text_keywords",
      "q_profile", "q_weighted_sample", "q_mode", "q_window_distinct",
      "q_incremental_agg", "q_retention", "q_islands", "q_skyline",
      "q_session_window", "q_fuzzy_join",
      // q_ntile: dumped DELIBERATELY despite the LogicalRDD boundary —
      // the eager localCheckpoint of the range exchange IS the cost
      // story (the TotalOrderRank barrier two consumers share); the
      // dump shows everything downstream is a broadcast-offsets join +
      // parallel per-partition windows, i.e. the 2.6x-vs-round-2 delta
      // is the barrier materialization, not a plan regression (the
      // round-2 number came from the scale-broken single-partition
      // global window)
      "q_ntile",
      // q_zone_map_read: the scan evidence IS the point — the parquet
      // scan lists ONLY the manifest files the zone maps kept, and
      // the residual range predicate shows up in PushedFilters on the
      // native column type (no cast wrapper)
      "q_zone_map_read",
      // round-7 siblings: the scan lists only the date-era / price-band
      // files the DATE / DECIMAL zone maps kept, with the residual
      // range pushed on the native column type
      "q_zone_map_date", "q_zone_map_decimal",
      // q_zone_map_multi: the scan lists ONLY the one era x band
      // cluster both zone-map predicates kept, with BOTH native
      // residuals in PushedFilters; q_zone_map_string: the string-
      // domain twin (lexicographic BETWEEN pushed on the survivors)
      "q_zone_map_multi", "q_zone_map_string",
      // q_zone_map_auto: the scan node is a FileSourceScanExec over
      // the ZoneMapFileIndex — same pushed filters as a plain parquet
      // scan, but the file listing itself is zone-map-pruned
      "q_zone_map_auto",
      // q_bloom_skip: the same FileSourceScanExec shape, but the
      // listing is BLOOM-pruned on a hash-scattered layout the zone
      // maps keep whole — the IN residual stays in PushedFilters for
      // the (few) surviving files
      "q_bloom_skip",
      // q_zone_map_prefix: the startsWith probe through the same
      // index (prefix -> [p, p++DEL) interval); q_optimize_zorder:
      // the Z-order-clustered layout read through it
      "q_zone_map_prefix", "q_optimize_zorder",
      // q_synth_docs: the DSv2 scan line carries PushedFilters (the
      // doc_id range) and a pruned ReadSchema (doc_id, lang — text is
      // never generated)
      "q_synth_docs",
      // q_zone_map_nulls: the scan over the ZoneMapFileIndex lists
      // only null-bearing-or-unknown files for the IsNotNull probe;
      // IsNotNull itself stays in PushedFilters for the row groups
      "q_zone_map_nulls",
      // text_feature_hash: one kernel UDF pass + explode + keyed
      // aggregate; text_chunk_dedup is dumped for the join/aggregate
      // topology only — its chunk frame is lazily checkpointed (two
      // consumers, the ngram shingle pattern), so the scan hides
      // behind a LogicalRDD like the graph family
      "text_feature_hash", "text_chunk_dedup",
      // q_partition_join_outer: the aligned LEFT join's plan — one
      // pair-local join per matched value plus the left-rest branch,
      // whose "join" against the empty dim frame Catalyst folds to a
      // null-extended Project (no dim scan node under it at all)
      "q_partition_join_outer",
      // q_id_mapping: the scan's ReadSchema carries the PHYSICAL
      // __gcid_<n> names with the logical aliases projected above —
      // the whole id-mapping read path in one plan
      "q_id_mapping",
      // round-10 second half: the pure-SQL read paths. q_sql_catalog's
      // final SELECT plans through the extensions rule onto the same
      // zone-map-indexed parquet scan the Scala read produces;
      // q_sql_partitioned's final aggregate reads the value-routed
      // layout a SQL CREATE…PARTITIONED BY + INSERT + scoped MERGE
      // produced (the partition-composed write story's read half)
      "q_sql_catalog", "q_sql_partitioned",
      // round 11: knn_join's rank tail now heap-cuts through the
      // TWO-PHASE TopKPerGroup (partial exec above the scored join,
      // final exec after a survivors-only exchange) before the tiny
      // Q·k row_number window — the Q×N window shuffle-sort is gone
      // from the plan; ann_ivf's dump (already in the list) shows the
      // same shape plus the graft_nearest codegen assignment with no
      // ScalaUDF in the corpus pass
      "knn_join",
      // round 11: the pure-SQL materialized-view read — the final
      // SELECT over the bucketed state the CREATE/REFRESH statements
      // maintained (plans through the same zone-map-indexed scan)
      "q_sql_mat_view",
      // round 12: the binary-ANN candidate cut routed through the
      // single-phase/partial TopKPerGroup instead of a row_number
      // window (no per-group sort of the Q×N hamming candidates), the
      // graft_sign_bits codegen packing in the corpus projection with
      // no ScalaUDF anywhere, and the derived-read projection of the
      // round-12 SQL MV shapes (mv_avg over hidden count+sum state)
      "ann_binary", "q_sql_mat_view_shapes")
    // the lakehouse queries return driver-local COPIES (the withRoot
    // hygiene rule), whose own plan is a bare LocalTableScan — this
    // property makes withRoot capture the INNER frame's executed plan
    // (the zone-map/bloom-pruned scan evidence this file exists for)
    System.setProperty("graft.dump.inner", "true")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans (generated by graft.DumpPlans)\n\n"
    sb ++= "Evidence for SURVEY.md §5: pushed filters, pruned read schemas,\n"
    sb ++= "broadcast dim joins, TakeOrdered top-k, custom TopKPerGroup.\n"
    picks.foreach { name =>
      graft.operators.VersionedQueries.lastInnerPlan.set("")
      val df = SparkEntry.queries(name)(spark, sf)
      val shown = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val inner = graft.operators.VersionedQueries.lastInnerPlan.get
      val plan = if (inner.nonEmpty && shown.contains("LocalTableScan")) inner
        else shown
      sb ++= s"\n## $name\n\n```\n"
      sb ++= plan.take(6000)
      sb ++= "\n```\n"
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
