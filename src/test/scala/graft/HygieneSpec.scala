package graft

/** Temp-root hygiene (round-12 verdict #2): every lakehouse oracle
  * query builds throwaway versioned tables under a fresh temp root;
  * the localize-and-delete rule (VersionedQueries.withRoot) must leave
  * /tmp exactly as found — the round-12 audit counted 4,257 leaked
  * `graft-vq-*` dirs / 4.9 GB on the bench host from the ~47 sites
  * that skipped the rule. This spec runs EVERY temp-root-building
  * query in the suite at sf0.001 and hard-asserts zero new graft-*
  * dirs. Bench.scala reports the same residue per-round as the
  * `tmp_leaked` JSON field.
  */
class HygieneSpec extends SparkSpec {

  private def graftTmpDirs(): Set[String] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.list()).map(_.toSet).getOrElse(Set.empty)
      .filter(_.startsWith("graft-"))
  }

  // every SparkEntry key whose implementation creates a temp root:
  // the §2.7 lakehouse battery (VersionedQueries.withRoot) plus the
  // incremental-dedup demo's persisted LSH index (Dedup.scala)
  private val tempRootQueries = Seq(
    "q_upsert_versioned", "q_time_travel", "q_zone_map_read",
    "q_zone_map_date", "q_zone_map_decimal", "q_zone_map_nested",
    "q_zone_map_multi", "q_zone_map_string", "q_zone_map_auto",
    "q_zone_map_nulls", "q_zone_map_prefix", "q_check_constraint",
    "q_drop_column", "q_rename_column", "q_add_column",
    "q_table_changes", "q_delete_versioned", "q_update_versioned",
    "q_delete_mor", "q_update_mor", "q_count_meta", "q_restore",
    "q_clone", "q_mat_view", "q_mat_view_bucketed", "q_mat_view_stats",
    "q_mat_view_minmax", "q_mat_view_join", "q_mat_view_chain",
    "q_mat_view_nested", "q_mat_view_factored", "q_partition_join",
    "q_partition_join_outer", "q_id_mapping", "q_multi_commit",
    "q_multi_mutate", "q_drop_partition", "q_optimize_cluster",
    "q_optimize_zorder", "q_sql_catalog", "q_sql_dml", "q_sql_merge",
    "q_sql_partitioned", "q_sql_mat_view", "q_sql_mat_view_shapes",
    "q_sql_call", "q_sql_merge_by_source", "q_sql_merge_clauses",
    "q_sql_history", "q_bloom_skip", "q_dedup_incremental")

  test("every temp-root query leaves /tmp exactly as it found it") {
    // each listed key must exist — a renamed query must update this list
    val missing = tempRootQueries.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown query keys: ${missing.mkString(", ")}")
    val before = graftTmpDirs()
    for (name <- tempRootQueries) {
      val out = SparkEntry.queries(name)(spark, sf)
      assert(out.collect() != null, s"$name must evaluate") // force
      val leaked = graftTmpDirs() -- before
      assert(leaked.isEmpty,
        s"$name leaked temp roots: ${leaked.mkString(", ")}")
    }
  }

  test("temp views registered by the q_sql_* bodies are dropped too") {
    // the round-12 ADVICE leak: qSqlMatViewShapes left its two temp
    // views in the session catalog across a multi-query bench run
    SparkEntry.queries("q_sql_mat_view_shapes")(spark, sf).collect()
    val left = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("vq_sqlmvs_"))
    assert(left.isEmpty, s"leaked temp views: ${left.map(_.name).mkString(", ")}")
  }
}
