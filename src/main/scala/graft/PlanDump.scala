package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries to PLANS.md —
  * plan-shape evidence (pushdown, broadcast, codegen spans, no
  * BNLJ/Cartesian in the non-equi family).
  * `sbt "runMain graft.PlanDump <sfDir> <outFile>"` */
object PlanDump {
  private val headline = Seq(
    "q_filter_pred", "q_join_equi_star", "q_join_broadcast", "q_join_band",
    "q_join_theta_ineq", "q_join_asof", "q_agg_pricing_summary",
    "q_topk_per_group", "q_sort_limit", "q_llm_dedup_near",
    "q_llm_similarity_topk", "q_sql_tpch_q5", "q_topk_custom_plan",
    // round 3: quantile + sort-merge inequality paths, integral band rule,
    // variable-interval overlap, position-keyed fuzzy join
    "q_join_theta_ineq_quantile", "q_join_theta_ineq_sorted",
    "q_join_band_rule_long", "q_join_interval_var", "q_join_fuzzy",
    // round 4: bloom prefilter before the exact semi join, span-window
    // inverted index, heavy-hitters sketch+verify, z-order binning
    "q_join_bloom_prune", "q_llm_span_dedup", "q_agg_heavy_hitters",
    "q_layout_zorder", "q_join_interval_rule", "q_llm_curate",
    // round 4 continuation: derived-partsupp TPC-H shapes (correlated
    // subquery decorrelation, null-aware anti join), blocked kNN self-join
    "q_sql_tpch_q2", "q_sql_tpch_q16", "q_sql_tpch_q20", "q_llm_knn_join",
    // continuation II: outer band composition, distributed components,
    // partial-prune top-k sampling
    "q_join_band_outer", "q_graph_components", "q_sample_group_fixed",
    // round 6: hybrid graph path (broadcast at this SF; co-partitioned
    // above threshold), 2-deletion fuzzy join, search-based percentiles
    "q_graph_pagerank", "q_graph_triangles", "q_join_fuzzy2",
    "q_agg_percentiles",
    // round 8: random-grid 1-Bucket-Theta, runtime partition pruning,
    // multi-seed sorted-neighborhood dedup
    "q_join_theta_1bucket", "q_join_dpp", "q_llm_dedup_sorted_r2",
    // round 9: duplicated-subquery DPP (non-broadcast path) and
    // optimizer-injected runtime bloom-filter pruning
    "q_join_dpp_subquery", "q_join_bloom_runtime",
    // round 10: stats-routed inequality join (whichever shape the sampled
    // stats pick at this SF) and the kernel-hashed LSH ANN path
    "q_join_theta_auto", "q_llm_ann_lsh",
    // round 10 continuation: packed-code ADC scan and the residual IVFADC
    // inverted file (cell-IN prune + decomposed ADC)
    "q_llm_ann_pq", "q_llm_ann_ivfpq",
    // round 10 continuation II: stats-routed ANN (brute at this SF, the
    // decision pinned in the output), cluster-then-prune semantic dedup,
    // and the codegen'd BPE tokenizer
    "q_llm_ann_auto", "q_llm_dedup_semantic", "q_llm_bpe_encode",
    // continuation close: composed curation v2 and the constraint gate
    "q_llm_curate2", "q_quality_constraints",
    // round 11 headliners: zero-Exchange bucketed-catalog join, trigram-LM
    // curation v3 (no-broadcast count-table joins), embedding-side
    // curation, the trigram scorer itself, incremental constraints
    "q_catalog_bucketed", "q_llm_curate3", "q_llm_embed_curate",
    "q_llm_trigram_nll", "q_quality_constraints_incr",
    // round 13: deleted-interpolation tuned-λ scorer and day-2
    // incremental curation over the staged corpus artifacts
    "q_llm_trigram_nll_tuned", "q_llm_curate_incremental",
    // round 14: the trained quality classifier + its evaluators (bounded
    // score-domain AUC fold), the KL drift monitor, the versioned-table
    // snapshot diff
    "q_llm_quality_model", "q_llm_quality_auc", "q_llm_drift_kl",
    "q_table_diff",
    // round 14 close: model-filtered curation (the distillation deployed),
    // incremental MV maintenance over the commit log, zone-map range read,
    // keyed MERGE through the clustered log, per-doc curation attribution
    "q_llm_curate_model", "q_mv_incremental", "q_table_zonemap",
    "q_table_merge", "q_llm_curate_attribution",
    // round 15 headliners: the lakehouse surface growth — CDC feed +
    // replication, zero-copy clone, 2-D Morton box read, metadata
    // counts, bloom point lookup, WAP gate
    "q_table_cdf", "q_table_replica", "q_table_clone",
    "q_table_zonemap2d", "q_table_row_counts", "q_table_bloom_point",
    "q_table_wap",
    // round 17 headliners: multi-column zone-map read, filtered exact
    // kNN, incremental change-feed consumption
    "q_table_zonemap_multi", "q_table_knn_filtered", "q_stream_cdf_consume",
    // round 18: DV rewrite policy, 2-D maintenance, per-commit CDC
    // provenance, the registered streaming source
    "q_table_reorg", "q_table_maintain_2d", "q_stream_cdf_source",
    "q_table_history", "q_stream_table_pipeline", "q_table_merge_keys")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep ANN probe-key IN filters pushdown-eligible (see DevSession)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — physical plans of headline queries\n\n"
    sb ++= s"Generated by `graft.PlanDump` on `$sfDir`. Things to check per\n"
    sb ++= "plan: `PushedFilters`/`ReadSchema` at the scans (pushdown &\n"
    sb ++= "pruning), `BroadcastHashJoin` for dims, *no* CartesianProduct/\n"
    sb ++= "BroadcastNestedLoopJoin anywhere in the non-equi family, and\n"
    sb ++= "wide `WholeStageCodegen` spans.  One deliberate exception:\n"
    sb ++= "`q_llm_similarity_topk` IS a BroadcastNestedLoopJoin — 10 query\n"
    sb ++= "vectors broadcast against one corpus scan is the correct map-only\n"
    sb ++= "brute-force plan (no shuffle of the corpus); the scalable paths\n"
    sb ++= "are the IVF/LSH variants.\n"
    for (name <- headline) {
      // q_catalog_bucketed's committed claim is ZERO Exchange of any kind:
      // at dump SF the tiny tables auto-broadcast (a BroadcastExchange),
      // which hides the co-bucketed sort-merge plan the claim is about —
      // disable broadcast for this one section, like CatalogQuerySpec.
      val noBroadcast = name == "q_catalog_bucketed"
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      if (noBroadcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try Queries.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        finally if (noBroadcast)
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val note = if (noBroadcast) " (autoBroadcastJoinThreshold=-1)" else ""
      sb ++= s"\n## $name$note\n\n```\n$plan```\n"
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
