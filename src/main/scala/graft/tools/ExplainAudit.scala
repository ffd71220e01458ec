package graft.tools

/** Dev tool: prints formatted physical plans for representative queries and
  * greps them for the scale-critical properties (pushed filters, pruned
  * schemas, broadcast joins, whole-stage codegen coverage).
  * `sbt "runMain graft.tools.ExplainAudit [sfDir]"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.Cli.session()

    val targets = Seq("q01_pricing_summary", "q02_top_revenue_orders",
      "q03_region_revenue", "q13_cube_summary", "q22_bm25_topk", "q24_cosine_topk",
      "q15_approx_price_quantiles", "q34_fingerprints",
      "q39_repetition_stats", "q42_minhash_dup_pairs", "q45_decontamination",
      "q46_lang_mixture", "q47_sequence_packing", "q50_ann_bruteforce",
      "q53_embedding_quantization", "q55_unigram_surprisal", "q56_char_entropy",
      "q73_bigram_lm", "q74_bigram_surprisal", "q75_dedup_keep_best",
      "q76_leakage_safe_splits", "q77_ann_ivf_int8", "q79_ivf_recall_curve",
      "q80_image_dhash", "q81_image_neardups", "q82_curation_pipeline",
      "q83_verbatim_decontam", "q84_repeated_spans", "q85_incremental_dedup",
      "q86_semantic_dedup", "q87_zipf_slope", "q88_source_overlap",
      "q89_pii_scrub", "q91_quality_classifier", "q92_bpe_merge_table",
      "q93_bpe_token_counts", "q94_learned_curation", "q95_classifier_calibration",
      "q96_classifier_auc", "q97_pca_top_component", "q98_pq_codes",
      "q99_weighted_sample", "q100_ann_pq_adc", "q59_interval_join",
      "q62_user_sessions", "q67_retention_cohorts", "q69_event_anomalies",
      "q70_media_meta", "q72_frame_sample",
      "q104_ann_ivfpq", "q107_verbatim_multi_n", "q108_calibrated_threshold",
      "q109_pii_validated", "q110_pq_recall_panel",
      "q115_dsir_weights", "q116_cluster_balanced_sample",
      "q117_source_caps", "q118_bpe_fertility",
      "q17_small_quantity_revenue", "q18_large_orders", "q19_disjunctive_revenue",
      "q119_semantic_decontam", "q120_mixture_weights",
      "q121_ql_topk", "q122_lang_confusion",
      "q123_hour_seasonality", "q124_user_burstiness", "q125_known_item_eval",
      "q126_truncation_loss", "q127_gopher_rules", "q128_dim_truncation_recall",
      "q129_cluster_relevant_eval", "q130_lone_failure_suppliers",
      "q131_dormant_high_balance", "q132_holdout_auc", "q133_source_scorecard",
      "q134_heaps_law", "q135_audio_frame_energy", "q136_trailing_revenue",
      "q137_pmi_collocations",
      "q158_excess_stock_suppliers", "q159_dup_clusters_fixpoint",
      "q160_ann_ivf_panel", "q161_user_streaks", "q162_nation_trade_volume",
      "q163_local_supplier_volume", "q164_returned_revenue_customers",
      "q165_nation_market_share", "q166_propagation_convergence",
      "q167_order_priority_census", "q168_cluster_topic_terms",
      "q169_active_user_ratios", "q170_fusion_agreement",
      "q171_gram_coverage_curve", "q172_shingle_df_spectrum",
      "q173_pq_code_occupancy", "q174_part_supplier_breadth",
      "q175_source_token_quantiles", "q176_norm_quality_agreement",
      "q177_dup_length_deciles", "q178_cluster_purity",
      "q179_label_neighbor_consistency",
      // r14/r15 serve-economics censuses + the split plan.
      "q200_tier_route_batch", "q201_tier_route_pass2_batch",
      "q202_cluster_size_skew", "q203_tier_route_slice", "q204_split_plan",
      "q205_maintenance_plan", "q206_tier_route_slice_pass2",
      "q207_probe_depth_plan")

    targets.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // Execute THIS Dataset's own QueryExecution (count()/noop-write
      // build their own), finalizing AQE — only then does the explain
      // show runtime join choices and codegen ids instead of the
      // isFinalPlan=false placeholder. toRdd.count() runs it without
      // materializing the result set in the driver.
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val scans = plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema")).map(_.trim)
      val joins = plan.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("BroadcastNestedLoopJoin")).map(_.trim.takeWhile(_ != '(')).toSeq
      val codegenSpans = plan.linesIterator
        .flatMap(l => "codegen id : (\\d+)".r.findFirstMatchIn(l).map(_.group(1)))
        .toSet.size
      println(s"==== $name")
      scans.foreach(l => println(s"  $l"))
      println(s"  joins: ${joins.mkString(", ")}")
      println(s"  wholeStageCodegen spans: $codegenSpans")
    }
    spark.stop()
  }
}
