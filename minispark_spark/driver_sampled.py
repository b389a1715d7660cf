"""Ledger of registry query names seen in driver-emitted
CORRECTNESS_r0N.json rows. DRIVER_SAMPLED = appeared at all;
DRIVER_GREEN = at least one row with err null and all three match
flags true. ``registry.all_queries`` yields never-GREEN entries
FIRST so a driver that samples in iteration order verifies the
unproven names (including prior red rows) before re-verifying
green ones. Regenerate with
``python tools/update_driver_sampled.py`` after each round."""

DRIVER_SAMPLED: frozenset[str] = frozenset({
    "agg_collect_sorted",  # r5 r6
    "agg_expression_input",  # r5
    "agg_having",  # r5
    "agg_max_by",  # r5
    "agg_min_max_string_timestamp",  # r5
    "agg_multi_key",  # r5
    "ann_cosine_topk",  # r1 r2 r3 r4
    "ann_filtered_recall",  # r3
    "ann_filtered_topk",  # r3 r4
    "ann_hard_negatives",  # r2 r3 r4
    "ann_ivf_filtered_topk",  # r3
    "ann_ivf_index_append",  # r6
    "ann_ivf_index_compact",  # r6
    "ann_ivf_index_delete",  # r6
    "ann_ivf_probe_curve",  # r2 r3 r4
    "ann_ivf_recall",  # r1 r2 r3 r4
    "ann_ivf_topk",  # r1 r2 r3 r4
    "ann_ivf_trained_topk",  # r2 r3
    "ann_ivfpq_filtered_k256",  # r5
    "ann_ivfpq_filtered_probe_curve",  # r5
    "ann_ivfpq_recall",  # r2
    "ann_ivfpq_recall_k256",  # r6
    "ann_ivfpq_residual_recall",  # r2
    "ann_ivfpq_residual_topk",  # r2
    "ann_ivfpq_topk",  # r2
    "ann_mmr_rerank",  # r2 r3 r4
    "ann_pq_recall",  # r2 r3
    "ann_pq_recall_k256",  # r6
    "ann_pq_topk",  # r2 r3
    "ann_retrieval_metrics",  # r2 r3 r4
    "ann_truncated_recall",  # r2 r3 r4
    "approx_distinct_rollup_hll",  # r1
    "asof_purchase_to_click",  # r1 r2 r3 r4
    "blockfile_roundtrip",  # r1
    "bpe_train_merges",  # r1 r2 r3 r4
    "cross_join_region_pairs",  # r1
    "customers_linkage_scores",  # r6
    "customers_rfm_segments",  # r1
    "datetime_functions_coverage",  # r2
    "dedup_connected_components",  # r1 r2 r3 r4
    "dedup_containment",  # r2 r3 r4
    "dedup_exact",  # r1 r2 r3 r4
    "dedup_jaccard_prefix_filter",  # r2 r3 r4
    "dedup_minhash_audit",  # r2 r3 r4
    "dedup_minhash_band_curve",  # r6
    "dedup_minhash_lsh",  # r1 r2 r3 r4
    "dedup_ngram_jaccard",  # r1 r2 r3 r4
    "dedup_simhash",  # r1 r2 r3 r4
    "distinct_rows",  # r6
    "docs_bigram_stats",  # r1
    "docs_crosssource_dup_matrix",  # r2 r3 r4
    "docs_dedup_survivorship",  # r2 r3 r4
    "docs_fuzzy_dedup_curation",  # r2 r3 r4
    "docs_host_mixture",  # r6
    "docs_html_strip",  # r6
    "docs_leakage_safe_split",  # r3 r4
    "docs_nb_calibration",  # r6
    "docs_nb_classify",  # r6
    "docs_nb_metrics",  # r6
    "docs_nb_token_weights",  # r6
    "docs_quality_nb_filter",  # r6
    "docs_token_chi2_topk",  # r6
    "docs_train_split",  # r1
    "docs_training_shard_manifest",  # r6
    "docs_url_blocklist_filter",  # r6
    "docs_url_canon_content_audit",  # r6
    "docs_url_canonicalize",  # r6
    "docs_weighted_median_by_lang",  # r6
    "docs_weighted_sample",  # r1
    "docs_winnow_fingerprints",  # r6
    "docs_winnow_match",  # r6
    "embedding_near_dup",  # r1 r2 r3 r4
    "embedding_near_dup_lsh",  # r1 r2 r3 r4
    "embedding_pca_covariance",  # r6
    "embedding_quantize_int8",  # r1 r2 r3 r4
    "events_campaign_dpp_rollup",  # r6
    "events_cdc_upsert",  # r1
    "events_funnel",  # r1
    "events_gdpr_delete",  # r2
    "events_hourly_stats",  # r1
    "events_hourly_stats_pruned",  # r5
    "events_json_extract",  # r1
    "events_json_variant",  # r1
    "events_latest_per_user",  # r1
    "events_mad_outliers",  # r6
    "events_median_by_type",  # r2
    "events_pivot_by_type",  # r1
    "events_range_join",  # r1
    "events_retention_cohorts",  # r1
    "events_scd2_intervals",  # r1
    "events_sessionize",  # r1
    "events_top_paths",  # r6
    "events_transition_matrix",  # r6
    "events_twap_by_type",  # r6
    "events_user_daily_pivot",  # r1
    "events_user_ema",  # r1
    "filter_between_timestamp",  # r1
    "filter_boolean_not",  # r1
    "filter_comparisons",  # r1
    "filter_like",  # r1
    "graph_assortativity",  # r3 r4
    "graph_bfs_hops",  # r2 r3 r4
    "graph_clustering_coefficient",  # r3 r4
    "graph_components_converged",  # r4
    "graph_components_star",  # r4
    "graph_kcore",  # r3 r4
    "graph_kcore_converged",  # r4
    "graph_label_propagation",  # r3 r4
    "graph_link_prediction",  # r3 r4
    "graph_modularity",  # r3 r4
    "graph_pagerank",  # r1 r2 r3 r4
    "graph_pagerank_converged",  # r4
    "graph_personalized_pagerank",  # r3 r4
    "graph_triangle_count",  # r1 r2 r3 r4
    "intersect_except",  # r6
    "join_anti",  # r5
    "join_full_outer",  # r5
    "join_inner",  # r1
    "join_left_outer",  # r5
    "join_semi",  # r5
    "join_skew_salted",  # r1
    "kmeans_clusters",  # r2 r3 r4
    "knn_classify",  # r2 r3 r4
    "lineitem_integrity_checksum",  # r6
    "lineitem_profile",  # r1
    "lineitem_quality_audit",  # r2
    "multimodal_audio_rms",  # r1 r2 r3 r4
    "multimodal_audio_vad_segments",  # r3 r4
    "multimodal_decode_features",  # r1 r2 r3 r4
    "multimodal_decode_jpeg",  # r5
    "multimodal_decode_png",  # r4
    "multimodal_decode_png_palette",  # r5
    "multimodal_frame_sample",  # r1 r2 r3 r4
    "multimodal_phash_neardup",  # r2 r3 r4
    "multimodal_resize_nn",  # r2 r3 r4
    "multimodal_scene_cuts",  # r3 r4
    "neardup_incoming_probe",  # r6
    "neardup_index_append",  # r5
    "neardup_index_compact",  # r6
    "neardup_index_delete",  # r6
    "order_by_limit",  # r5
    "orders_cdf_normalize",  # r6
    "orders_equidepth_buckets",  # r6
    "orders_exact_quantiles",  # r2
    "parts_skyline",  # r6
    "project_expressions",  # r1
    "q10_bucketed",  # r5
    "q10_returned_items",  # r5
    "q11_important_stock",  # r5
    "q12_ship_mode_priority",  # r5
    "q13_customer_distribution",  # r5
    "q14_promo_revenue",  # r5
    "q15_top_supplier",  # r5
    "q16_supplier_part_count",  # r5
    "q17_small_quantity_revenue",  # r5
    "q18_bucketed",  # r5
    "q18_large_orders",  # r5
    "q19_disjunctive_predicates",  # r5
    "q1_pricing_summary",  # r5
    "q20_part_promotion",  # r5
    "q21_bucketed",  # r5
    "q21_waiting_orders",  # r5
    "q22_global_sales_opportunity",  # r5
    "q2_min_cost_supplier",  # r5
    "q3_bucketed",  # r5
    "q3_shipping_priority",  # r5
    "q4_order_priority",  # r5
    "q5_bucketed",  # r5
    "q5_local_supplier_volume",  # r5
    "q6_forecast_revenue",  # r5
    "q7_volume_shipping",  # r5
    "q8_bucketed",  # r5
    "q8_market_share",  # r5
    "q9_product_profit",  # r5
    "scan_select_star",  # r1
    "self_join",  # r5
    "semantic_dedup",  # r2
    "semantic_dedup_k_curve",  # r6
    "snapshot_diff_orders",  # r2
    "snapshot_history",  # r6
    "snapshot_read_committed",  # r1
    "snapshot_schema_evolution",  # r2
    "stats_correlation",  # r6
    "stats_gd_linear_fit",  # r6
    "stats_linear_fit",  # r1
    "stats_moments",  # r5
    "stream_ivf_index_ingest",  # r6
    "stream_neardup_index_ingest",  # r6
    "stream_url_frontier_gate",  # r6
    "string_functions_coverage",  # r2
    "union_all",  # r6
    "union_distinct",  # r6
    "window_distribution_ranks",  # r6
    "window_lead_lag",  # r5
    "window_ntile_deciles",  # r6
    "window_rank",  # r5
    "window_rolling_interval",  # r6
    "window_running_sum",  # r5
    "zorder_pruned_scan",  # r1
})

DRIVER_GREEN: frozenset[str] = frozenset({
    "agg_collect_sorted",  # r6
    "agg_expression_input",  # r5
    "agg_having",  # r5
    "agg_max_by",  # r5
    "agg_min_max_string_timestamp",  # r5
    "agg_multi_key",  # r5
    "ann_cosine_topk",  # r1 r2 r3 r4
    "ann_filtered_recall",  # r3
    "ann_filtered_topk",  # r3 r4
    "ann_hard_negatives",  # r2 r3 r4
    "ann_ivf_filtered_topk",  # r3
    "ann_ivf_index_append",  # r6
    "ann_ivf_index_compact",  # r6
    "ann_ivf_index_delete",  # r6
    "ann_ivf_probe_curve",  # r2 r3 r4
    "ann_ivf_recall",  # r1 r2 r3 r4
    "ann_ivf_topk",  # r1 r2 r3 r4
    "ann_ivf_trained_topk",  # r2 r3
    "ann_ivfpq_filtered_k256",  # r5
    "ann_ivfpq_filtered_probe_curve",  # r5
    "ann_ivfpq_recall",  # r2
    "ann_ivfpq_recall_k256",  # r6
    "ann_ivfpq_residual_recall",  # r2
    "ann_ivfpq_residual_topk",  # r2
    "ann_ivfpq_topk",  # r2
    "ann_mmr_rerank",  # r2 r3 r4
    "ann_pq_recall",  # r2 r3
    "ann_pq_recall_k256",  # r6
    "ann_pq_topk",  # r2 r3
    "ann_retrieval_metrics",  # r2 r3 r4
    "ann_truncated_recall",  # r2 r3 r4
    "asof_purchase_to_click",  # r1 r2 r3 r4
    "blockfile_roundtrip",  # r1
    "bpe_train_merges",  # r2 r3 r4
    "cross_join_region_pairs",  # r1
    "customers_linkage_scores",  # r6
    "customers_rfm_segments",  # r1
    "datetime_functions_coverage",  # r2
    "dedup_connected_components",  # r1 r2 r3 r4
    "dedup_containment",  # r2 r3 r4
    "dedup_exact",  # r1 r2 r3 r4
    "dedup_jaccard_prefix_filter",  # r2 r3 r4
    "dedup_minhash_audit",  # r2 r3 r4
    "dedup_minhash_band_curve",  # r6
    "dedup_minhash_lsh",  # r1 r2 r3 r4
    "dedup_ngram_jaccard",  # r1 r2 r3 r4
    "dedup_simhash",  # r1 r2 r3 r4
    "distinct_rows",  # r6
    "docs_bigram_stats",  # r1
    "docs_crosssource_dup_matrix",  # r2 r3 r4
    "docs_dedup_survivorship",  # r2 r3 r4
    "docs_fuzzy_dedup_curation",  # r2 r3 r4
    "docs_host_mixture",  # r6
    "docs_html_strip",  # r6
    "docs_leakage_safe_split",  # r3 r4
    "docs_nb_calibration",  # r6
    "docs_nb_classify",  # r6
    "docs_nb_metrics",  # r6
    "docs_nb_token_weights",  # r6
    "docs_quality_nb_filter",  # r6
    "docs_token_chi2_topk",  # r6
    "docs_train_split",  # r1
    "docs_training_shard_manifest",  # r6
    "docs_url_blocklist_filter",  # r6
    "docs_url_canon_content_audit",  # r6
    "docs_url_canonicalize",  # r6
    "docs_weighted_median_by_lang",  # r6
    "docs_weighted_sample",  # r1
    "docs_winnow_fingerprints",  # r6
    "docs_winnow_match",  # r6
    "embedding_near_dup",  # r1 r2 r3 r4
    "embedding_near_dup_lsh",  # r1 r2 r3 r4
    "embedding_pca_covariance",  # r6
    "embedding_quantize_int8",  # r1 r2 r3 r4
    "events_campaign_dpp_rollup",  # r6
    "events_cdc_upsert",  # r1
    "events_funnel",  # r1
    "events_gdpr_delete",  # r2
    "events_hourly_stats",  # r1
    "events_hourly_stats_pruned",  # r5
    "events_json_extract",  # r1
    "events_json_variant",  # r1
    "events_latest_per_user",  # r1
    "events_mad_outliers",  # r6
    "events_median_by_type",  # r2
    "events_pivot_by_type",  # r1
    "events_range_join",  # r1
    "events_retention_cohorts",  # r1
    "events_scd2_intervals",  # r1
    "events_sessionize",  # r1
    "events_top_paths",  # r6
    "events_transition_matrix",  # r6
    "events_twap_by_type",  # r6
    "events_user_daily_pivot",  # r1
    "events_user_ema",  # r1
    "filter_between_timestamp",  # r1
    "filter_boolean_not",  # r1
    "filter_comparisons",  # r1
    "filter_like",  # r1
    "graph_assortativity",  # r3 r4
    "graph_bfs_hops",  # r2 r3 r4
    "graph_clustering_coefficient",  # r3 r4
    "graph_components_converged",  # r4
    "graph_components_star",  # r4
    "graph_kcore",  # r3 r4
    "graph_kcore_converged",  # r4
    "graph_label_propagation",  # r3 r4
    "graph_link_prediction",  # r3 r4
    "graph_modularity",  # r3 r4
    "graph_pagerank",  # r1 r2 r3 r4
    "graph_pagerank_converged",  # r4
    "graph_personalized_pagerank",  # r3 r4
    "graph_triangle_count",  # r1 r2 r3 r4
    "intersect_except",  # r6
    "join_anti",  # r5
    "join_full_outer",  # r5
    "join_inner",  # r1
    "join_left_outer",  # r5
    "join_semi",  # r5
    "join_skew_salted",  # r1
    "kmeans_clusters",  # r2 r3 r4
    "knn_classify",  # r2 r3 r4
    "lineitem_integrity_checksum",  # r6
    "lineitem_profile",  # r1
    "lineitem_quality_audit",  # r2
    "multimodal_audio_rms",  # r1 r2 r3 r4
    "multimodal_audio_vad_segments",  # r3 r4
    "multimodal_decode_features",  # r2 r3 r4
    "multimodal_decode_jpeg",  # r5
    "multimodal_decode_png",  # r4
    "multimodal_decode_png_palette",  # r5
    "multimodal_frame_sample",  # r1 r2 r3 r4
    "multimodal_phash_neardup",  # r2 r3 r4
    "multimodal_resize_nn",  # r2 r3 r4
    "multimodal_scene_cuts",  # r3 r4
    "neardup_incoming_probe",  # r6
    "neardup_index_append",  # r5
    "neardup_index_compact",  # r6
    "neardup_index_delete",  # r6
    "order_by_limit",  # r5
    "orders_cdf_normalize",  # r6
    "orders_equidepth_buckets",  # r6
    "orders_exact_quantiles",  # r2
    "parts_skyline",  # r6
    "project_expressions",  # r1
    "q10_bucketed",  # r5
    "q10_returned_items",  # r5
    "q11_important_stock",  # r5
    "q12_ship_mode_priority",  # r5
    "q13_customer_distribution",  # r5
    "q14_promo_revenue",  # r5
    "q15_top_supplier",  # r5
    "q16_supplier_part_count",  # r5
    "q17_small_quantity_revenue",  # r5
    "q18_bucketed",  # r5
    "q18_large_orders",  # r5
    "q19_disjunctive_predicates",  # r5
    "q1_pricing_summary",  # r5
    "q20_part_promotion",  # r5
    "q21_bucketed",  # r5
    "q21_waiting_orders",  # r5
    "q22_global_sales_opportunity",  # r5
    "q2_min_cost_supplier",  # r5
    "q3_bucketed",  # r5
    "q3_shipping_priority",  # r5
    "q4_order_priority",  # r5
    "q5_bucketed",  # r5
    "q5_local_supplier_volume",  # r5
    "q6_forecast_revenue",  # r5
    "q7_volume_shipping",  # r5
    "q8_bucketed",  # r5
    "q8_market_share",  # r5
    "q9_product_profit",  # r5
    "scan_select_star",  # r1
    "self_join",  # r5
    "semantic_dedup",  # r2
    "semantic_dedup_k_curve",  # r6
    "snapshot_diff_orders",  # r2
    "snapshot_history",  # r6
    "snapshot_read_committed",  # r1
    "snapshot_schema_evolution",  # r2
    "stats_correlation",  # r6
    "stats_gd_linear_fit",  # r6
    "stats_linear_fit",  # r1
    "stats_moments",  # r5
    "stream_ivf_index_ingest",  # r6
    "stream_neardup_index_ingest",  # r6
    "stream_url_frontier_gate",  # r6
    "string_functions_coverage",  # r2
    "union_all",  # r6
    "union_distinct",  # r6
    "window_distribution_ranks",  # r6
    "window_lead_lag",  # r5
    "window_ntile_deciles",  # r6
    "window_rank",  # r5
    "window_rolling_interval",  # r6
    "window_running_sum",  # r5
    "zorder_pruned_scan",  # r1
})
