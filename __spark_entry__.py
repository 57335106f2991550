"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY.md §2 + the
north-star LLM-pipeline set) for the DuckDB correctness gate.
Implementation lives in ``messdb_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from messdb_spark.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-shaped
    pricing summary (scan → pushed filter → hash agg)."""
    from messdb_spark.queries import QUERIES
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# The driver's correctness gate verifies a 50-query budget per round in
# registration order. Round-8 rotation (consolidation round, VERDICT r7
# "What's wrong #1"): (1) queries whose implementation changed this
# round (ppjoin broadcast gate), (2) the 13 round-2-stale queries —
# the oldest driver rows in the inventory, predating the parity-ledger
# era — then the r3/r4/r5/r6 cohorts in stable order. 1 + 13 + 36 of
# the 47-query r3 cohort fit the 50 budget; the rest roll to round 9.
# Everything stays locally re-verified every run by
# tests/test_oracle_parity.py at sf0.001/sf0.01 (ledger-pinned).
_CHECK_FIRST = [
    'incremental_ivf_refresh',   # new this round (never driver-checked)
    'ppjoin_jaccard_pairs', 'q5_local_supplier_volume',
    'q6_forecast_revenue', 'rollup_lineitem_status',
    'scalar_subquery_above_avg', 'semi_join_active_parts',
    'set_ops_repeat_customers', 'stratified_sample_per_lang',
    'string_funcs_part_brands', 'text_quality', 'token_stats_by_lang',
    'topk_orders_per_segment', 'unpivot_part_attrs', 'window_running_spend',
    'bpe_tokens_regex', 'corpus_prep_near_dedup',
    'daily_activity_full_outer', 'dedup_cluster_components',
    'distinct_doc_sources', 'doc_chunking_windows',
    'embedding_bucket_near_dup', 'embedding_rp_simhash',
    'events_funnel_view_purchase', 'events_sessionization',
    'heavy_hitter_bigrams', 'inverted_index_postings',
    'mixture_sample_by_source', 'multimodal_metadata',
    'multimodal_real_decode', 'q11_important_parts',
    'q12_priority_class_agg', 'q13_order_count_distribution',
    'q14_promo_revenue_ratio', 'q15_top_supplier',
    'q16_supplier_part_counts', 'q17_small_quantity_revenue',
    'q18_large_order_customers', 'q19_disjunctive_predicates',
    'q20_excess_quantity_suppliers', 'q21_waiting_suppliers',
    'q22_idle_rich_customers', 'q2_cheapest_supplier_per_part',
    'q4_order_priority_check', 'q7_nation_trade_volume', 'q8_market_share',
    'q9_product_profit', 'range_join_purchase_window',
    'rank_functions_suite', 'repetition_ngram_stats',
    'rolling_hash_fingerprint', 'salted_agg_event_stats',
    'scd2_user_value_history', 'sequence_packing_offsets',
    'simhash_near_dup_pairs', 'sorted_neighborhood_pairs', 'tfidf_top_terms',
    'trailing_week_revenue', 'training_corpus_prep', 'twap_user_daily',
    'udtf_split_sentences', 'zscore_event_values',
    'active_sessions_per_hour', 'asof_join_purchase_view',
    'asof_tolerance_join', 'bigram_lm_condprob', 'bm25_doc_scores',
    'boilerplate_bigram_docfreq', 'cdf_doc_length_per_source',
    'char_class_profile', 'chisq_keywords_per_source', 'data_quality_audit',
    'dataset_fold_split', 'debounce_event_dedup', 'embedding_quantize_int8',
    'event_transition_matrix', 'ewma_user_spend', 'exact_median_per_segment',
    'exact_median_twopass', 'fuzzy_name_pairs', 'global_rank_by_length',
    'incremental_rollup_refresh', 'join_skew_profile',
    'length_percentile_gate', 'lsh_candidates_verified',
    'mad_outlier_events', 'merge_schema_evolution', 'nearest_event_join',
    'order_total_histogram', 'pagerank_customer_supplier',
    'paragraph_dedup_stats', 'perplexity_filter_bigram', 'pq_topk_search',
    'rollup_cascade_daily', 'semantic_dedup_survivors',
    'sequence_pattern_match', 'stream_running_totals_replay',
    'stream_windowed_counts_replay', 'table_stats_profile',
    'token_pmi_pairs', 'weekly_revenue_wow', 'zorder_locality_buckets',
    'ann_recall_eval', 'bfs_min_hops', 'bloom_prefilter_join',
    'bpe_encode_docs', 'bpe_learn_merges', 'bucketed_colocated_join',
    'cdc_apply_tombstones', 'cumulative_new_users_daily',
    'cusum_changepoint_daily', 'ddsketch_price_quantiles',
    'dpp_partition_pruned_join', 'duplicate_span_fraction',
    'event_trigram_patterns', 'exact_percentile_grid', 'frequent_part_pairs',
    'gini_spend_inequality', 'hll_md5_distinct_orders', 'hll_set_ops_orders',
    'hopping_window_counts', 'incremental_hll_refresh',
    'incremental_sort_view_refresh', 'k_anonymity_audit', 'kcore_parts',
    'ks_value_distance', 'linear_interpolation_fill',
    'mannwhitney_value_shift', 'matryoshka_prefix_recall',
    'max_drawdown_daily', 'ols_daily_revenue_trend', 'range_bucketed_prune',
    'record_linkage_scores', 'referential_integrity_audit',
    'rolling_7d_active_users', 'rolling_median_user_value',
    'simpson_diversity_users', 'skew_salted_join', 'spearman_spend_activity',
    'stream_late_drop_replay', 'stream_static_enrich_replay',
    'token_budget_apportionment', 'training_mix_interleave',
    'triangle_count_cosupply', 'user_event_sequences', 'walk_counts_3hop',
    'weighted_doc_sample', 'weighted_median_price_per_priority',
    'abtest_cuped_analysis', 'adaptive_bucket_split_refresh',
    'adaptive_rollup_refresh', 'anti_join_quiet_customers',
    'approx_distinct_users_hll', 'approx_price_quantiles',
    'attribution_models_revenue', 'autocorrelation_daily_revenue',
    'benchmark_contamination', 'benford_first_digit', 'branch_merge_replay',
    'catalog_table_diff', 'cohort_ltv_curves', 'conversion_time_percentiles',
    'core_merge_fold_sum', 'core_merge_upsert', 'core_range_filter',
    'core_sort_rekey', 'core_table_insert', 'correlated_above_segment_avg',
    'countmin_heavy_hitters', 'date_funcs_monthly_revenue',
    'dsir_importance_weights', 'error_budget_burn_alerts',
    'incremental_join_view_refresh', 'incremental_map_view_refresh',
    'keyword_extraction_rake', 'km_survival_time_to_purchase',
    'kmeans_embedding_clusters', 'knn_label_agreement',
    'memo_sorted_spend_view', 'minhash_estimate_error', 'mmr_diverse_topk',
    'multimodal_frame_sample', 'ngram_novelty_scores', 'psi_value_drift',
    'rfm_customer_segments', 'semdedup_prune', 'sql_merge_into_upsert',
    'stream_adaptive_ingest_replay', 'stream_checkpoint_restart_replay',
    'stream_dedup_watermark_replay', 'stream_replay_upsert',
    'stream_session_windows_replay', 'stream_stream_join_replay',
    'stream_stream_outer_join_replay', 'token_entropy_per_source',
    'trimmed_mean_order_values', 'zipf_token_rank_fit', 'zorder_box_prune',
    'bootstrap_ci_segment_spend', 'calibration_bins_ece',
    'colbert_maxsim_topk', 'consistent_hash_rebalance',
    'cosine_topk_bruteforce', 'cube_orders_priority', 'dedup_exact',
    'distinct_stats_per_segment', 'doc_fingerprint', 'dp_noisy_counts',
    'embedding_centroids', 'events_gap_fill_hourly', 'events_hourly_stats',
    'events_json_props', 'events_retention_cohorts',
    'events_top_event_per_user', 'export_shard_manifest',
    'functional_dependency_audit', 'grouping_sets_revenue',
    'hard_negative_mining', 'hybrid_rrf_fusion',
    'incremental_minhash_refresh', 'ivf_store_pruned_search',
    'ivf_topk_search', 'knn_graph_lsh', 'lang_id_stopwords',
    'length_bucketed_batching', 'lsh_bucket_cosine_topk',
    'minhash_lsh_candidates', 'ngram_jaccard_pairs',
    'percentiles_by_segment', 'pii_redaction_stats',
    'pivot_user_event_matrix', 'pooling_recall_eval',
    'propensity_strata_ate', 'q10_returned_items', 'q1_pricing_summary',
    'q3_shipping_priority', 'quality_classifier_scores',
    'randomized_response_rate', 'seasonal_dow_decomposition',
    'seasonal_residual_outliers', 'source_mix_kl_drift',
    'sql_ctas_segment_summary', 'stream_minhash_ingest_replay',
    'stream_txn_rollup_replay', 'target_encoding_loo',
    'theil_sen_daily_trend', 'train_eval_leakage_audit',
    'txn_multi_table_commit',
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _CHECK_FIRST if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return _ordered(all_oracles())
