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
# registration order. Round-4 rotation policy (deterministic, bounded
# staleness): (1) queries with no CORRECTNESS row in any round, (2)
# queries whose implementation changed this round, (3) queries whose
# latest row is oldest (r1, then r2 in stable order). Entries past the
# 50-budget roll to the head of the next round's list; everything stays
# covered every run by tests/test_oracle_parity.py at sf0.001/sf0.01.
_CHECK_FIRST = [
    # (1) never driver-checked: 9 round-3 stragglers + 6 new round-4
    # queries (engine-path streaming/memo/CDC, PQ ANN, nearest as-of)
    "token_pmi_pairs", "boilerplate_bigram_docfreq", "bigram_lm_condprob",
    "char_class_profile", "asof_tolerance_join", "cdf_doc_length_per_source",
    "length_percentile_gate", "order_total_histogram", "rollup_cascade_daily",
    "stream_replay_upsert", "memo_sorted_spend_view", "catalog_table_diff",
    "stream_windowed_counts_replay", "pq_topk_search", "nearest_event_join",
    "perplexity_filter_bigram", "semantic_dedup_survivors",
    "global_rank_by_length", "stream_running_totals_replay",
    "embedding_quantize_int8", "bm25_doc_scores", "event_transition_matrix",
    "stream_session_windows_replay", "incremental_rollup_refresh",
    "lsh_candidates_verified", "dataset_fold_split", "debounce_event_dedup",
    "merge_schema_evolution", "weekly_revenue_wow",
    "zorder_locality_buckets", "countmin_heavy_hitters",
    "sequence_pattern_match", "stream_stream_join_replay",
    "exact_median_twopass", "exact_median_per_segment",
    "incremental_map_view_refresh",
    # round-4 session 2: mining/diagnostics set (queries/mining.py)
    "paragraph_dedup_stats", "ppjoin_jaccard_pairs",
    "pagerank_customer_supplier", "mad_outlier_events",
    "chisq_keywords_per_source", "join_skew_profile", "ewma_user_spend",
    "data_quality_audit", "table_stats_profile",
    # (2) changed in round 4: equal-ts as-of ordering, deterministic
    # session windows, posexploded sketch output, two-level fuzzy blocking
    "asof_join_purchase_view", "active_sessions_per_hour",
    "approx_price_quantiles", "fuzzy_name_pairs",
    # (2b) added after the round-4 budget filled: the engine-feature
    # showcase takes the last in-budget slot; the rest roll to the r5
    # head (all locally parity-green at sf0.001 + sf0.01)
    "branch_merge_replay", "frequent_part_pairs", "hopping_window_counts",
    "rolling_median_user_value", "linear_interpolation_fill",
    "weighted_doc_sample", "simpson_diversity_users",
    # timestamp-family representatives (ADVICE) — the round-4 changed
    # group above already re-checks asof/session/streaming timestamp
    # consumers; these two old-green reps rotate next
    "events_gap_fill_hourly", "events_retention_cohorts",
    # (3) oldest rows first: r1-only, then the r2 cohort in stable order
    "date_funcs_monthly_revenue", "multimodal_frame_sample",
    "core_merge_upsert", "core_merge_fold_sum", "core_sort_rekey",
    "core_range_filter", "core_table_insert", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "topk_orders_per_segment",
    "window_running_spend", "rollup_lineitem_status", "cube_orders_priority",
    "distinct_stats_per_segment", "set_ops_repeat_customers",
    "anti_join_quiet_customers", "semi_join_active_parts",
    "events_hourly_stats", "events_top_event_per_user", "events_json_props",
    "events_retention_cohorts", "events_gap_fill_hourly", "dedup_exact",
    "doc_fingerprint", "text_quality", "token_stats_by_lang",
    "lang_id_stopwords", "ngram_jaccard_pairs", "minhash_lsh_candidates",
    "stratified_sample_per_lang", "benchmark_contamination",
    "pii_redaction_stats", "cosine_topk_bruteforce", "embedding_centroids",
    "ivf_topk_search", "lsh_bucket_cosine_topk", "kmeans_embedding_clusters",
    "pivot_user_event_matrix", "unpivot_part_attrs",
    "scalar_subquery_above_avg", "correlated_above_segment_avg",
    "grouping_sets_revenue", "percentiles_by_segment",
    "string_funcs_part_brands",
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
