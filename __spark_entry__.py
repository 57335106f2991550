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
# registration order, so the inventory leads with the queries that do
# not yet have a green row in a prior CORRECTNESS_r*.json (41 as of
# round 3), the ones whose implementations changed since their last
# check, and one representative per new round-3 operator family; the
# remainder (green in r01/r02, or rotating in next round) stays covered
# by tests/test_oracle_parity.py at sf0.001 and sf0.01.
_CHECK_FIRST = [
    # failed r02 (TIMESTAMP_NTZ regression, fixed in round 3)
    "events_sessionization", "events_funnel_view_purchase",
    "range_join_purchase_window",
    # reimplemented in round 2 (banded LSH), never re-checked
    "simhash_near_dup_pairs",
    # never driver-checked
    "multimodal_real_decode", "multimodal_metadata", "rank_functions_suite",
    "bpe_tokens_regex", "rolling_hash_fingerprint", "distinct_doc_sources",
    "embedding_bucket_near_dup", "q2_cheapest_supplier_per_part",
    "q4_order_priority_check", "q7_nation_trade_volume",
    "q12_priority_class_agg", "q14_promo_revenue_ratio",
    "q18_large_order_customers", "q19_disjunctive_predicates",
    "q22_idle_rich_customers", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q13_order_count_distribution",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_quantity_revenue", "q20_excess_quantity_suppliers",
    "q21_waiting_suppliers", "approx_distinct_users_hll",
    "approx_price_quantiles", "salted_agg_event_stats",
    "udtf_split_sentences", "training_corpus_prep",
    "trailing_week_revenue", "dedup_cluster_components",
    "doc_chunking_windows", "tfidf_top_terms", "heavy_hitter_bigrams",
    "corpus_prep_near_dedup", "mixture_sample_by_source",
    "sequence_packing_offsets", "repetition_ngram_stats",
    "sorted_neighborhood_pairs",
    # round-3 additions (one per new family; the rest rotate in next
    # round — locally sf0.01-verified meanwhile)
    "daily_activity_full_outer", "embedding_rp_simhash",
    "zscore_event_values", "active_sessions_per_hour",
    "inverted_index_postings", "twap_user_daily",
    "scd2_user_value_history",
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
