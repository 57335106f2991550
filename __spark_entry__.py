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


# The driver's correctness gate verifies a 50-query budget per round
# in registration order. Since round 8 the rotation is DERIVED, not
# hand-maintained (VERDICT r7 what's-wrong #1 was a hand-built head
# missing its target by 13): never-driver-checked queries lead, then
# explicitly fronted ones (edited this round, driver row stale), then
# everything else by ascending last-checked round from STALENESS.json
# (which bench.py regenerates from the CORRECTNESS_r* history every
# run). Bounded staleness is structural — the oldest rows always lead.
# Local re-verification of EVERY query still happens each pytest run
# via tests/test_oracle_parity.py at sf0.001/sf0.01 (ledger-pinned).

_ROTATION_FRONT: list[str] = [
    # round-15 edits whose driver rows predate the change: the
    # ANN/codebook family's training-sample gate moved from a raw
    # vec_id stride to the house md5 portable hash, and the
    # sufficiency floor now counts the SAMPLE itself (VERDICT r14 #4 +
    # ADVICE #1) — predicate changed in BOTH bodies and oracles
    # (_km_src), values unchanged at test SFs (all below the floor);
    # the replay/churn family's delta-local closure gained the
    # unconditional edge-bound assert + local unpersist (ADVICE #2/#3).
    # Kept SMALL (VERDICT r14 #3) so the 50-budget clears the whole
    # round-9 staleness cohort (30 rows) plus the oldest r10 rows.
    "ivf_topk_search",
    "ivf_store_pruned_search",
    "incremental_ivf_refresh",
    "pq_topk_search",
    "semantic_dedup_survivors",
    "semdedup_prune",
    "ann_recall_eval",
    "stream_near_dedup_replay",
    "dedup_near_churn_replay",
    # round-15 optimization edits (ExactSubstr family: parallel chunk
    # scan + single-pass window candidate detection; same relations,
    # parity re-proven at sf0.001/sf0.01 — see OPTIMIZATION_r15.md #7)
    "exact_substring_spans",
    "exact_substring_dedup",
    "exact_substring_clean",
    "exact_substring_long_docs",
    "anchor_sampled_substrings",
    "exact_substring_refresh",
    "stream_xs_ingest_replay",
]


def _rotation_order() -> list[str]:
    import json
    names = sorted(all_queries())
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "STALENESS.json")
    last: dict = {}
    try:
        with open(path) as f:
            last = json.load(f).get("last_checked_round") or {}
    except (OSError, ValueError):
        pass     # no report → plain name order (everything "never")
    front = {n: i for i, n in enumerate(_ROTATION_FRONT)}

    def rank(n: str):
        r = last.get(n)
        if r is None:
            return (0, 0, n)           # never driver-checked
        if n in front:
            return (1, front[n], n)    # fronted edits
        return (2, r, n)               # oldest driver rows first

    return sorted(names, key=rank)


_CHECK_FIRST = _rotation_order()


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
