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
    # round-14 edits whose driver rows predate the change: the replay
    # dropped its bundled gold rebuild (now the separate
    # stream_near_dedup_gold entry, which leads as never-checked along
    # with dedup_near_churn_replay) and gained the edge-level
    # delta-locality assert (cc_input_edges ≤ cc_edge_bound); the
    # ANN/codebook family gained the sample-with-sufficiency-floor
    # training predicate in BOTH bodies and oracles (_km_src), and
    # ivf_topk_search's cell-balance gate was re-keyed to the codebook
    # cache identity.
    "stream_near_dedup_replay",
    "ivf_topk_search",
    "ivf_store_pruned_search",
    "incremental_ivf_refresh",
    "pq_topk_search",
    "semantic_dedup_survivors",
    "semdedup_prune",
    "ann_recall_eval",
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
