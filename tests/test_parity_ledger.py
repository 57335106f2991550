"""Registration guard: a query cannot be registered (or edited)
without a recorded local oracle-parity pass on its CURRENT source.

The ledger (tests/parity_ledger.json) is written ONLY by passing
parity tests (tests/test_oracle_parity.py → messdb_spark/parity.py),
so the only way to turn these tests green for a new or edited query is
to actually run — and pass — its parity check.  This is the r6-verdict
process fix: bootstrap_ci_segment_spend shipped with a body that
disagreed with its own oracle because nothing enforced the sweep.

Also pins the rotation policy: a query with no driver CORRECTNESS row
yet (absent from STALENESS.json) must sit inside the driver's 50-query
check budget (_CHECK_FIRST head), so new work is verified by the very
next driver round instead of rotting unchecked at position ~222.
"""

from __future__ import annotations

import json
import os

from messdb_spark.parity import load_ledger, query_content_hash
from messdb_spark.queries import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_current_parity_pass():
    ledger = load_ledger()
    stale = []
    for name in sorted(QUERIES):
        cur = query_content_hash(name)
        if ledger.get(name) != cur:
            stale.append(name)
    assert not stale, (
        f"{len(stale)} registered queries have no recorded parity pass "
        f"for their current source: {stale[:10]} — run "
        f"`python -m pytest tests/test_oracle_parity.py -k "
        f"'{stale[0]}'` (and at sf0.01 via SPARK_GRAFT_TEST_SF_DIR) "
        f"to verify and record them")


def test_never_driver_checked_queries_lead_rotation():
    """Every registered query missing from STALENESS.json (i.e. never
    driver-checked — typically added this round) must appear within
    the first 50 entries of _CHECK_FIRST so the next driver round's
    budget reaches it."""
    staleness_path = os.path.join(REPO, "STALENESS.json")
    if not os.path.exists(staleness_path):
        return
    with open(staleness_path) as f:
        checked = set(json.load(f)["last_checked_round"])
    import __spark_entry__ as entry

    head = set(entry._CHECK_FIRST[:50])
    unchecked = {n for n in QUERIES if n not in checked}
    missing = sorted(unchecked - head)
    assert not missing, (
        f"queries never driver-checked but outside the 50-entry "
        f"_CHECK_FIRST head: {missing} — add them to the head of "
        f"__spark_entry__._CHECK_FIRST")
