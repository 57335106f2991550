"""The bench regression gate, exercised with deliberate slowdowns
(VERDICT r7 #4): a plan regression in ANY inventory query must trip
the gate now that bench_baseline.json pins the full inventory —
the blind spot that let the r6 bootstrap 200-md5 plan ship silently.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import (ALLOWED_REGRESSIONS, gate_regressions,  # noqa: E402
                   unpinned_queries)


def test_gate_trips_on_deliberate_slowdown():
    baseline = {"q_fast": 0.2, "q_slow": 8.0, "q_border": 1.0}
    timings = {
        "q_fast": 0.85,    # > max(0.4, 0.7) → trips (small-query bar)
        "q_slow": 15.9,    # < 2x → passes (big-query bar is 2x)
        "q_border": 1.5,   # == bar exactly → passes (strictly greater)
        "q_new": 99.0,     # no pin → ignored (can't happen since r8)
    }
    hits = {name: (t, b, bar) for name, t, b, bar
            in gate_regressions(timings, baseline)}
    assert set(hits) == {"q_fast"}
    t, b, bar = hits["q_fast"]
    assert (t, b) == (0.85, 0.2) and abs(bar - 0.7) < 1e-9

    # 2x trips the big query too
    assert {n for n, *_ in gate_regressions({"q_slow": 16.1}, baseline)} \
        == {"q_slow"}


def test_unpinned_queries_are_reported():
    """A timed query with no pin silently escapes gate_regressions;
    unpinned_queries() is what main() prints so that hole is visible
    (ADVICE r8 — no-silent-caps applies to the gate itself)."""
    baseline = {"q_a": 0.2}
    timings = {"q_a": 0.2, "q_new2": 1.0, "q_new1": 2.0}
    assert unpinned_queries(timings, baseline) == ["q_new1", "q_new2"]
    assert unpinned_queries({"q_a": 0.1}, baseline) == []


def test_baseline_pins_full_inventory():
    """Every registered query must have a pin — an unpinned query is
    invisible to the gate (exactly how the r6 bootstrap bug shipped).
    Engine-metric entries (memo/incremental) are pinned too."""
    from messdb_spark.queries import QUERIES

    with open(os.path.join(REPO, "bench_baseline.json")) as f:
        pins = json.load(f)["queries"]
    missing = sorted(set(QUERIES) - set(pins))
    assert not missing, (
        f"{len(missing)} queries have no bench_baseline.json pin "
        f"(gate-blind): {missing[:10]} — extend the baseline from an "
        f"idle-box bench run (see /tmp/extend_baseline.py pattern)")
    for probe in ("memo_view_hit", "agg_view_refresh_16keys",
                  "bucketed_full_write"):
        assert probe in pins, f"engine metric {probe} unpinned"


def test_allowed_regressions_all_have_reasons():
    for name, why in ALLOWED_REGRESSIONS.items():
        assert isinstance(why, str) and len(why) > 20, name


def test_record_guard_blocks_non_closing_runs():
    """The r15 recording guard (VERDICT r14 #2): a mid-round bench run
    at a non-closing SF must NOT clobber the committed
    bench_last.json / STALENESS.json artifacts; a closing-style run
    (sf0.1, --record, or SPARK_GRAFT_BENCH_RECORD=1) records."""
    from bench import should_record

    assert should_record("0.1", [], {})
    assert should_record("0.01", ["--record"], {})
    assert should_record("0.001", [], {"SPARK_GRAFT_BENCH_RECORD": "1"})
    assert not should_record("0.01", [], {})
    assert not should_record("0.001", [], {})
    assert not should_record("0.01", [], {"SPARK_GRAFT_BENCH_RECORD": "0"})
