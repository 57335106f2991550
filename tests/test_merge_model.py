"""Hypothesis model test for the key-granular 3-way merge
(``branches.three_way_merge``): random edit sets (update/delete/insert
on both sides) against a 30-line dict model of the documented
classification — theirs-changed/ours-changed/conflict per key, winner
by policy, winning-side-absent ⇒ delete. The 17 example-based tests in
test_branches.py pin specific seams (null swaps, schema drift,
rollback); this pins the whole classification lattice at once."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from messdb_spark.branches import MergeConflict, three_way_merge
from messdb_spark.operators.core import KeyedTable

# per-key action applied independently to each side
_ACTION = st.sampled_from(["keep", "update_a", "update_b", "delete"])
_CASE = st.fixed_dictionaries({
    "keys": st.sets(st.integers(0, 9), min_size=1, max_size=8),
    "ours": st.dictionaries(st.integers(0, 9), _ACTION, max_size=10),
    "theirs": st.dictionaries(st.integers(0, 9), _ACTION, max_size=10),
    "ours_add": st.sets(st.integers(10, 14), max_size=3),
    "theirs_add": st.sets(st.integers(10, 14), max_size=3),
    "policy": st.sampled_from(["fail", "ours", "theirs"]),
})


def _apply(base: dict, actions: dict, adds: set) -> dict:
    out = {}
    for k, v in base.items():
        a = actions.get(k, "keep")
        if a == "keep":
            out[k] = v
        elif a == "update_a":
            out[k] = v + 100
        elif a == "update_b":
            out[k] = v + 200
        # delete: drop
    for k in adds:
        out[k] = k * 7        # same value when both sides add same key
    return out


def _model_merge(base: dict, ours: dict, theirs: dict, policy: str):
    merged, conflicts = {}, 0
    for k in set(base) | set(ours) | set(theirs):
        b, o, t = base.get(k), ours.get(k), theirs.get(k)
        o_changed, t_changed = o != b, t != b
        if not t_changed:
            win = o            # includes both-unchanged
        elif not o_changed:
            win = t
        elif o == t:
            win = t            # both landed on the same row
        else:
            conflicts += 1
            if policy == "fail":
                continue
            win = o if policy == "ours" else t
        if win is not None:
            merged[k] = win
    return merged, conflicts


@given(case=_CASE)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_three_way_merge_matches_dict_model(spark, case):
    base = {k: k for k in case["keys"]}
    ours = _apply(base, case["ours"], case["ours_add"])
    theirs = _apply(base, case["theirs"], case["theirs_add"])
    expect, n_conf = _model_merge(base, ours, theirs, case["policy"])

    def kt(d: dict) -> KeyedTable:
        rows = [(k, v) for k, v in sorted(d.items())] or None
        df = spark.createDataFrame(rows or [], "k long, v long")
        return KeyedTable(df, ("k",))

    if case["policy"] == "fail" and n_conf > 0:
        try:
            merged, got_conf, pinned = three_way_merge(
                kt(base), kt(ours), kt(theirs), policy="fail")
        except MergeConflict:
            return      # acceptable: engine may raise at classify time
        assert got_conf == n_conf   # or report the same conflict count
        pinned.unpersist()
        return
    merged, got_conf, pinned = three_way_merge(
        kt(base), kt(ours), kt(theirs), policy=case["policy"])
    got = {r["k"]: r["v"] for r in merged.collect()}
    pinned.unpersist()
    assert got_conf == n_conf, (case, got, expect)
    assert got == expect, (case, got, expect)
