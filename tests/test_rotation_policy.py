"""The derived driver-check rotation (since r8): never hand-built, so
the policy itself must be pinned — never-checked queries lead, fronted
edits follow, then strictly ascending last-checked round, name-stable
within each tier. A policy regression here silently unbounds driver
staleness (exactly the r7 what's-wrong #1 failure)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402


def test_rotation_order_implements_policy():
    order = entry._CHECK_FIRST
    from messdb_spark.queries import QUERIES

    assert sorted(order) == sorted(QUERIES), "rotation must cover all"

    with open(os.path.join(REPO, "STALENESS.json")) as f:
        last = json.load(f)["last_checked_round"]
    front = [n for n in entry._ROTATION_FRONT if n in QUERIES]

    def tier(n):
        if last.get(n) is None:
            return (0, 0)
        if n in front:
            return (1, front.index(n))
        return (2, last[n])

    tiers = [tier(n) for n in order]
    assert tiers == sorted(tiers), (
        "rotation is out of policy order (never-checked → fronted → "
        "ascending round)")
    # name-stable within the round tiers
    for r in sorted({t[1] for t in tiers if t[0] == 2}):
        names = [n for n, t in zip(order, tiers) if t == (2, r)]
        assert names == sorted(names), f"round-{r} tier not name-stable"


def test_rotation_survives_missing_staleness(tmp_path, monkeypatch):
    """No STALENESS.json (fresh clone) → plain name order, never an
    exception: the driver contract must import unconditionally."""
    import importlib

    real_open = open

    def no_staleness(path, *a, **k):
        if str(path).endswith("STALENESS.json"):
            raise FileNotFoundError(path)
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", no_staleness)
    order = entry._rotation_order()
    assert order == sorted(order) and len(order) == len(entry._CHECK_FIRST)
    importlib.invalidate_caches()
