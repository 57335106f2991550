"""Branch/checkout/merge — the Noms move (git-for-data) on the catalog.

Contract under test: branches fork metadata only; checkout restores a
branch head as a new root version (append-only history); a table
changed on one side merges by POINTER (no data job — asserted from the
object-store save counters); tables changed on both sides merge at key
granularity with conflict detection and explicit policies; deletes
propagate; re-merge after a merge is a no-op (fork base advances)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from messdb_spark.branches import MergeConflict
from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable


def _t(spark, rows):
    return KeyedTable(
        spark.createDataFrame(rows, "k bigint, v string"), ("k",))


@pytest.fixture()
def eng(spark, warehouse):
    return Engine(spark, warehouse)


def rows(eng, name):
    return {r["k"]: r["v"] for r in eng.load_table(name).df.collect()}


def test_branch_isolation_and_checkout(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a"), (2, "b")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "a"), (2, "DEV")]))
    assert rows(eng, "t") == {1: "a", 2: "DEV"}
    eng.checkout("main")
    # main unaffected by dev's commit
    assert rows(eng, "t") == {1: "a", 2: "b"}
    eng.checkout("dev")
    assert rows(eng, "t") == {1: "a", 2: "DEV"}


def test_pointer_merge_moves_no_data(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.save_table("other", _t(spark, [(9, "z")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "a"), (2, "new")]))
    dev_hash = eng.table_hash("t")
    eng.checkout("main")
    saves_before = eng.objects.saves
    actions = eng.merge_branch("dev")
    assert actions["t"] == "pointer_merge"
    assert actions["other"] == "unchanged"
    # CAS pointer copy: the merge wrote NO new objects
    assert eng.objects.saves == saves_before
    assert eng.table_hash("t") == dev_hash
    assert rows(eng, "t") == {1: "a", 2: "new"}


def test_three_way_merge_disjoint_keys(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a"), (2, "b"), (3, "c")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "a"), (2, "DEV"), (3, "c"),
                                   (4, "added")]))
    eng.checkout("main")
    eng.save_table("t", _t(spark, [(1, "MAIN"), (2, "b")]))  # del 3, chg 1
    actions = eng.merge_branch("dev")
    assert actions["t"].startswith("three_way(0 conflicts")
    # both sides' changes land: 1=MAIN (ours), 2=DEV (theirs), 3 deleted
    # by ours (theirs didn't touch it), 4 added by theirs
    assert rows(eng, "t") == {1: "MAIN", 2: "DEV", 4: "added"}


def test_conflicting_key_fails_then_resolves(eng, spark):
    eng.save_table("t", _t(spark, [(1, "base")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "theirs")]))
    eng.checkout("main")
    eng.save_table("t", _t(spark, [(1, "ours")]))
    with pytest.raises(MergeConflict):
        eng.merge_branch("dev")
    actions = eng.merge_branch("dev", policy="theirs")
    assert actions["t"] == "three_way(1 conflicts)"
    assert rows(eng, "t") == {1: "theirs"}


def test_conflict_same_value_both_sides_is_clean(eng, spark):
    eng.save_table("t", _t(spark, [(1, "base"), (2, "b")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "same"), (2, "b")]))
    eng.checkout("main")
    eng.save_table("t", _t(spark, [(1, "same"), (2, "b")]))
    actions = eng.merge_branch("dev")   # both changed key 1 identically
    assert rows(eng, "t") == {1: "same", 2: "b"}
    assert "conflict" not in str(actions["t"]) or \
        actions["t"] in ("unchanged",) or "0 conflicts" in actions["t"]


def test_remerge_is_noop_and_policy_ours(eng, spark):
    eng.save_table("t", _t(spark, [(1, "base")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "theirs")]))
    eng.checkout("main")
    eng.save_table("t", _t(spark, [(1, "ours")]))
    actions = eng.merge_branch("dev", policy="ours")
    assert rows(eng, "t") == {1: "ours"}
    # fork base advanced to the merged head: re-merge sees no change
    actions2 = eng.merge_branch("dev", policy="fail")
    assert actions2["t"] == "unchanged"


def test_table_added_on_branch_only(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("feat", _t(spark, [(10, "x")]))
    eng.checkout("main")
    actions = eng.merge_branch("dev")
    assert actions["feat"] == "pointer_merge"
    assert rows(eng, "feat") == {10: "x"}


def test_table_dropped_on_branch_only(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.save_table("tmp", _t(spark, [(5, "q")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.catalog.drop("tmp")
    eng.branches.advance_active(eng.catalog.current_version())
    eng.checkout("main")
    actions = eng.merge_branch("dev")
    assert actions["tmp"] == "pointer_drop"
    assert eng.catalog.get("tmp") is None


def test_null_column_swap_is_a_detected_change(eng, spark):
    """Spark's xxhash64 skips NULL inputs, so without per-column null
    flags the rows ('x', NULL) and (NULL, 'x') would digest equal and
    a branch edit that moves a value between nullable columns would
    silently vanish from the merge. Pin the fix: the swap IS detected
    and theirs' edit lands."""
    def t2(rows):
        return KeyedTable(
            spark.createDataFrame(rows, "k bigint, a string, b string"),
            ("k",))

    eng.save_table("t", t2([(1, "x", None), (2, "m", "m")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    # dev: value moves a -> b on key 1
    eng.save_table("t", t2([(1, None, "x"), (2, "m", "m")]))
    eng.checkout("main")
    # main: edits key 2, forcing the KEY-GRANULAR 3-way path (a
    # one-side-only change would pointer-merge and never hit digests)
    eng.save_table("t", t2([(1, "x", None), (2, "M", "m")]))
    actions = eng.merge_branch("dev")
    assert actions["t"] == "three_way(0 conflicts)"
    got = {r["k"]: (r["a"], r["b"])
           for r in eng.load_table("t").df.collect()}
    assert got == {1: (None, "x"), 2: ("M", "m")}


def test_schema_evolution_raises_clean_conflict(eng, spark):
    """Both branches adding a column (or diverging types) must raise
    MergeConflict, not an AnalysisException mid-merge."""
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", KeyedTable(
        spark.createDataFrame([(1, "a", 7)], "k bigint, v string, w bigint"),
        ("k",)))
    eng.checkout("main")
    eng.save_table("t", KeyedTable(
        spark.createDataFrame([(1, "a", 1.5)], "k bigint, v string, w double"),
        ("k",)))
    with pytest.raises(MergeConflict):
        eng.merge_branch("dev")


def test_branching_on_sqlite_backend(spark, warehouse):
    """restore_version + branches work identically on the sqlite
    manifest backend (the reference's own backend choice)."""
    eng = Engine(spark, warehouse, manifest_backend="sqlite")
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "a"), (2, "sq")]))
    eng.checkout("main")
    assert rows(eng, "t") == {1: "a"}
    actions = eng.merge_branch("dev")
    assert actions["t"] == "pointer_merge"
    assert rows(eng, "t") == {1: "a", 2: "sq"}


def test_branch_cli_roundtrip(spark, warehouse, tmp_path):
    """CLI verbs: branch / checkout / merge drive the same engine paths
    (subprocess-free — the CLI main() is importable)."""
    import json as _json

    from messdb_spark.cli import main

    eng = Engine(spark, warehouse)
    eng.save_table("t", _t(spark, [(1, "a")]))
    assert main(["-w", warehouse, "branch", "dev"]) == 0
    assert main(["-w", warehouse, "checkout", "dev"]) == 0
    eng2 = Engine(spark, warehouse)
    eng2.save_table("t", _t(spark, [(1, "a"), (2, "cli")]))
    assert main(["-w", warehouse, "checkout", "main"]) == 0
    assert main(["-w", warehouse, "merge", "dev"]) == 0
    assert rows(Engine(spark, warehouse), "t") == {1: "a", 2: "cli"}


def test_merge_conflict_rolls_back_earlier_tables(eng, spark):
    """ATOMIC merge (ADVICE r4): a conflict on a later table undoes the
    pointer merges already applied for earlier tables and realigns the
    active branch head — the user who declines the merge keeps their
    exact pre-merge root."""
    eng.save_table("aaa", _t(spark, [(1, "a")]))
    eng.save_table("zzz", _t(spark, [(1, "x")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    eng.save_table("aaa", _t(spark, [(1, "a"), (2, "dev")]))   # theirs-only
    eng.save_table("zzz", _t(spark, [(1, "DEV")]))             # conflict seed
    eng.checkout("main")
    eng.save_table("zzz", _t(spark, [(1, "MAIN")]))            # both changed
    v0 = eng.catalog.current_version()
    aaa_hash = eng.table_hash("aaa")
    with pytest.raises(MergeConflict):
        eng.merge_branch("dev")                                # zzz conflicts
    # 'aaa' (sorted first, pointer-merged before the conflict) rolled back
    assert eng.table_hash("aaa") == aaa_hash
    assert rows(eng, "aaa") == {1: "a"}
    assert rows(eng, "zzz") == {1: "MAIN"}
    # head realigned to the restored root; fork base NOT advanced
    assert eng.branches.get("main").head == eng.catalog.current_version()
    assert eng.branches.get("dev").base < eng.branches.get("dev").head
    # the rolled-back state is a NEW root (append-only history intact)
    assert eng.catalog.current_version() > v0
    # and the merge still works once resolved
    actions = eng.merge_branch("dev", policy="theirs")
    assert actions["aaa"] == "pointer_merge"
    assert rows(eng, "zzz") == {1: "DEV"}


def test_invalid_merge_policy_rejected_before_writes(eng, spark):
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    v0 = eng.catalog.current_version()
    with pytest.raises(ValueError, match="policy"):
        eng.merge_branch("dev", policy="their")
    assert eng.catalog.current_version() == v0


def test_branch_head_clamped_after_torn_preadvance(eng, spark):
    """Crash-window healing: _register pre-advances the head before the
    root swap; if the swap never lands, the phantom head version is
    clamped back to the newest real root on read."""
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    eng.checkout("dev")
    cur = eng.catalog.current_version()
    eng.branches.advance_active(cur + 7)   # simulated torn pre-advance
    assert eng.branches.get("dev").head == cur
    assert eng.branches.list()["dev"].head == cur
    # checkout of the healed branch restores the real root
    eng.checkout("main")
    eng.checkout("dev")
    assert rows(eng, "t") == {1: "a"}


def test_cli_branch_errors_are_json(spark, warehouse, capsys):
    import json as _json

    from messdb_spark.cli import main

    eng = Engine(spark, warehouse)
    eng.save_table("t", _t(spark, [(1, "a")]))
    assert main(["-w", warehouse, "branch", "dev"]) == 0
    capsys.readouterr()
    # duplicate branch → JSON error + exit 1, no traceback
    assert main(["-w", warehouse, "branch", "dev"]) == 1
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"ok": False, "error": "branch exists: dev"}
    # unknown branch on checkout
    assert main(["-w", warehouse, "checkout", "nope"]) == 1
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is False and "no such branch" in out["error"]
    # unknown branch on merge (bad --policy is already an argparse
    # choices error before the engine is reached)
    assert main(["-w", warehouse, "merge", "nope"]) == 1
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] is False and "no such branch" in out["error"]


def test_sqlite_branch_state_is_transactional(spark, warehouse):
    """On the sqlite backend branch state lives in the SAME sqlite file
    as the catalog root (no branches.json), and the merge rollback
    works through the shared transaction path."""
    import os

    eng = Engine(spark, warehouse, manifest_backend="sqlite")
    eng.save_table("t", _t(spark, [(1, "a")]))
    eng.create_branch("dev")
    assert not os.path.exists(os.path.join(warehouse, "branches.json"))
    eng.checkout("dev")
    eng.save_table("t", _t(spark, [(1, "DEV")]))
    eng.checkout("main")
    eng.save_table("t", _t(spark, [(1, "MAIN")]))
    v0 = eng.catalog.current_version()
    with pytest.raises(MergeConflict):
        eng.merge_branch("dev")
    assert rows(eng, "t") == {1: "MAIN"}
    assert eng.catalog.current_version() == v0   # nothing written pre-conflict
    actions = eng.merge_branch("dev", policy="ours")
    assert actions["t"].startswith("three_way")
    assert rows(eng, "t") == {1: "MAIN"}
