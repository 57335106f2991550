"""Cross-process root-swap race (VERDICT r7 #5).

The reference gets root-swap atomicity from sqlite
(``sqlite_store.cpp:96-97``); here BOTH manifest backends must survive
two writer processes upserting different tables into one warehouse
concurrently: every commit lands, versions serialize consecutively,
and no update is lost (the classic load→mutate→write lost-update race
the r7 verdict called out).

The JSON backend serializes via the ``os.link`` version-claim CAS
(``store.Catalog._claim_version``); the sqlite backend via the
``version`` PRIMARY KEY + retry (``SqliteCatalog._commit_mutation``).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
sys.path.insert(0, {repo!r})
backend, warehouse, prefix, n, mode = (sys.argv[1], sys.argv[2],
                                       sys.argv[3], int(sys.argv[4]),
                                       sys.argv[5])
from messdb_spark.store import Catalog, CatalogEntry
if backend == "json":
    cat = Catalog(warehouse)
else:
    from messdb_spark.sqlite_store import SqliteCatalog
    cat = SqliteCatalog(warehouse)
if mode == "put":
    for i in range(n):
        cat.put(f"{{prefix}}_{{i}}",
                CatalogEntry(f"hash_{{prefix}}_{{i}}", "{{}}", ["k"]))
else:   # put_many: n multi-table commits of 3 tables each
    for i in range(n):
        cat.put_many({{f"{{prefix}}_{{i}}_{{j}}":
                       CatalogEntry(f"hash_{{prefix}}_{{i}}_{{j}}", "{{}}", ["k"])
                       for j in range(3)}})
print("done", prefix)
""".format(repo=REPO)

N = 25


_PREFIXES = ("alpha", "beta", "gamma")   # 3 writers: collisions are
# near-certain at this commit rate; the 2-writer variant only caught
# the sqlite double-read lost-update (r8) on a loaded box


def _race(backend: str, warehouse: str, mode: str = "put") -> None:
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, backend, warehouse, prefix,
             str(N), mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for prefix in _PREFIXES
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"writer failed: {err[-2000:]}"


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_two_writer_processes_lose_no_commit(tmp_path, backend):
    warehouse = str(tmp_path / "wh")
    os.makedirs(warehouse)
    _race(backend, warehouse)

    if backend == "json":
        from messdb_spark.store import Catalog
        cat = Catalog(warehouse)
    else:
        from messdb_spark.sqlite_store import SqliteCatalog
        cat = SqliteCatalog(warehouse)

    names = cat.names()
    expect = {f"{p}_{i}" for p in _PREFIXES for i in range(N)}
    assert set(names) == expect, (
        f"lost commits: missing {sorted(expect - set(names))[:5]}")

    # versions serialize with no gaps: 3N puts → versions 1..3N, and
    # each version's root holds exactly v names (every put adds one)
    assert cat.current_version() == len(_PREFIXES) * N
    for v in (1, N, len(_PREFIXES) * N):
        assert len(cat.names(version=v)) == v

    # each table resolves to the hash its writer committed
    assert cat.get("alpha_0").table_hash == "hash_alpha_0"
    assert cat.get(f"beta_{N - 1}").table_hash == f"hash_beta_{N - 1}"


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_two_writer_multi_table_commits_stay_atomic(tmp_path, backend):
    """put_many under a cross-process race: every 3-table batch must
    land whole at SOME version (the single-root-swap atomicity),
    versions stay consecutive, and no batch is lost."""
    warehouse = str(tmp_path / "wh")
    os.makedirs(warehouse)
    _race(backend, warehouse, mode="put_many")

    if backend == "json":
        from messdb_spark.store import Catalog
        cat = Catalog(warehouse)
    else:
        from messdb_spark.sqlite_store import SqliteCatalog
        cat = SqliteCatalog(warehouse)

    expect = {f"{p}_{i}_{j}" for p in _PREFIXES
              for i in range(N) for j in range(3)}
    assert set(cat.names()) == expect
    assert cat.current_version() == len(_PREFIXES) * N   # one swap per batch
    # batch atomicity: at every version, each batch is all-or-nothing
    for v in range(1, len(_PREFIXES) * N + 1):
        seen = cat.names(version=v)
        batches = {n.rsplit("_", 1)[0] for n in seen}
        for b in batches:
            assert sum(1 for n in seen if n.rsplit("_", 1)[0] == b) == 3, (
                f"torn batch {b} at version {v}")


def test_json_snapshot_lag_does_not_corrupt_reads(tmp_path):
    """root.json is a convenience snapshot that can lag under a race;
    the authoritative read path must come from the max archived
    version. Simulate the lag by rewriting root.json with stale
    content and assert reads ignore it."""
    from messdb_spark.store import Catalog, CatalogEntry

    warehouse = str(tmp_path / "wh")
    cat = Catalog(warehouse)
    cat.put("t1", CatalogEntry("h1", "{}", ["k"]))
    cat.put("t2", CatalogEntry("h2", "{}", ["k"]))
    with open(cat.root_path, "w") as f:
        json.dump({}, f)   # stale/lagging snapshot
    assert set(cat.names()) == {"t1", "t2"}
    assert cat.get("t2").table_hash == "h2"


def test_json_crashed_claim_tmp_is_harmless(tmp_path):
    """A writer that dies between mkstemp and os.link leaves a .tmp in
    roots/ — it must not affect version numbering, reads, or later
    commits (the claim is only the link; tmps are never parsed)."""
    from messdb_spark.store import Catalog, CatalogEntry

    warehouse = str(tmp_path / "wh")
    cat = Catalog(warehouse)
    cat.put("t1", CatalogEntry("h1", "{}", ["k"]))
    with open(os.path.join(cat.roots_dir, "deadbeef.tmp"), "w") as f:
        f.write('{"torn":')    # crashed writer's partial payload
    assert cat.current_version() == 1
    assert cat.put("t2", CatalogEntry("h2", "{}", ["k"])) == 2
    assert set(cat.names()) == {"t1", "t2"}


def test_json_current_hint_is_nonauthoritative(tmp_path):
    """roots/CURRENT is an O(1) version hint (VERDICT r8 #1) with the
    same contract as root.json: NON-authoritative. Every degraded
    state — lagging hint (crash between claim and hint write), hint at
    a missing/pruned version, garbage bytes, hint absent — must still
    resolve to the max archived version, and a lagging hint must be
    absorbed by walk-forward, not a full rescan of a wrong answer."""
    from messdb_spark.store import Catalog, CatalogEntry

    warehouse = str(tmp_path / "wh")
    cat = Catalog(warehouse)
    for i in range(5):
        cat.put(f"t{i}", CatalogEntry(f"h{i}", "{}", ["k"]))
    assert cat.current_version() == 5
    # lagging hint: writer crashed between claim and hint write
    with open(cat.hint_path, "w") as f:
        f.write("2")
    assert cat.current_version() == 5          # walk-forward
    # hint beyond the frontier (copied warehouse / corrupt)
    with open(cat.hint_path, "w") as f:
        f.write("99")
    assert cat.current_version() == 5          # scan fallback
    # garbage hint
    with open(cat.hint_path, "w") as f:
        f.write("not-a-version")
    assert cat.current_version() == 5
    # absent hint
    os.remove(cat.hint_path)
    assert cat.current_version() == 5
    # a commit through any degraded state repairs the hint
    cat.put("t5", CatalogEntry("h5", "{}", ["k"]))
    with open(cat.hint_path) as f:
        assert f.read().strip() == "6"
    # hint survives prune (points at the retained current version)
    cat.prune_roots(6)
    assert cat.current_version() == 6
    # hint pointing at a PRUNED version falls back to the scan
    with open(cat.hint_path, "w") as f:
        f.write("3")
    assert cat.current_version() == 6


def test_branch_create_race_loses_no_branch(tmp_path):
    """Two processes creating DIFFERENT branches concurrently: the
    flock-guarded mutate must keep both (branches.json is a flat
    state file — without the lock, load-modify-save loses one)."""
    warehouse = str(tmp_path / "wh")
    os.makedirs(warehouse)
    worker = """
import sys
sys.path.insert(0, {repo!r})
from messdb_spark.branches import BranchManager
bm = BranchManager(sys.argv[1])
prefix = sys.argv[2]
for i in range(25):
    bm.create(f"{{prefix}}_{{i}}", i + 1)
""".format(repo=REPO)
    procs = [subprocess.Popen([sys.executable, "-c", worker, warehouse, p],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for p in ("dev", "exp")]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"branch writer failed: {err[-2000:]}"
    from messdb_spark.branches import BranchManager
    bm = BranchManager(warehouse)
    names = set(bm.list())
    expect = {f"{p}_{i}" for p in ("dev", "exp") for i in range(25)}
    assert names == expect, f"lost branches: {sorted(expect - names)[:5]}"
    assert bm.get("exp_24").head == 25
