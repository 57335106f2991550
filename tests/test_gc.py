"""Garbage collection over the write-once CAS: mark from retained
catalog roots + memo targets + manifest children, sweep the rest,
never dangle a memo entry or a catalog reference."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable
from messdb_spark.plans import views as V
from messdb_spark.plans.incremental import (incremental_upsert, load_manifest,
                                            write_bucketed)
from messdb_spark.registry import REGISTRY


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def _objects(eng):
    return set(os.listdir(eng.objects.objects_dir))


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_gc_reclaims_superseded_objects(spark, warehouse, backend):
    eng = Engine(spark, warehouse + backend, manifest_backend=backend)
    df1 = spark.createDataFrame([(i, "a") for i in range(100)], "k long, v string")
    h1 = eng.save_table("t", KeyedTable(df1, ("k",)))
    df2 = spark.createDataFrame([(i, "b") for i in range(100)], "k long, v string")
    h2 = eng.save_table("t", KeyedTable(df2, ("k",)))
    assert h1 != h2 and eng.objects.exists(h1)

    # full history retained → nothing to sweep
    stats = eng.gc()
    assert stats["swept"] == []

    # horizon 1 → superseded object goes, old root pruned, current loads
    stats = eng.gc(keep_versions=1)
    assert stats["swept"] == [h1]
    assert not eng.objects.exists(h1) and eng.objects.exists(h2)
    assert eng.load_table("t").df.count() == 100
    with pytest.raises(Exception):
        eng.load_table("t", version=1)


def test_gc_dry_run_deletes_nothing(spark, warehouse):
    eng = Engine(spark, warehouse)
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    h1 = eng.save_table("t", KeyedTable(df1, ("k",)))
    eng.save_table("t", KeyedTable(
        spark.createDataFrame([(1, "b")], "k long, v string"), ("k",)))
    stats = eng.gc(keep_versions=1, dry_run=True)
    assert stats["swept"] == [h1]
    assert eng.objects.exists(h1)
    assert eng.load_table("t", version=1).df.count() == 1  # roots intact


def test_gc_keeps_then_evicts_memoized_views(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, i % 10, float(i)) for i in range(200)],
                               "k long, g long, x double")
    eng.save_table("base", KeyedTable(df, ("k",)))
    REGISTRY.transforms.pop("gc_test_by_g", None)

    @REGISTRY.transform("gc_test_by_g", new_key_cols=("g",))
    def _by_g(d):
        return d.select("g", "x", "__messdb_ord")

    ir = V.sort(eng.scan_ir("base"), "gc_test_by_g", "fold_sum")
    view_hash = eng.materializer.materialize(ir)

    # default: memoized outputs are live — view object survives, memo hits
    assert view_hash not in eng.gc(keep_versions=1)["swept"]
    n_computed = eng.materializer.computed_ops
    assert eng.materializer.materialize(ir) == view_hash
    assert eng.materializer.computed_ops == n_computed

    # collect_memoized=True: cache evicted, memo pruned (no dangling hit),
    # next materialize recomputes the same content
    stats = eng.gc(keep_versions=1, collect_memoized=True)
    assert view_hash in stats["swept"]
    assert stats["pruned_memo"] >= 1
    assert eng.materializer.materialize(ir) == view_hash
    assert eng.materializer.computed_ops > n_computed


def test_gc_traces_bucketed_manifests(spark, warehouse):
    eng = Engine(spark, warehouse)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(3000)],
                               "k long, v string")
    ref = write_bucketed(eng.objects, KeyedTable(df, ("k",)), n_buckets=16)
    mh = eng.save_bucketed_table("bt", ref)

    # superseded state: upsert produces a new manifest in the catalog
    delta = spark.createDataFrame([(7, "NEW"), (9999, "ADD")], "k long, v string")
    ref2 = incremental_upsert(spark, eng.objects, ref, delta)
    mh2 = eng.save_bucketed_table("bt", ref2)
    assert mh != mh2

    stats = eng.gc(keep_versions=1)
    # every bucket of the current manifest survived the sweep
    live_buckets = {h for h in load_manifest(eng.objects, mh2).bucket_hashes
                    if h != "empty"}
    assert live_buckets <= _objects(eng)
    assert mh in stats["swept"]          # old manifest reclaimed
    # buckets unique to the old state are gone, shared ones survive
    old_only = {h for h in ref.bucket_hashes if h != "empty"} - live_buckets
    assert old_only and old_only.isdisjoint(_objects(eng))

    t = eng.load_table("bt")
    assert t.df.count() == 3001
    assert t.df.filter(F.col("k") == 7).collect()[0]["v"] == "NEW"


def test_gc_pruned_version_fails_cleanly_but_diff_on_live_works(spark, tmp_path):
    """GC with a version horizon: diffing two RETAINED versions still
    works; loading a pruned version raises KeyError (not a dangling
    parquet read)."""
    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable, diff_tables

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.ddl("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR)")
    for i in range(3):
        df = spark.createDataFrame([(1, f"v{i}"), (2, "const")],
                                   "k bigint, v string")
        eng.save_table("t", KeyedTable(df, ("k",)))
    v_latest = eng.catalog.current_version()
    eng.gc(keep_versions=2)
    d = diff_tables(eng.load_table("t", version=v_latest - 1),
                    eng.load_table("t", version=v_latest))
    got = {r["k"]: (r["old_v"], r["new_v"]) for r in d.collect()}
    assert got == {1: ("v1", "v2")}
    import pytest as _pytest
    with _pytest.raises(KeyError):
        eng.load_table("t", version=1)


def test_gc_refuses_while_writer_lease_active(spark, tmp_path):
    """A live writer lease blocks gc (GcBusyError); releasing it (or
    force=True) unblocks — the Delta-VACUUM-style concurrent-writer
    window, now enforced instead of documented (verdict r5 task)."""
    import pytest as _pytest

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.store import GcBusyError

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    with eng.write_lease():
        with _pytest.raises(GcBusyError):
            eng.gc()
        # dry run stays allowed (no sweep) and force overrides
        assert "swept" in eng.gc(dry_run=True)
        assert "swept" in eng.gc(force=True)
    # lease released → gc proceeds
    assert "swept" in eng.gc()


def test_gc_reaps_stale_leases(spark, tmp_path):
    """A lease file older than the staleness horizon is an abandoned
    (crashed) writer: gc reaps it and proceeds."""
    import os
    import time

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    d = os.path.join(eng.warehouse, "leases")
    os.makedirs(d, exist_ok=True)
    stale = os.path.join(d, "deadbeef.lease")
    open(stale, "w").close()
    old = time.time() - 7200
    os.utime(stale, (old, old))
    assert "swept" in eng.gc()          # stale lease did not block
    assert not os.path.exists(stale)    # and was reaped


def test_put_holds_lease_during_write(spark, tmp_path, monkeypatch):
    """ObjectStore.put holds a writer lease across its stage→commit:
    observed by intercepting the staged write."""
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    seen = {}
    orig = ObjectStore.active_leases

    import pyspark.sql.readwriter as rw
    orig_parquet = rw.DataFrameWriter.parquet

    def spy(self, path, **kw):
        if "staging" in path:
            seen["leases_during_write"] = orig(store)
        return orig_parquet(self, path, **kw)

    monkeypatch.setattr(rw.DataFrameWriter, "parquet", spy)
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    store.put(df, table_content_hash)
    assert len(seen["leases_during_write"]) == 1
    assert store.active_leases() == []  # released after commit


def test_gc_vs_streaming_upsert_lease_compose(spark, sf_dir, tmp_path):
    """GC leases composed with the streaming sink (r6 verdict task 6):
    a multi-batch foreachBatch upsert whose sink holds the compound
    writer lease across stage→commit. Mid-commit — after the merged
    object is staged into the CAS but BEFORE the catalog root
    references it — gc must refuse with GcBusyError and the in-flight
    object must survive; after the stream drains (no live leases) gc
    proceeds, sweeps only superseded roots, and the final table is
    intact."""
    from pyspark.sql import functions as F

    from messdb_spark.engine import Engine
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import CatalogEntry
    from messdb_spark.operators.core import (KeyedTable, canonicalize_input,
                                             merge_tables)
    from messdb_spark.store import GcBusyError
    from messdb_spark.streaming.stream import read_event_stream

    eng = Engine(spark, str(tmp_path / "wh"))
    # two files → two triggers at max_files_per_trigger=1 → two commits
    from messdb_spark.session import read_table
    batch = read_table(spark, sf_dir, "events")
    n_total = batch.count()
    d = tmp_path / "split"
    batch.filter(F.col("event_id") % 2 == 0).coalesce(1) \
         .write.parquet(str(d / "a"))
    batch.filter(F.col("event_id") % 2 == 1).coalesce(1) \
         .write.parquet(str(d / "b"))
    src = tmp_path / "gc_events_in"
    src.mkdir()
    for sub in ("a", "b"):
        for f in (d / sub).glob("part-*.parquet"):
            (src / f"{sub}_{f.name}").symlink_to(f)

    probes = []

    def sink(batch_df, epoch_id):
        with eng.write_lease():
            folded = canonicalize_input(batch_df, ("event_id",))
            incoming = KeyedTable(folded.df.localCheckpoint(eager=True),
                                  folded.key_cols)
            try:
                current = eng.load_table("events_live")
                merged = merge_tables([current, incoming])
            except KeyError:
                merged = incoming
            # stage the object WITHOUT registering it — the in-flight
            # window a concurrent gc must not be able to sweep
            h = eng.objects.put(merged.df, table_content_hash,
                                key_cols=("event_id",))
            refused = False
            try:
                eng.gc(keep_versions=1)
            except GcBusyError:
                refused = True
            probes.append((epoch_id, refused, eng.objects.exists(h)))
            eng._register("events_live", CatalogEntry(
                table_hash=h, schema_json=merged.df.schema.json(),
                key_cols=list(merged.key_cols)))

    stream = read_event_stream(spark, str(src))
    q = (stream.writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "gc_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(probes) == 2
    for _, refused, inflight_survived in probes:
        assert refused, "gc ran inside a live writer lease"
        assert inflight_survived, "in-flight object was swept"
    # stream drained → no live leases → gc proceeds and sweeps only the
    # superseded v1 root's object
    assert eng.objects.active_leases() == []
    stats = eng.gc(keep_versions=1)
    assert probes[0][0] != probes[1][0]
    t = eng.load_table("events_live")
    assert t.df.count() == n_total
    assert t.df.select("event_id").distinct().count() == n_total
    swept = set(stats["swept"])
    assert eng.catalog.get("events_live").table_hash not in swept


def test_gc_clears_orphaned_staging(spark, tmp_path):
    """A kill-9'd writer leaves its stage-write under staging/ forever
    (its finally-cleanup never ran); gc must clear those orphans once
    they age past ``lease_stale_after`` — the same horizon as an
    abandoned lease — and a dry run must count without deleting."""
    import os
    import time

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    # simulate two crashed writers' leftovers, aged past the horizon
    staging = os.path.join(eng.objects.warehouse, "staging")
    old = time.time() - 7200
    for name in ("deadbeef01", "deadbeef02"):
        d = os.path.join(staging, name)
        os.makedirs(d)
        with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
            f.write(b"torn")
        os.utime(d, (old, old))
    stats = eng.gc(dry_run=True)
    assert stats["orphaned_staging"] == 2
    assert len(os.listdir(staging)) == 2     # dry run deletes nothing
    stats = eng.gc()
    assert stats["orphaned_staging"] == 2
    assert os.listdir(staging) == []
    # the committed table is untouched
    assert eng.load_table("t").df.count() == 1


def test_gc_staging_sweep_spares_fresh_writers(spark, tmp_path):
    """TOCTOU guard (ADVICE r8): a writer that acquired its lease AFTER
    gc's initial lease check can be mid stage-write when the staging
    sweep runs; its fresh dir must be spared (age-gated), or a
    partially-deleted stage could commit a silently truncated object.
    ``force=True`` (single-writer setups) reaps regardless of age."""
    import os
    import time

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    staging = os.path.join(eng.objects.warehouse, "staging")
    fresh = os.path.join(staging, "inflight01")
    stale = os.path.join(staging, "crashed01")
    for d in (fresh, stale):
        os.makedirs(d)
        with open(os.path.join(d, "part-00000.parquet"), "wb") as f:
            f.write(b"bytes")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    stats = eng.gc()
    assert stats["orphaned_staging"] == 1          # only the aged one
    assert os.path.isdir(fresh) and not os.path.isdir(stale)
    stats = eng.gc(force=True)
    assert stats["orphaned_staging"] == 1          # force reaps fresh too
    assert os.listdir(staging) == []


def test_lease_acquisition_waits_for_sweep_gate(spark, tmp_path):
    """Lock-then-validate (r9): lease acquisition must block while a
    FRESH gc sweep gate is up (a sweep is deleting from its snapshot;
    a commit now could reference an object mid-delete) and must ignore
    a STALE gate (crashed gc must not wedge writers forever)."""
    import os
    import threading
    import time

    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    store.raise_sweep_gate()
    acquired = threading.Event()

    def _writer():
        with store.lease():
            acquired.set()

    t = threading.Thread(target=_writer, daemon=True)
    t.start()
    assert not acquired.wait(0.5), "lease acquired through a fresh gate"
    leases_dir = os.path.join(store.warehouse, "leases")
    assert not any(f.endswith(".lease")
                   for f in os.listdir(leases_dir)), \
        "withdrawn lease left behind while waiting"
    store.lower_sweep_gate()
    assert acquired.wait(5), "lease never acquired after gate lowered"
    t.join(5)

    # stale gate (crashed gc): writers proceed
    store.raise_sweep_gate()
    old = time.time() - store.SWEEP_GATE_STALE - 10
    os.utime(store._sweep_gate_path(), (old, old))
    with store.lease():
        pass                                # no hang


def test_gc_lowers_gate_on_all_paths(spark, tmp_path):
    """The sweep gate must come down after a successful gc AND after a
    GcBusyError abort — a leaked gate blocks every writer for
    SWEEP_GATE_STALE seconds."""
    import os

    from messdb_spark.engine import Engine
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.store import GcBusyError

    eng = Engine(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    eng.gc()
    assert not eng.objects.sweep_gate_active()
    # abort path: a live lease makes the post-gate re-check raise
    with eng.objects.lease():
        import pytest as _pytest
        with _pytest.raises(GcBusyError):
            eng.gc()
    assert not eng.objects.sweep_gate_active()


def test_put_blocks_on_sweep_gate_then_commits(spark, tmp_path):
    """Production write path × gate integration: a real ObjectStore.put
    issued while a FRESH sweep gate is up must wait (not write), then
    complete correctly once the gate drops."""
    import threading
    import time

    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)],
                               "k long, v string")
    store.raise_sweep_gate()
    done = threading.Event()
    result = {}

    def _writer():
        result["h"] = store.put(df, table_content_hash)
        done.set()

    t = threading.Thread(target=_writer, daemon=True)
    t.start()
    assert not done.wait(1.0), "put proceeded through a fresh sweep gate"
    assert store.saves == 0                      # nothing written yet
    store.lower_sweep_gate()
    assert done.wait(60), "put never completed after gate lowered"
    t.join(10)
    assert store.exists(result["h"]) and store.saves == 1
    assert table_content_hash(
        spark.read.parquet(store.path(result["h"]))) == result["h"]


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_gc_protects_memo_commit_in_mark_gate_window(spark, warehouse,
                                                     backend):
    """ADVICE r10 (medium): a Materializer that completes ENTIRELY
    inside gc's mark→gate window commits via memo.put without bumping
    the catalog version — and if it dedup'd (write-once skip) onto an
    existing UNREFERENCED object, the version re-check alone would let
    the sweep delete that object and the prune drop the fresh memo
    entry. The post-gate memo re-read must catch it. Simulated
    deterministically: the racing commit fires from the raise_sweep_gate
    hook (= after the mark, before the gate checks), through a SECOND
    store handle standing in for another process."""
    eng = Engine(spark, warehouse + backend, manifest_backend=backend)
    eng.save_table("t", KeyedTable(
        spark.createDataFrame([(1, "a")], "k long, v string"), ("k",)))
    # an existing unreferenced object — the dedup target
    from messdb_spark.hashing import table_content_hash
    orphan = eng.objects.put(
        spark.createDataFrame([(9, "z")], "k long, v string"),
        table_content_hash)
    assert eng.objects.exists(orphan)

    if backend == "sqlite":
        other_memo = eng.memo        # sqlite reads are live cross-handle
    else:
        from messdb_spark.store import MemoStore
        other_memo = MemoStore(eng.objects.warehouse)  # "other process"

    real_raise = eng.objects.raise_sweep_gate
    fired = {}

    def _racing_raise():
        if not fired:
            fired["digest"] = "racing-op-digest"
            other_memo.put(fired["digest"], orphan)    # memo-only commit
        real_raise()

    eng.objects.raise_sweep_gate = _racing_raise
    stats = eng.gc()
    assert orphan not in stats["swept"], \
        "sweep deleted an object a mark-window memo commit references"
    assert eng.objects.exists(orphan)
    assert stats["pruned_memo"] == 0
    # the entry itself survived the prune (re-read through a fresh view)
    if backend == "sqlite":
        assert eng.memo.get("racing-op-digest") == orphan
    else:
        from messdb_spark.store import MemoStore
        assert MemoStore(eng.objects.warehouse).get(
            "racing-op-digest") == orphan


def test_gc_collect_memoized_protects_only_late_commits(spark, warehouse):
    """Under collect_memoized=True the standing compute cache IS the
    eviction target — but a memo commit landing in the mark→gate window
    is an in-flight writer, not standing cache, and must survive."""
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import MemoStore

    eng = Engine(spark, warehouse)
    eng.save_table("t", KeyedTable(
        spark.createDataFrame([(1, "a")], "k long, v string"), ("k",)))
    old_target = eng.objects.put(
        spark.createDataFrame([(2, "old")], "k long, v string"),
        table_content_hash)
    eng.memo.put("standing-entry", old_target)      # pre-existing cache
    late_target = eng.objects.put(
        spark.createDataFrame([(3, "new")], "k long, v string"),
        table_content_hash)

    real_raise = eng.objects.raise_sweep_gate
    fired = {}

    def _racing_raise():
        if not fired:
            fired["x"] = True
            MemoStore(eng.objects.warehouse).put("late-entry", late_target)
        real_raise()

    eng.objects.raise_sweep_gate = _racing_raise
    stats = eng.gc(collect_memoized=True)
    assert old_target in stats["swept"] and not eng.objects.exists(old_target)
    assert eng.objects.exists(late_target), \
        "late memo commit's object evicted with the standing cache"
    fresh = MemoStore(eng.objects.warehouse)
    assert fresh.get("standing-entry") is None      # evicted + pruned
    assert fresh.get("late-entry") == late_target   # protected


def test_sweep_gate_heartbeat_outlives_one_long_delete(tmp_path):
    """ADVICE r10 (low): gate freshness must not depend on per-entry
    touches — one rmtree longer than SWEEP_GATE_STALE would let writers
    judge the gc crashed mid-sweep. The heartbeat thread keeps the gate
    fresh across any single long operation."""
    import time

    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    store.SWEEP_HEARTBEAT = 0.05
    store.raise_sweep_gate()
    with store.sweep_gate_heartbeat():
        # simulate "mid-rmtree": age the gate past staleness, then wait
        # one heartbeat period — the thread must re-freshen it
        old = time.time() - store.SWEEP_GATE_STALE - 10
        os.utime(store._sweep_gate_path(), (old, old))
        deadline = time.time() + 5
        while not store.sweep_gate_active() and time.time() < deadline:
            time.sleep(0.02)
        assert store.sweep_gate_active(), \
            "heartbeat did not refresh a staled gate"
    store.lower_sweep_gate()


def test_lease_wait_emits_observability_line(tmp_path, capsys):
    """A writer parked on the sweep gate longer than LEASE_WAIT_WARN
    prints ONE diagnostic line (stuck-warehouse triage, VERDICT r9
    stretch #7) and still acquires once the gate drops."""
    import threading

    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    store.LEASE_WAIT_WARN = 0.2
    store.raise_sweep_gate()
    got = threading.Event()

    def _writer():
        with store.lease():
            got.set()

    t = threading.Thread(target=_writer, daemon=True)
    t.start()
    assert not got.wait(0.6)            # parked past the warn threshold
    store.lower_sweep_gate()
    assert got.wait(10)
    t.join(5)
    assert "waiting" in capsys.readouterr().err
