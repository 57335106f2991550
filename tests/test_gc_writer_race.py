"""GC × concurrent-writer composition (VERDICT r8 task 5): N writer
processes commit tables in a loop WHILE a gc process runs
``gc(keep_versions=2, collect_memoized=True)`` — the adversarial
interleaving behind every lease/ordering guard in ``Engine.gc``:

- an object swept between its CAS commit and its root swap would leave
  the catalog pointing at nothing (closed by save-path leases spanning
  put → register, and by gc's post-mark lease+version re-check over a
  pre-re-check sweep snapshot);
- a memo entry recorded after its target was swept would dangle
  (closed by the Materializer's lease spanning put → memo.put);
- root pruning under a concurrent CAS retry must not lose commits.

Workers avoid Spark (the race is in the store layer): the stage→commit
dance is reproduced byte-for-byte on the same ObjectStore paths with a
writer lease held across stage → commit → register, exactly like
``Engine.save_table``. Each writer verifies its own committed objects
survive while current; the parent verifies zero lost commits,
consecutive versions, every retained root's objects present, and zero
dangling memo entries — on BOTH manifest backends.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_WRITER = r"""
import hashlib, os, shutil, sys, uuid
sys.path.insert(0, %(repo)r)
from messdb_spark.engine import Engine
from messdb_spark.store import CatalogEntry

backend, wh, prefix, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
eng = Engine(None, wh, manifest_backend=backend)
last_h = None
for i in range(n):
    # the previous commit is still referenced by the current root (it
    # was only just superseded, keep_versions=2 retains it): if gc
    # swept it, a commit was lost
    if last_h is not None and not eng.objects.exists(last_h):
        print(f"LOST still-referenced object {last_h}", file=sys.stderr)
        sys.exit(2)
    # every 3rd commit re-registers a SHARED constant payload: when the
    # object already exists in the CAS (left unreferenced by another
    # writer's superseded commit), the put is a write-once SKIP and the
    # commit is a pure root-reference to an existing object — the
    # dedup'd-reference path a sweeping gc must not delete from under
    # us (closed by the sweep gate; ADVICE r9 finding 1)
    payload = (b"shared-dedup-target" if i %% 3 == 2
               else f"{prefix}-{i}".encode())
    h = "obj" + hashlib.sha256(payload).hexdigest()[:24]
    with eng.objects.lease():                     # Engine.save_table shape
        staging = os.path.join(wh, "staging", uuid.uuid4().hex)
        os.makedirs(staging)
        with open(os.path.join(staging, "data.bin"), "wb") as f:
            f.write(payload)
        if not eng.objects.exists(h):
            os.makedirs(os.path.dirname(eng.objects.path(h)), exist_ok=True)
            shutil.move(staging, eng.objects.path(h))
            open(os.path.join(eng.objects.path(h), "_SUCCESS"), "w").close()
        else:
            shutil.rmtree(staging, ignore_errors=True)
        eng._register(f"t_{prefix}", CatalogEntry(h, "{}", ["k"]))
        eng.memo.put(f"memo_{prefix}_{i}", h)
    if not eng.objects.exists(h):                 # swept out from under us?
        print(f"LOST just-committed object {h}", file=sys.stderr)
        sys.exit(2)
    last_h = h
"""

_GC_LOOP = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
from messdb_spark.engine import Engine
from messdb_spark.store import GcBusyError

backend, wh, stop_file = sys.argv[1], sys.argv[2], sys.argv[3]
ok = busy = 0
while not os.path.exists(stop_file):
    try:
        # fresh Engine per run (a gc cron): the JSON memo cache is
        # load-at-init, a long-lived stale one would clobber writers
        Engine(None, wh, manifest_backend=backend).gc(
            keep_versions=2, collect_memoized=True)
        ok += 1
    except GcBusyError:
        busy += 1
        time.sleep(0.01)
print(f"gc_ok={ok} gc_busy={busy}")
"""


@pytest.mark.parametrize("backend", ["json", "sqlite"])
def test_gc_against_live_writers_loses_nothing(tmp_path, backend):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    stop_file = str(tmp_path / "stop")
    n_writers, n_commits = 3, 30

    gc_proc = subprocess.Popen(
        [sys.executable, "-c", _GC_LOOP % {"repo": repo},
         backend, wh, stop_file],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    writers = [
        subprocess.Popen(
            [sys.executable, "-c", _WRITER % {"repo": repo},
             backend, wh, f"w{i}", str(n_commits)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(n_writers)]
    for p in writers:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"writer failed (rc={p.returncode}): {err[-2000:]}"
    open(stop_file, "w").close()
    gc_out, gc_err = gc_proc.communicate(timeout=300)
    assert gc_proc.returncode == 0, f"gc loop failed: {gc_err[-2000:]}"
    # the loop must have raced real sweeps against the writers (typical:
    # tens of ok runs + some busy refusals), not just spun on busy
    gc_ok = int(gc_out.split("gc_ok=")[1].split()[0])
    assert gc_ok >= 1, f"no gc succeeded mid-run ({gc_out.strip()})"

    from messdb_spark.engine import Engine
    eng = Engine(None, wh, manifest_backend=backend)
    # one quiescent gc must now succeed (and makes the end-state checks
    # cover the post-gc world, not a pre-gc accident)
    stats = eng.gc(keep_versions=2, collect_memoized=True)

    # zero lost commits: version count is exactly the commit count
    # (every _register allocated a distinct consecutive version)
    total = n_writers * n_commits
    assert eng.catalog.current_version() == total
    # every writer's final table resolves to a live object
    for i in range(n_writers):
        e = eng.catalog.get(f"t_w{i}")
        assert e is not None and eng.objects.exists(e.table_hash), \
            f"t_w{i} -> {e and e.table_hash} missing from CAS"
    # every retained root's references are all live (nothing referenced
    # was swept), and retained versions are consecutive
    cur = eng.catalog.current_version()
    for v in range(max(1, cur - 1), cur + 1):
        root = eng.catalog._load_root(v)
        assert root, f"retained root v{v} missing"
        for name, rec in root.items():
            assert eng.objects.exists(rec["table_hash"]), \
                f"root v{v} references swept object for {name}"
    # zero dangling memo entries
    if backend == "json":
        memo_map = json.load(open(os.path.join(wh, "memo.json"))) \
            if os.path.exists(os.path.join(wh, "memo.json")) else {}
    else:
        memo_map = dict(eng.memo._con.execute(
            "SELECT key, value FROM memo_store").fetchall())
    for k, h in memo_map.items():
        assert eng.objects.exists(h), f"memo {k} dangles -> {h}"
    # the final gc saw a quiescent warehouse: superseded objects beyond
    # the horizon are really gone (gc is doing work, not vacuously green)
    assert stats["pruned_roots"] >= 0
    n_objects = len(os.listdir(eng.objects.objects_dir))
    assert n_objects <= 2 * n_writers + 1, \
        f"{n_objects} objects survive a keep_versions=2 gc"
