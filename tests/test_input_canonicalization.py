"""Within-input duplicate-key folding at every raw-data entry point.

The reference folds within-input collisions deterministically via
``tableFromRows`` (``messdb-schema/src/MessDB/Table.hs:125-140``) and
routes CSV import through it (``messdb-tool/src/MessDB/Tool/Csv.hs:41``).
The anti-join merge fast path assumes one-row-per-key inputs, so every
entry point that wraps a raw DataFrame (file import, stream micro-batch,
upsert delta) must canonicalize first — these tests feed duplicate keys
through each and assert the one-row-per-key invariant (``check_table``)
plus last-in-input-order-wins."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from messdb_spark.operators.core import (KeyedTable, canonicalize_input,
                                         check_table)


def test_canonicalize_last_in_order_wins(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c"), (1, "d"), (3, "e")], "k int, v string")
    # single partition => monotonically_increasing_id is exactly row order
    t = canonicalize_input(df.coalesce(1), ("k",))
    assert check_table(t)
    assert {(r["k"], r["v"]) for r in t.df.collect()} == {
        (1, "d"), (2, "b"), (3, "e")}


def test_import_csv_folds_within_file_dups(spark, tmp_path, warehouse):
    from messdb_spark.engine import Engine
    from messdb_spark.sources.io import import_csv

    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR)")
    p = tmp_path / "dup.csv"
    p.write_text("k,v\n1,first\n2,only\n1,second\n1,last\n")
    merged = import_csv(spark, str(p), eng.load_table("t"))
    assert check_table(merged)
    rows = {(r["k"], r["v"]) for r in merged.df.collect()}
    assert rows == {(1, "last"), (2, "only")}


def test_import_json_folds_within_file_dups(spark, tmp_path, warehouse):
    from messdb_spark.engine import Engine
    from messdb_spark.sources.io import import_json

    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR)")
    p = tmp_path / "dup.jsonl"
    p.write_text('{"k": 1, "v": "first"}\n{"k": 1, "v": "last"}\n'
                 '{"k": 5, "v": "x"}\n')
    merged = import_json(spark, str(p), eng.load_table("t"))
    assert check_table(merged)
    rows = {(r["k"], r["v"]) for r in merged.df.collect()}
    assert rows == {(1, "last"), (5, "x")}


def test_incremental_upsert_folds_dup_delta(spark, warehouse, tmp_path):
    from messdb_spark.plans.incremental import (incremental_upsert,
                                                read_bucketed, write_bucketed)
    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "objs"))
    base = spark.createDataFrame([(i, "base") for i in range(100)],
                                 "k int, v string")
    ref = write_bucketed(store, KeyedTable(base, ("k",)), n_buckets=8)
    delta = spark.createDataFrame(
        [(5, "first"), (5, "second"), (200, "new"), (200, "newer")],
        "k int, v string").coalesce(1)
    ref2 = incremental_upsert(spark, store, ref, delta)
    t = read_bucketed(spark, store, ref2)
    assert check_table(t)
    got = {r["k"]: r["v"] for r in t.df.collect()}
    assert got[5] == "second" and got[200] == "newer"
    assert len(got) == 101


def test_stream_upsert_batch_with_dup_keys(spark, warehouse):
    """A micro-batch carrying the same key twice (retry/replay) must
    fold to one row before merging into the catalog table. Drives the
    sink's per-batch function directly with crafted batches — the exact
    micro-batch carve-up is then deterministic (the former live
    rate-source version was timing-dependent under suite load and
    couldn't assert which row won)."""
    from messdb_spark.engine import Engine
    from messdb_spark.streaming.stream import upsert_batch

    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE s (k BIGINT PRIMARY KEY, v VARCHAR)")
    batches = [
        [(0, "b1-first"), (1, "b1-only"), (0, "b1-last")],
        [(1, "b2-first"), (1, "b2-last"), (2, "b2-new")],
        [(0, "b3")],
    ]
    for rows in batches:
        upsert_batch(eng, "s",
                     spark.createDataFrame(rows, "k bigint, v string")
                          .coalesce(1),
                     key_cols=("k",))
        t = eng.load_table("s")
        assert check_table(t)  # invariant holds after EVERY batch
    got = {r["k"]: r["v"] for r in eng.load_table("s").df.collect()}
    assert got == {0: "b3", 1: "b2-last", 2: "b2-new"}


def test_stream_upsert_live_rate_smoke(spark, warehouse, tmp_path):
    """Live end-to-end smoke of the foreachBatch wiring (rate source).
    Row-content assertions live in the crafted-batch test above; this
    only checks the streaming plumbing preserves the key invariant."""
    from messdb_spark.engine import Engine
    from messdb_spark.streaming.stream import stream_upsert_into

    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE s (k BIGINT PRIMARY KEY, v VARCHAR)")
    src = (spark.readStream.format("rate").option("rowsPerSecond", "50").load()
           .select((F.col("value") % 2).alias("k"),
                   F.col("value").cast("string").alias("v")))
    q = stream_upsert_into(eng, "s", src,
                           key_cols=("k",),
                           checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        # processAllAvailable can return before the rate source has
        # emitted anything (legitimately leaving an empty — still
        # valid — table); loop until at least one row-bearing batch
        # has merged so the fold path actually runs
        import time
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if eng.load_table("s").df.limit(1).count() > 0:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    t = eng.load_table("s")
    assert check_table(t)  # rate source repeats k in one batch; must fold
    assert t.df.count() > 0


def test_stream_upsert_batch_replay_is_idempotent(spark, warehouse):
    """foreachBatch is at-least-once: after a crash between the table
    commit and the checkpoint commit, the SAME micro-batch replays.
    The last-wins merge must make that replay a no-op — same content
    hash, so the CAS write dedups and the catalog root is unchanged
    modulo version — which is what turns the at-least-once sink into
    an effectively-once pipeline."""
    from messdb_spark.engine import Engine
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.streaming.stream import upsert_batch

    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE s (k BIGINT PRIMARY KEY, v VARCHAR)")
    batch = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "a2")], "k bigint, v string").coalesce(1)
    upsert_batch(eng, "s", batch, key_cols=("k",))
    h1 = eng.table_hash("s")
    saves_before = eng.objects.saves
    upsert_batch(eng, "s", batch, key_cols=("k",))   # replay same batch
    assert eng.table_hash("s") == h1                 # content unchanged
    assert eng.objects.saves == saves_before         # CAS dedup, no new object
    got = {r["k"]: r["v"] for r in eng.load_table("s").df.collect()}
    assert got == {1: "a2", 2: "b"}
