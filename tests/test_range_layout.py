"""Range-bucketed layout: ordered fan-out with whole-bucket range
pruning (``Trie.hs:492-510`` at manifest granularity) — correctness vs
full scan, driver-side bucket skipping, passthrough upserts, manifest
roundtrip."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from messdb_spark.operators.core import KeyedTable
from messdb_spark.plans.incremental import EMPTY
from messdb_spark.plans.range_layout import (
    RangeBucketedRef, incremental_upsert_range, load_range_manifest,
    range_filter_bucketed, read_range_bucketed, save_range_manifest,
    write_range_bucketed)
from messdb_spark.store import ObjectStore


def _base(spark, n=5000):
    return KeyedTable(
        spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v")),
        ("k",))


def test_roundtrip_and_balance(spark, warehouse):
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark), n_buckets=8)
    assert ref.n_buckets == 8
    assert all(h != EMPTY for h in ref.bucket_hashes)
    got = {(r["k"], r["v"])
           for r in read_range_bucketed(spark, store, ref).df.collect()}
    assert got == {(i, f"v{i}") for i in range(5000)}
    # quantile split points keep buckets within ~3x of the mean
    sizes = [read_range_bucketed(spark, store, ref, buckets=[b]).df.count()
             for b in range(8)]
    assert sum(sizes) == 5000
    assert max(sizes) <= 3 * (5000 / 8)


def test_range_filter_prunes_buckets(spark, warehouse):
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark), n_buckets=8)
    loads_before = store.loads
    out = range_filter_bucketed(spark, store, ref, lo=1000, hi=1400)
    rows = {r["k"] for r in out.df.collect()}
    assert rows == set(range(1000, 1401))
    opened = store.loads - loads_before
    expected = len(ref.overlapping(1000.0, 1400.0))
    assert opened == expected
    assert opened < ref.n_buckets            # whole buckets were skipped
    # one-sided + unbounded ranges
    assert range_filter_bucketed(spark, store, ref, lo=4990).df.count() == 10
    assert range_filter_bucketed(spark, store, ref).df.count() == 5000


def test_point_lookup_opens_one_bucket(spark, warehouse):
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark), n_buckets=8)
    loads_before = store.loads
    out = range_filter_bucketed(spark, store, ref, lo=777, hi=777)
    assert [r["k"] for r in out.df.collect()] == [777]
    assert store.loads - loads_before == 1


def test_incremental_upsert_passthrough(spark, warehouse):
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark), n_buckets=8)
    # clustered delta: updates at the tail + a few inserts past max key
    delta = spark.range(4950, 5040).select(
        F.col("id").alias("k"), F.lit("UPD").alias("v"))
    ref2 = incremental_upsert_range(spark, store, ref, delta)
    assert ref2.boundaries == ref.boundaries
    changed = [i for i, (a, b) in
               enumerate(zip(ref.bucket_hashes, ref2.bucket_hashes)) if a != b]
    # the clustered delta lands in the last bucket(s) only
    assert changed and len(changed) <= 2
    assert changed == sorted(changed)
    assert min(changed) >= ref.bucket_of(4950.0)
    got = {(r["k"], r["v"])
           for r in read_range_bucketed(spark, store, ref2).df.collect()}
    expect = {(i, f"v{i}") for i in range(4950)}
    expect |= {(i, "UPD") for i in range(4950, 5040)}
    assert got == expect
    # the updated tail is still range-readable with pruning
    loads_before = store.loads
    out = range_filter_bucketed(spark, store, ref2, lo=5000, hi=5039)
    assert out.df.count() == 40
    assert store.loads - loads_before < ref2.n_buckets


def test_manifest_roundtrip_and_identity(spark, warehouse):
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark, 1000), n_buckets=4)
    h = save_range_manifest(store, ref)
    back = load_range_manifest(store, h)
    assert back == ref
    assert back.table_hash == h
    # write-once: saving again is a skip, same address
    saves = store.saves
    assert save_range_manifest(store, ref) == h
    assert store.saves == saves


def test_timestamp_key(spark, warehouse):
    store = ObjectStore(warehouse)
    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    df = spark.range(2000).select(
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("base"),
        F.col("id")).select(
        (F.col("base") + F.make_interval(mins=F.col("id"))).alias("ts"),
        F.col("id").alias("n")).drop("base")
    ref = write_range_bucketed(store, KeyedTable(df, ("ts",)), n_buckets=8)
    lo = t0 + datetime.timedelta(minutes=100)
    hi = t0 + datetime.timedelta(minutes=260)
    loads_before = store.loads
    out = range_filter_bucketed(spark, store, ref, lo=lo.replace(tzinfo=None),
                                hi=hi.replace(tzinfo=None))
    assert sorted(r["n"] for r in out.df.collect()) == list(range(100, 261))
    assert store.loads - loads_before < ref.n_buckets


def test_rejects_string_key(spark, warehouse):
    store = ObjectStore(warehouse)
    df = spark.range(10).select(F.concat(F.lit("k"), F.col("id")).alias("k"),
                                F.col("id").alias("v"))
    with pytest.raises(ValueError, match="orderable"):
        write_range_bucketed(store, KeyedTable(df, ("k",)), n_buckets=4)


def test_structural_sharing_across_versions(spark, warehouse):
    """Two refs differing by one bucket share the other objects —
    the CAS dedups identical bucket content across versions."""
    store = ObjectStore(warehouse)
    ref = write_range_bucketed(store, _base(spark), n_buckets=8)
    delta = spark.range(10).select(F.col("id").alias("k"),
                                   F.lit("X").alias("v"))
    ref2 = incremental_upsert_range(spark, store, ref, delta)
    shared = sum(a == b for a, b in zip(ref.bucket_hashes,
                                        ref2.bucket_hashes))
    assert shared >= 6
    assert ref.table_hash != ref2.table_hash


def test_engine_integration_catalog_gc_sync_verify(spark, tmp_path):
    """Range-bucketed tables are first-class catalog citizens: save /
    load / verify / GC-trace / incremental sync all work through the
    manifest, exactly like the hash-bucketed flavor."""
    from messdb_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    t = _base(spark, 2000)
    ref = write_range_bucketed(eng.objects, t, n_buckets=4)
    h = eng.save_range_bucketed_table("rt", ref)
    # load reassembles through the manifest
    got = {(r["k"], r["v"]) for r in eng.load_table("rt").df.collect()}
    assert got == {(i, f"v{i}") for i in range(2000)}
    # scrub verifies every bucket against its manifest address
    assert eng.verify_table("rt")
    # GC keeps the manifest AND its bucket children
    res = eng.gc(dry_run=True)
    for bh in ref.bucket_hashes:
        assert bh not in res["swept"]
    assert h not in res["swept"]
    # incremental sync: second sync after a 1-bucket change ships only
    # the manifest + changed bucket
    dst = Engine(spark, str(tmp_path / "wh2"))
    r1 = eng.sync_table("rt", dst)
    assert r1["copied"] == 1 + sum(ch != "empty" for ch in ref.bucket_hashes)
    assert {(r["k"], r["v"]) for r in dst.load_table("rt").df.collect()} == got
    delta = spark.range(5).select(F.col("id").alias("k"),
                                  F.lit("Z").alias("v"))
    ref2 = incremental_upsert_range(spark, eng.objects, ref, delta)
    eng.save_range_bucketed_table("rt", ref2)
    r2 = eng.sync_table("rt", dst)
    n_changed = sum(a != b for a, b in zip(ref.bucket_hashes,
                                           ref2.bucket_hashes))
    assert r2["copied"] == 1 + n_changed and n_changed < ref.n_buckets
