"""Adaptive bucket split/merge (plans/adaptive) — the trie
inline/external node discipline (``Trie.hs:214-220``) at bucket
granularity: hot buckets split into a two-level manifest, refresh
stays ∝ touched leaves, logical content identity is layout-invariant,
and undersized splits merge back at compaction."""

from __future__ import annotations

import pyspark.sql.functions as F

from messdb_spark.hashing import table_content_hash
from messdb_spark.operators.core import KeyedTable
from messdb_spark.plans.adaptive import (
    AdaptiveRef, compact_adaptive, load_adaptive_manifest, read_adaptive,
    save_adaptive_manifest, upsert_adaptive, write_adaptive)
from messdb_spark.store import MemoStore, ObjectStore

N_BUCKETS = 4
FANOUT = 4


def _fat(col, chunks=16):
    """~1 KB of incompressible (hash-entropy) payload per row — parquet
    can't RLE it away, so on-disk size tracks row count."""
    return F.concat(*[F.sha2(F.concat(col.cast("string"), F.lit(str(j))),
                             256) for j in range(chunks)])


def _skewed_table(spark, n=4000):
    """Bucket 0's rows carry a fat payload → it alone crosses the
    split threshold."""
    b = F.pmod(F.xxhash64("k"), F.lit(N_BUCKETS))
    return KeyedTable(
        spark.range(n).select(
            F.col("id").alias("k"),
            F.when(b == 0, _fat(F.col("id")))
             .otherwise(F.lit("s")).alias("payload"),
            (F.col("id") * 7).alias("v")),
        ("k",))


def test_hot_bucket_splits_others_stay(spark, warehouse):
    store = ObjectStore(warehouse)
    t = _skewed_table(spark)
    ref = write_adaptive(store, t, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=256 * 1024)
    assert ref.split_buckets == [0]
    assert all(isinstance(ref.entries[b], str) for b in (1, 2, 3))
    # split children partition bucket 0's rows completely
    got = read_adaptive(spark, store, ref).df
    assert got.count() == 4000
    # logical content identity is layout-invariant
    assert table_content_hash(got) == table_content_hash(t.df)


def test_upsert_touches_only_delta_leaves(spark, warehouse):
    store = ObjectStore(warehouse)
    t = _skewed_table(spark)
    ref = write_adaptive(store, t, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=256 * 1024)
    assert ref.split_buckets == [0]
    # one delta key inside split bucket 0, one in an unsplit bucket
    buckets = {r["k"]: r["b"] for r in
               spark.range(200).select(
                   F.col("id").alias("k"),
                   F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)).alias("b"))
               .collect()}
    k_split = next(k for k, b in buckets.items() if b == 0)
    k_flat = next(k for k, b in buckets.items() if b != 0)
    delta = spark.createDataFrame(
        [(k_split, "UPD", -1), (k_flat, "UPD", -2)],
        "k long, payload string, v long")

    loads0 = store.loads
    ref2 = upsert_adaptive(spark, store, ref, delta,
                           split_bytes=256 * 1024)
    # read_adaptive(tags=...) loaded exactly the two touched leaves
    assert store.loads - loads0 == 2
    # untouched children of the split bucket keep their hashes
    changed_children = sum(
        1 for a, b in zip(ref.entries[0], ref2.entries[0]) if a != b)
    assert changed_children == 1
    # untouched buckets keep theirs
    assert sum(1 for a, b in zip(ref.entries[1:], ref2.entries[1:])
               if a != b) == 1
    # merged content equals plain last-wins merge
    got = {r["k"]: (r["payload"], r["v"]) for r in
           read_adaptive(spark, store, ref2).df
           .filter(F.col("k").isin(k_split, k_flat)).collect()}
    assert got == {k_split: ("UPD", -1), k_flat: ("UPD", -2)}
    assert read_adaptive(spark, store, ref2).df.count() == 4000


def test_sustained_growth_resplits_and_compact_merges(spark, warehouse):
    store = ObjectStore(warehouse)
    small = KeyedTable(
        spark.range(500).select(F.col("id").alias("k"),
                                F.lit("s").alias("payload"),
                                F.col("id").alias("v")),
        ("k",))
    ref = write_adaptive(store, small, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=64 * 1024)
    assert ref.split_buckets == []
    # grow one bucket past the threshold via upserts → it splits
    b_expr = F.pmod(F.xxhash64("k"), F.lit(N_BUCKETS))
    fat = (spark.range(500, 3000)
           .select(F.col("id").alias("k"),
                   _fat(F.col("id")).alias("payload"),
                   F.col("id").alias("v"))
           .filter(b_expr == 1))
    n_fat = fat.count()
    assert n_fat > 0
    ref2 = upsert_adaptive(spark, store, ref, fat, split_bytes=64 * 1024)
    assert 1 in ref2.split_buckets
    assert read_adaptive(spark, store, ref2).df.count() == 500 + n_fat

    # collapse it back: with a huge merge threshold compaction inlines
    ref3 = compact_adaptive(spark, store, ref2,
                            merge_bytes=1024 * 1024 * 1024)
    assert ref3.split_buckets == []
    assert (table_content_hash(read_adaptive(spark, store, ref3).df)
            == table_content_hash(read_adaptive(spark, store, ref2).df))


def test_manifest_roundtrip_engine_gc_verify(spark, warehouse):
    from messdb_spark.engine import Engine

    eng = Engine(spark, warehouse)
    store = eng.objects
    t = _skewed_table(spark, n=2000)
    ref = write_adaptive(store, t, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=128 * 1024)
    assert ref.split_buckets == [0]
    h = eng.save_adaptive_table("at", ref)
    back = load_adaptive_manifest(store, h)
    assert back == ref
    assert table_content_hash(eng.load_table("at").df) \
        == table_content_hash(t.df)
    # GC closes over the two-level manifest: every leaf survives
    eng.gc(force=True)
    for leaf in ref.leaf_hashes():
        assert store.exists(leaf)
    assert eng.load_table("at").df.count() == 2000
    # scrub understands the adaptive flavor
    assert eng.verify_table("at") is True


def test_empty_and_idempotent_paths(spark, warehouse):
    store = ObjectStore(warehouse)
    t = _skewed_table(spark, n=400)
    ref = write_adaptive(store, t, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=1 << 40)      # never splits
    assert ref.split_buckets == []
    empty = spark.createDataFrame([], "k long, payload string, v long")
    assert upsert_adaptive(spark, store, ref, empty) == ref
    assert compact_adaptive(spark, store, ref) == ref


def test_adaptive_agg_view_refresh_tracks_leaves(spark, warehouse):
    """Leaf-granular view maintenance: a delta into one CHILD of a
    split bucket refreshes only the touched leaves' partials — the
    view's refresh granule splits with the table."""
    from messdb_spark.plans.adaptive import adaptive_agg_view
    from messdb_spark.store import MemoStore

    store = ObjectStore(warehouse)
    memo = MemoStore(warehouse)
    b = F.pmod(F.xxhash64("k"), F.lit(N_BUCKETS))
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("g"),
        F.when(b == 0, _fat(F.col("id"))).otherwise(F.lit("s"))
         .alias("payload"),
        (F.col("id") * 7).alias("v"))
    ref = write_adaptive(store, KeyedTable(df, ("k",)),
                         n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=256 * 1024)
    assert ref.split_buckets == [0]
    aggs = {"n": ("sum", F.count(F.lit(1)).alias("n")),
            "v_sum": ("sum", F.sum("v").alias("v_sum"))}
    v1 = adaptive_agg_view(spark, store, memo, ref, "t_view", ["g"], aggs)
    expect = {r["g"]: (r["n"], r["vs"]) for r in
              df.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                                  F.sum("v").alias("vs")).collect()}
    got = {r["g"]: (r["n"], r["v_sum"]) for r in v1.df.collect()}
    assert got == expect

    # no-op refresh: every leaf partial memo-hits
    m0 = memo.misses
    adaptive_agg_view(spark, store, memo, ref, "t_view", ["g"], aggs) \
        .df.count()
    assert memo.misses == m0

    # delta into ONE child of the split bucket + one flat bucket
    buckets = {r["k"]: r["b"] for r in
               spark.range(200).select(
                   F.col("id").alias("k"),
                   F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)).alias("b"))
               .collect()}
    k_split = next(k for k, bb in buckets.items() if bb == 0)
    k_flat = next(k for k, bb in buckets.items() if bb != 0)
    delta = spark.createDataFrame(
        [(k_split, 3, "UPD", -1), (k_flat, 4, "UPD", -2)],
        "k long, g long, payload string, v long")
    ref2 = upsert_adaptive(spark, store, ref, delta,
                           split_bytes=256 * 1024)
    touched = len(set(ref.leaf_hashes()) - set(ref2.leaf_hashes()))
    m1 = memo.misses
    v2 = adaptive_agg_view(spark, store, memo, ref2, "t_view", ["g"], aggs)
    assert 0 < memo.misses - m1 <= 2          # only the 2 touched leaves
    assert touched == 2
    df2 = (df.filter(~F.col("k").isin(k_split, k_flat))
             .unionByName(delta))
    expect2 = {r["g"]: (r["n"], r["vs"]) for r in
               df2.groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                                    F.sum("v").alias("vs")).collect()}
    got2 = {r["g"]: (r["n"], r["v_sum"]) for r in v2.df.collect()}
    assert got2 == expect2


def test_point_lookup_opens_one_leaf(spark, warehouse):
    """lookup_adaptive reads exactly ONE leaf object — child-granular
    IO on split buckets, bucket-granular on flat ones."""
    from messdb_spark.plans.adaptive import lookup_adaptive

    store = ObjectStore(warehouse)
    t = _skewed_table(spark)
    ref = write_adaptive(store, t, n_buckets=N_BUCKETS, fanout=FANOUT,
                         split_bytes=256 * 1024)
    assert ref.split_buckets == [0]
    buckets = {r["k"]: r["b"] for r in
               spark.range(100).select(
                   F.col("id").alias("k"),
                   F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)).alias("b"))
               .collect()}
    k_split = next(k for k, b in buckets.items() if b == 0)
    k_flat = next(k for k, b in buckets.items() if b != 0)
    for key in (k_split, k_flat):
        loads0 = store.loads
        rows = lookup_adaptive(spark, store, ref, (key,))
        assert store.loads - loads0 == 1
        assert len(rows) == 1 and rows[0]["v"] == key * 7
    # absent key: still one leaf read, empty result
    loads0 = store.loads
    assert lookup_adaptive(spark, store, ref, (999_999,)) == []
    assert store.loads - loads0 <= 1
