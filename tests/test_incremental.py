"""Bucket-level incremental upsert: the untouched-subtree passthrough
property (``Trie.hs:346-348``) at bucket granularity — correctness vs
full recompute, object reuse, structural sharing, bucket pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from messdb_spark.operators.core import KeyedTable
from messdb_spark.plans.incremental import (EMPTY, incremental_upsert,
                                            read_bucketed, write_bucketed)
from messdb_spark.store import ObjectStore


def _base(spark, n=5000):
    return KeyedTable(
        spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
            (F.col("id") % 97).cast("double").alias("x")),
        ("k",))


def test_incremental_upsert_matches_full_recompute(spark, warehouse):
    store = ObjectStore(warehouse)
    t = _base(spark)
    ref = write_bucketed(store, t, n_buckets=16)
    assert len([h for h in ref.bucket_hashes if h != EMPTY]) == 16

    # delta: 40 updates clustered on few keys + 10 inserts
    delta = spark.range(4960, 5010).select(
        F.col("id").alias("k"),
        F.lit("UPDATED").alias("v"),
        F.lit(-1.0).alias("x"))
    saves_before = store.saves
    ref2 = incremental_upsert(spark, store, ref, delta)

    # correctness vs full recompute
    got = {(r["k"], r["v"], r["x"]) for r in read_bucketed(spark, store, ref2).df.collect()}
    expect = {(i, f"v{i}", float(i % 97)) for i in range(4960)}
    expect |= {(i, "UPDATED", -1.0) for i in range(4960, 5010)}
    assert got == expect

    # passthrough: only the delta's buckets were rewritten
    touched = {i for i, (a, b) in enumerate(zip(ref.bucket_hashes, ref2.bucket_hashes))
               if a != b}
    n_delta_buckets = delta.select(
        F.pmod(F.xxhash64("k"), F.lit(16)).alias("b")).distinct().count()
    assert len(touched) == n_delta_buckets
    assert store.saves - saves_before == len(touched)
    # untouched buckets share objects between versions (structural sharing)
    assert any(a == b != EMPTY for a, b in zip(ref.bucket_hashes, ref2.bucket_hashes)) \
        or n_delta_buckets == 16

    # identity: same content ⇒ same manifest hash
    ref3 = incremental_upsert(spark, store, ref, delta)
    assert ref3.table_hash == ref2.table_hash


def test_incremental_upsert_deletes(spark, warehouse):
    """r11: the ``deletes`` churn path — removed keys leave their
    buckets, only touched buckets rewrite, untouched buckets pass
    through by reference, and combined upsert+delete in one call is
    consistent with a full recompute."""
    store = ObjectStore(warehouse)
    t = _base(spark)
    ref = write_bucketed(store, t, n_buckets=16)

    dels = spark.createDataFrame([(10,), (11,), (4999,)], "k bigint")
    ups = spark.createDataFrame([(11, "RESURRECTED", -2.0),
                                 (6000, "NEW", -3.0)],
                                "k bigint, v string, x double")
    # upsert wins over a simultaneous delete of the same key (the
    # delta's row is the latest state; deletes target rows that are
    # GONE from the new snapshot, and diff_tables never emits both)
    ref2 = incremental_upsert(spark, store, ref, ups, deletes=dels)
    got = {(r["k"], r["v"]) for r in
           read_bucketed(spark, store, ref2).df.collect()}
    expect = {(i, f"v{i}") for i in range(5000) if i not in (10, 11, 4999)}
    expect |= {(11, "RESURRECTED"), (6000, "NEW")}
    assert got == expect

    # passthrough: only the buckets of {10, 11, 4999, 6000} rewrote
    touched = {i for i, (a, b) in
               enumerate(zip(ref.bucket_hashes, ref2.bucket_hashes))
               if a != b}
    want_buckets = {r["b"] for r in spark.createDataFrame(
        [(10,), (11,), (4999,), (6000,)], "k bigint")
        .select(F.pmod(F.xxhash64("k"), F.lit(16)).alias("b")).collect()}
    assert touched <= want_buckets
    # delete-only call: no upsert rows at all
    ref3 = incremental_upsert(
        spark, store, ref2,
        spark.createDataFrame([], "k bigint, v string, x double"),
        deletes=spark.createDataFrame([(6000,)], "k bigint"))
    got3 = {r["k"] for r in read_bucketed(spark, store, ref3).df.collect()}
    assert 6000 not in got3 and len(got3) == len(expect) - 1
    # deleting an absent key is a no-op manifest-wise (CAS dedups the
    # identical rewritten bucket back to the same hash)
    ref4 = incremental_upsert(
        spark, store, ref3,
        spark.createDataFrame([], "k bigint, v string, x double"),
        deletes=spark.createDataFrame([(424242,)], "k bigint"))
    assert ref4.table_hash == ref3.table_hash


def test_noop_upsert_reuses_everything(spark, warehouse):
    """Re-upserting identical rows produces identical bucket content →
    content addresses dedup in the store (write-once)."""
    store = ObjectStore(warehouse)
    t = _base(spark, 500)
    ref = write_bucketed(store, t, n_buckets=8)
    same = t.df.filter(F.col("k") < 50)
    saves_before = store.saves
    ref2 = incremental_upsert(spark, store, ref, same)
    assert ref2.table_hash == ref.table_hash       # content unchanged
    assert store.saves == saves_before             # all skipped as dup content


def test_bucket_pruned_point_lookup(spark, warehouse):
    """A key's bucket is computable → point read opens one object."""
    store = ObjectStore(warehouse)
    t = _base(spark, 1000)
    ref = write_bucketed(store, t, n_buckets=16)
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(123).cast("long")), F.lit(16)).alias("b")
    ).collect()[0]["b"]
    loads_before = store.loads
    sub = read_bucketed(spark, store, ref, buckets=[int(b)])
    rows = sub.df.filter(F.col("k") == 123).collect()
    assert [r["v"] for r in rows] == ["v123"]
    assert store.loads - loads_before == 1


def test_incremental_view_refresh_recomputes_only_changed_buckets(spark, warehouse):
    """The headline property: after a delta upsert, re-materializing a
    view recomputes only the buckets whose input hash changed — the
    reference's incremental materialized views without change tracking
    (``Trie.hs:280-295`` per-node memoize at bucket granularity)."""
    from messdb_spark.plans.incremental import incremental_map_view
    from messdb_spark.registry import REGISTRY
    from messdb_spark.store import MemoStore

    REGISTRY.transforms.pop("enrich_keep_key", None)

    @REGISTRY.transform("enrich_keep_key", new_key_cols=("k",))
    def _enrich(df):
        return df.select("k", F.upper("v").alias("v"),
                         (F.col("x") * 2).alias("x2"),
                         *(["__messdb_ord"] if "__messdb_ord" in df.columns else []))

    store = ObjectStore(warehouse)
    memo = MemoStore(warehouse)
    base = _base(spark, 3000)
    ref = write_bucketed(store, base, n_buckets=16)

    view1 = incremental_map_view(spark, store, memo, ref, "enrich_keep_key")
    assert read_bucketed(spark, store, view1).df.count() == 3000
    row = read_bucketed(spark, store, view1).df.filter(F.col("k") == 7).collect()[0]
    assert row["v"] == "V7" and row["x2"] == 14.0

    # identical refresh: all buckets memo-hit, nothing computed/written
    saves_before, misses_before = store.saves, memo.misses
    view1b = incremental_map_view(spark, store, memo, ref, "enrich_keep_key")
    assert view1b.table_hash == view1.table_hash
    assert store.saves == saves_before

    # delta upsert → refresh: only changed buckets recompute
    delta = spark.range(5).select(F.col("id").alias("k"),
                                  F.lit("new").alias("v"),
                                  F.lit(0.5).alias("x"))
    ref2 = incremental_upsert(spark, store, ref, delta)
    changed = {b for b, (a, c) in
               enumerate(zip(ref.bucket_hashes, ref2.bucket_hashes)) if a != c}
    saves_before = store.saves
    view2 = incremental_map_view(spark, store, memo, ref2, "enrich_keep_key")
    assert store.saves - saves_before == len(changed)   # only changed buckets written
    reused = sum(1 for b in range(16)
                 if view2.bucket_hashes[b] == view1.bucket_hashes[b])
    assert reused == 16 - len(changed)                  # the rest reused by reference
    got = read_bucketed(spark, store, view2).df.filter(F.col("k") < 5).collect()
    assert all(r["v"] == "NEW" and r["x2"] == 1.0 for r in got)


def test_incremental_agg_view_recomputes_only_changed_buckets(spark, tmp_path):
    """Aggregation view over a bucketed table: after a 2-row delta,
    refresh recomputes partials only for the touched buckets (memo hits
    for the rest) and the combined result equals a plain groupBy."""
    from messdb_spark.plans.incremental import incremental_agg_view
    from messdb_spark.store import MemoStore, ObjectStore

    store = ObjectStore(str(tmp_path / "wh"))
    memo = MemoStore(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(3000)], "k long, g long, x double")
    base = KeyedTable(df, ("k",))
    ref = write_bucketed(store, base, n_buckets=16)

    aggs = {"n": ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("x")),
            "mx": ("max", F.max("x"))}
    v1 = incremental_agg_view(spark, store, memo, ref, "agg_v1",
                              ["g"], aggs)
    expect = {(r["g"], r["n"], r["total"], r["mx"])
              for r in df.groupBy("g").agg(
                  F.count(F.lit(1)).alias("n"), F.sum("x").alias("total"),
                  F.max("x").alias("mx")).collect()}
    assert {tuple(r) for r in v1.df.collect()} == expect

    # delta touches a couple of buckets
    delta = spark.createDataFrame([(7, 7 % 7, 1000.0), (9999, 3, 2000.0)],
                                  "k long, g long, x double")
    ref2 = incremental_upsert(spark, store, ref, delta)
    touched = sum(1 for a, b in zip(ref.bucket_hashes, ref2.bucket_hashes)
                  if a != b)
    assert 1 <= touched <= 2

    hits_before, misses_before = memo.hits, memo.misses
    v2 = incremental_agg_view(spark, store, memo, ref2, "agg_v1",
                              ["g"], aggs)
    # unchanged buckets hit the memo; only touched buckets recompute
    assert memo.hits - hits_before >= 16 - touched - 1
    assert memo.misses - misses_before <= touched

    full = df.filter(F.col("k") != 7).unionByName(delta) \
             .groupBy("g").agg(F.count(F.lit(1)).alias("n"),
                               F.sum("x").alias("total"),
                               F.max("x").alias("mx"))
    assert {tuple(r) for r in v2.df.collect()} == \
        {tuple(r) for r in full.collect()}


def test_diff_bucketed_prunes_unchanged_buckets(spark, tmp_path):
    """Version diff over bucket manifests reads ONLY buckets whose
    content hash differs (Trie.hs:346-348 in reverse); equal manifests
    diff with zero bucket loads."""
    from messdb_spark.operators.core import KeyedTable
    from messdb_spark.plans.incremental import (diff_bucketed,
                                                incremental_upsert,
                                                write_bucketed)
    from messdb_spark.store import ObjectStore

    store = ObjectStore(str(tmp_path / "objs"))
    base = spark.createDataFrame([(i, f"v{i}") for i in range(200)],
                                 "k int, v string")
    ref1 = write_bucketed(store, KeyedTable(base, ("k",)), n_buckets=16)
    delta = spark.createDataFrame(
        [(3, "changed"), (1000, "added")], "k int, v string")
    ref2 = incremental_upsert(spark, store, ref1, delta)

    n_changed = sum(1 for a, b in zip(ref1.bucket_hashes, ref2.bucket_hashes)
                    if a != b)
    assert 1 <= n_changed <= 2   # the two delta keys touch <= 2 buckets

    store.loads = 0
    d = diff_bucketed(spark, store, ref1, ref2)
    rows = {(r["k"], r["change"]): (r["old_v"], r["new_v"])
            for r in d.collect()}
    assert rows == {(3, "changed"): ("v3", "changed"),
                    (1000, "added"): (None, "added")}
    # only the changed buckets were opened (both versions of each)
    assert store.loads == 2 * n_changed

    # identical manifests: provably-empty diff, zero loads
    store.loads = 0
    assert diff_bucketed(spark, store, ref2, ref2).count() == 0
    assert store.loads == 0


def test_diff_tables_full(spark):
    from messdb_spark.operators.core import KeyedTable, diff_tables

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)], "k int, v string, n int")
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k int, v string, n int")
    d = diff_tables(KeyedTable(old, ("k",)), KeyedTable(new, ("k",)))
    got = {r["k"]: (r["change"], r["old_v"], r["new_v"]) for r in d.collect()}
    # row 1 unchanged (dropped); null-safe compare keeps row 3 'removed'
    assert got == {2: ("changed", "b", "B"),
                   3: ("removed", None, None),
                   4: ("added", None, "d")}


def test_incremental_sort_view_recomputes_only_changed_partials(spark, warehouse):
    """RE-KEYED (O2 sortTable) view over a bucketed table: a 1-bucket
    delta recomputes exactly ONE per-source-bucket partial (memo hits
    for the rest), and the combined result matches a from-scratch
    sort_table — including last-wins fold precedence across buckets."""
    from messdb_spark.operators.core import sort_table
    from messdb_spark.plans.incremental import incremental_sort_view
    from messdb_spark.registry import REGISTRY
    from messdb_spark.store import MemoStore

    REGISTRY.transforms.pop("rekey_by_group", None)

    @REGISTRY.transform("rekey_by_group", new_key_cols=("g",))
    def _rekey(df):
        # new key g collides 100:1 — the fold has real work to do
        return df.select((F.col("k") % 30).alias("g"), "v", "x",
                         *(["__messdb_ord"]
                           if "__messdb_ord" in df.columns else []))

    store = ObjectStore(warehouse)
    memo = MemoStore(warehouse)
    base = _base(spark, 3000)
    ref = write_bucketed(store, base, n_buckets=16)

    view1 = incremental_sort_view(spark, store, memo, ref, "rekey_by_group")
    expect = {tuple(r) for r in
              sort_table(base, "rekey_by_group").df.collect()}
    assert {tuple(r) for r in view1.df.collect()} == expect
    assert view1.key_cols == ("g",)

    # identical refresh: every partial memo-hits, nothing written
    saves_before = store.saves
    view1b = incremental_sort_view(spark, store, memo, ref, "rekey_by_group")
    assert store.saves == saves_before
    assert {tuple(r) for r in view1b.df.collect()} == expect

    # single-key delta on the WINNING key of group 7 (2977 is the max
    # k ≡ 7 mod 30) → exactly one source bucket changes → exactly one
    # partial recomputes and is written; result matches full recompute
    from messdb_spark.plans.incremental import incremental_upsert
    delta = spark.createDataFrame([(2977, "OVERRIDE", 123.0)],
                                  "k long, v string, x double")
    ref2 = incremental_upsert(spark, store, ref, delta)
    changed = [b for b, (a, c) in
               enumerate(zip(ref.bucket_hashes, ref2.bucket_hashes)) if a != c]
    assert len(changed) == 1
    saves_before, skips_before = store.saves, store.save_skips
    view2 = incremental_sort_view(spark, store, memo, ref2, "rekey_by_group")
    # ONE partial recomputed (written fresh or content-deduped), the
    # other 15 were memo hits that wrote nothing
    assert (store.saves - saves_before) \
        + (store.save_skips - skips_before) == 1
    assert store.saves - saves_before == 1      # winner changed ⇒ new bytes
    base2 = read_bucketed(spark, store, ref2)
    expect2 = {tuple(r) for r in
               sort_table(base2, "rekey_by_group").df.collect()}
    assert {tuple(r) for r in view2.df.collect()} == expect2
    # last-wins across buckets: group 7's winner is the overridden row
    g7 = {r["g"]: r["v"] for r in view2.df.collect()}[7]
    assert g7 == "OVERRIDE"
    # fold_sum variant recombines partials by addition
    sum_view = incremental_sort_view(spark, store, memo, ref2,
                                     "rekey_by_group", fold_key="fold_sum")
    got_x = {r["g"]: r["x"] for r in
             sum_view.df.select("g", "x").collect()}
    exp_x = {r["g"]: r["x"] for r in
             base2.df.select((F.col("k") % 30).alias("g"), "x")
                     .groupBy("g").agg(F.sum("x").alias("x")).collect()}
    assert got_x == exp_x


def test_incremental_join_view_recomputes_only_changed_pairs(spark, warehouse):
    """Binary-view maintenance: output buckets memoize by input bucket
    PAIR; a delta to one side refreshes only pair-changed buckets, a
    no-op refresh recomputes nothing, and the result always equals the
    plain join."""
    from messdb_spark.store import MemoStore
    from messdb_spark.plans.incremental import incremental_join_view

    store = ObjectStore(warehouse)
    memo = MemoStore(warehouse)
    a = KeyedTable(
        spark.range(2000).select(F.col("id").alias("k"),
                                 (F.col("id") * 3).alias("va")),
        ("k",))
    # b covers only even keys → inner join halves
    b = KeyedTable(
        spark.range(0, 2000, 2).select(F.col("id").alias("k"),
                                       (F.col("id") + 7).alias("vb")),
        ("k",))
    ref_a = write_bucketed(store, a, n_buckets=16)
    ref_b = write_bucketed(store, b, n_buckets=16)
    v1 = incremental_join_view(spark, store, memo, ref_a, ref_b, "ab")
    got = {(r.k, r.va, r.vb) for r in
           read_bucketed(spark, store, v1).df.collect()}
    assert got == {(i, i * 3, i + 7) for i in range(0, 2000, 2)}

    # no-op refresh: all pairs memo-hit
    m0 = memo.misses
    v1b = incremental_join_view(spark, store, memo, ref_a, ref_b, "ab")
    assert memo.misses == m0 and v1b.table_hash == v1.table_hash

    # delta on one side refreshes only pair-changed buckets
    delta = spark.createDataFrame([(10, 999), (11, 999)], "k long, va long")
    ref_a2 = incremental_upsert(spark, store, ref_a, delta)
    changed = sum(1 for x, y in zip(ref_a.bucket_hashes,
                                    ref_a2.bucket_hashes) if x != y)
    m1 = memo.misses
    v2 = incremental_join_view(spark, store, memo, ref_a2, ref_b, "ab")
    assert 0 < memo.misses - m1 <= changed
    got2 = {(r.k, r.va, r.vb) for r in
            read_bucketed(spark, store, v2).df.collect()}
    expect2 = {(i, i * 3, i + 7) for i in range(0, 2000, 2) if i != 10}
    expect2.add((10, 999, 17))          # updated even key survives join
    assert got2 == expect2              # odd key 11 never joins

    # key/bucket-shape mismatches rejected
    import pytest
    ref_c = write_bucketed(store, b, n_buckets=8)
    with pytest.raises(ValueError, match="bucket-count"):
        incremental_join_view(spark, store, memo, ref_a, ref_c, "ab")
    bad = KeyedTable(b.df.withColumnRenamed("k", "kk"), ("kk",))
    ref_d = write_bucketed(store, bad, n_buckets=16)
    with pytest.raises(ValueError, match="key mismatch"):
        incremental_join_view(spark, store, memo, ref_a, ref_d, "ab")


def test_incremental_ivf_refresh_counters(spark):
    """IVF maintenance under churn (VERDICT r7 #7): the query body
    carries the counter assertions (refreshed cells ≤ touched cells,
    untouched cells keep their v1 hashes, refreshed manifest hash-equal
    to a full rebuild, probe IO = probed cells) and raises on any
    violation — running it IS the counter check. Here we additionally
    pin the output contract."""
    from messdb_spark.queries import QUERIES
    from messdb_spark.queries.similarity import _N_QUERIES, _TOP_K

    df = QUERIES["incremental_ivf_refresh"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows, "probe returned no candidates"
    per_q = {}
    for r in rows:
        assert 1 <= r["rk"] <= _TOP_K
        assert r["cand_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rk"])
    assert set(per_q) <= set(range(_N_QUERIES))
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), f"rank gap for {q}"


def test_seed_map_view_memo_both_backends(tmp_path):
    """Memo rehydration from a (source, view) manifest pair writes
    exactly the absent records — same digests incremental_map_view
    reads — in ONE batched write, on both memo backends; existing
    records are left untouched (advisory-memo contract)."""
    from messdb_spark.plans.incremental import (EMPTY, BucketedRef,
                                                _map_bucket_digest,
                                                seed_map_view_memo)
    from messdb_spark.sqlite_store import SqliteMemoStore
    from messdb_spark.store import MemoStore

    from messdb_spark.registry import REGISTRY

    src = BucketedRef(("k",), 4, ("in0", EMPTY, "in2", "in3"), "{}")
    view = BucketedRef(("k",), 4, ("out0", EMPTY, EMPTY, "out3"), "{}")

    # r12: seeding sanity-checks the transform against the registry
    # (mispaired-manifest rejection, ADVICE r11) — register the named
    # transform the manifests claim, as every production caller has
    if "f" not in REGISTRY.transforms:
        REGISTRY.transform("f", new_key_cols=("k",))(lambda df: df)

    for cls, sub in ((MemoStore, "j"), (SqliteMemoStore, "s")):
        wh = str(tmp_path / sub)
        import os
        os.makedirs(wh, exist_ok=True)
        memo = cls(wh)
        # pre-existing record must survive (advisory: maybe newer)
        memo.put(_map_bucket_digest("f", "in0"), "already")
        n = seed_map_view_memo(memo, src, view, "f")
        assert n == 2                       # in2 (EMPTY output!), in3
        assert memo.get(_map_bucket_digest("f", "in0")) == "already"
        assert memo.get(_map_bucket_digest("f", "in2")) == EMPTY
        assert memo.get(_map_bucket_digest("f", "in3")) == "out3"
        # idempotent: a second seed writes nothing
        assert seed_map_view_memo(memo, src, view, "f") == 0
        # a fresh handle sees the records (they hit disk, not a cache)
        memo2 = cls(wh)
        assert memo2.get(_map_bucket_digest("f", "in3")) == "out3"
        # transform-key isolation: k=12 state can never serve k=8
        assert memo.get(_map_bucket_digest("g", "in3")) is None

    import pytest
    with pytest.raises(ValueError, match="n_buckets"):
        seed_map_view_memo(MemoStore(str(tmp_path / "j")), src,
                           BucketedRef(("k",), 8, ("x",) * 8, "{}"), "f")
    # r12 mispairing rejections (ADVICE r11): a view manifest with
    # different key columns, or a transform whose registered output
    # keys don't match the view's, must be refused before any memo
    # write — a poisoned record would be silently reused downstream
    with pytest.raises(ValueError, match="key_cols"):
        seed_map_view_memo(MemoStore(str(tmp_path / "j")), src,
                           BucketedRef(("q",), 4, ("x",) * 4, "{}"), "f")
    if "f_rekey" not in REGISTRY.transforms:
        REGISTRY.transform("f_rekey", new_key_cols=("other",))(lambda df: df)
    with pytest.raises(ValueError, match="produces keys"):
        seed_map_view_memo(MemoStore(str(tmp_path / "j")), src, view,
                           "f_rekey")
    with pytest.raises(ValueError, match="unknown transform"):
        seed_map_view_memo(MemoStore(str(tmp_path / "j")), src, view,
                           "never_registered_anywhere")
