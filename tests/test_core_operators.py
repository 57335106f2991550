"""Model-based tests for the core operators, mirroring the reference's
TrieSpec strategy (SURVEY.md §5): random/constructed row sets → our
merge/sort/range vs a pure-Python dict model
(``/root/reference/messdb-base/test/MessDB/Test/TrieSpec.hs:80-94``)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from messdb_spark.operators.core import (KeyBound, KeyedTable, merge_tables,
                                         range_filter, sort_table,
                                         table_from_rows, table_insert,
                                         table_to_rows)
from messdb_spark.registry import FOLD_SUM, FOLD_TO_FIRST, FOLD_TO_LAST, REGISTRY


def kv(spark, rows):
    df = spark.createDataFrame(rows, schema="k string, v string")
    return KeyedTable(df, ("k",))


def rand_rows(rng, n, alphabet="abc"):
    def s():
        return "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 6)))
    return [(s(), s()) for _ in range(n)]


# ---- O1 merge ---------------------------------------------------------

def model_merge_last(tables):
    out = {}
    for rows in tables:
        for k, v in rows:
            out[k] = v
    return sorted(out.items())


def test_merge_fold_last_matches_model(spark):
    rng = random.Random(7)
    for trial in range(3):
        t1, t2, t3 = (rand_rows(rng, n) for n in (40, 25, 10))
        # model folds duplicates *within* one input too (input order);
        # our inputs are keyed tables (unique keys), so pre-dedup inputs
        # last-wins like tableFromRows does.
        def dedup(rows):
            d = {}
            for k, v in rows:
                d[k] = v
            return list(d.items())
        tabs = [kv(spark, dedup(t)) for t in (t1, t2, t3)]
        got = table_to_rows(merge_tables(tabs, FOLD_TO_LAST))
        assert got == model_merge_last([dedup(t) for t in (t1, t2, t3)])


def test_merge_idempotent(spark):
    rng = random.Random(11)
    rows = list({k: v for k, v in rand_rows(rng, 50)}.items())
    t = kv(spark, rows)
    m = merge_tables([t, t, t], FOLD_TO_LAST)
    assert table_to_rows(m) == sorted(rows)


def test_merge_fold_first(spark):
    a = kv(spark, [("x", "1"), ("y", "1")])
    b = kv(spark, [("x", "2"), ("z", "2")])
    got = table_to_rows(merge_tables([a, b], FOLD_TO_FIRST))
    assert got == [("x", "1"), ("y", "1"), ("z", "2")]


def test_merge_multi_value_cols(spark):
    df1 = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "k long, s string, x double")
    df2 = spark.createDataFrame([(2, "B", 20.0), (3, "c", 3.0)], "k long, s string, x double")
    got = table_to_rows(merge_tables([KeyedTable(df1, ("k",)), KeyedTable(df2, ("k",))]))
    assert got == [(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)]


# ---- O2 sort/transform ------------------------------------------------

REGISTRY.transforms.pop("test_rekey_by_v", None)


@REGISTRY.transform("test_rekey_by_v", new_key_cols=("v",))
def _rekey_by_v(df):
    # swap key and value: new key = v, value = k
    return df.select(F.col("v"), F.col("k"), *( [F.col("__messdb_ord")] if "__messdb_ord" in df.columns else []))


def test_sort_transform_fold_matches_model(spark):
    rng = random.Random(13)
    rows = list({k: v for k, v in rand_rows(rng, 80)}.items())
    t = kv(spark, rows)
    got = table_to_rows(sort_table(t, "test_rekey_by_v", FOLD_TO_LAST))
    # model: iterate in old-key order; last occurrence wins per new key
    model = {}
    for k, v in sorted(rows):
        model[v] = k
    assert got == sorted(model.items())


# ---- O3 range filter --------------------------------------------------

def test_range_filter_matches_model(spark):
    rng = random.Random(17)
    rows = list({k: v for k, v in rand_rows(rng, 100, "abcde")}.items())
    t = kv(spark, rows)
    cases = [
        (KeyBound(("b",), True), KeyBound(("d",), False)),
        (KeyBound(None), KeyBound(("c",), True)),
        (KeyBound(("ca",), False), KeyBound(None)),
        (KeyBound(("",), True), KeyBound(("",), True)),
    ]
    for lo, hi in cases:
        got = table_to_rows(range_filter(t, lo, hi))
        def inc(k):
            if lo.value is not None:
                if lo.inclusive and k < lo.value[0]:
                    return False
                if not lo.inclusive and k <= lo.value[0]:
                    return False
            if hi.value is not None:
                if hi.inclusive and k > hi.value[0]:
                    return False
                if not hi.inclusive and k >= hi.value[0]:
                    return False
            return True
        assert got == sorted((k, v) for k, v in rows if inc(k))


def test_range_filter_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y"), (2, "a", "z"), (2, "c", "w"), (3, "a", "q")],
        "k1 long, k2 string, v string")
    t = KeyedTable(df, ("k1", "k2"))
    got = table_to_rows(range_filter(t, KeyBound((1, "b"), True), KeyBound((2, "b"), False)))
    assert got == [(1, "b", "y"), (2, "a", "z")]


# ---- O4/O5/O6 ---------------------------------------------------------

def test_table_from_rows_folds_duplicates_last_wins(spark):
    rows = [("a", "1"), ("b", "2"), ("a", "3"), ("a", "4"), ("c", "5")]
    t = table_from_rows(spark, rows, "k string, v string", ("k",))
    assert table_to_rows(t) == [("a", "4"), ("b", "2"), ("c", "5")]


def test_table_insert_upserts(spark):
    t = kv(spark, [("a", "1"), ("b", "2")])
    t2 = table_insert(t, {"k": "b", "v": "20"})
    t3 = table_insert(t2, {"k": "c", "v": "3"})
    assert table_to_rows(t3) == [("a", "1"), ("b", "20"), ("c", "3")]


def test_fold_sum_merge(spark):
    df1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, x double")
    df2 = spark.createDataFrame([("a", 10.0), ("c", 3.0)], "k string, x double")
    got = table_to_rows(merge_tables([KeyedTable(df1, ("k",)), KeyedTable(df2, ("k",))], FOLD_SUM))
    assert got == [("a", 11.0), ("b", 2.0), ("c", 3.0)]


# ---- skew-safe aggregation -------------------------------------------

def test_salted_agg_matches_plain_agg(spark):
    from messdb_spark.operators.skew import salted_agg
    # heavy skew: 90% of rows share one key
    df = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50))).alias("g"),
        (F.col("id") % 1000).cast("double").alias("v"))
    got = {tuple(r) for r in salted_agg(df, ["g"], {
        "n": ("sum", F.count(F.lit(1))),
        "total": ("sum", F.sum("v")),
        "mx": ("max", F.max("v")),
        "mn": ("min", F.min("v")),
    }, n_salts=8).collect()}
    expect = {tuple(r) for r in df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
        F.max("v").alias("mx"), F.min("v").alias("mn")).collect()}
    assert got == expect


def test_interval_join_matches_naive_model(spark):
    """Model check (TrieSpec oracle style): bucketed interval join ==
    naive nested-loop filter, including boundary inclusivity (lo in,
    hi out), empty intervals dropped, intervals longer than the bucket
    width, and duplicate emission (each pair exactly once)."""
    import itertools

    from messdb_spark.operators.range_join import interval_join

    points = [(p, i) for i, p in enumerate([0, 1, 9, 10, 11, 25, 99, 100, -5, -10])]
    ivals = [(0, 10, 0), (10, 10, 1), (5, 40, 2), (-7, 3, 3), (95, 101, 4)]
    pdf = spark.createDataFrame(points, "p long, pid long")
    idf = spark.createDataFrame(ivals, "lo long, hi long, iid long")
    for width in (3, 10, 64):
        got = sorted((r.pid, r.iid) for r in
                     interval_join(pdf, idf, point_col="p", lo_col="lo",
                                   hi_col="hi", bucket_width=width).collect())
        want = sorted((pid, iid) for (p, pid), (lo, hi, iid)
                      in itertools.product(points, ivals) if lo <= p < hi)
        assert got == want, f"width={width}"


def test_kmeans_matches_numpy_model(spark):
    """Fixed-point integer Lloyd k-means vs an int64 numpy model with
    identical init (first-k), schedule, tie-break (first minimum), and
    centroid rounding (floor(double(s)/n + 0.5)): assignments AND
    centroids must agree EXACTLY — the determinism that buys the query
    its full cross-engine hash oracle."""
    import math

    import numpy as np

    from messdb_spark.queries.similarity import _KM_SCALE, kmeans_fit

    rng = np.random.RandomState(7)
    k, iters, n, d = 4, 3, 300, 8
    centers = rng.randn(k, d) * 5
    pts = np.vstack([centers[i % k] + rng.randn(d) for i in range(n)])

    vecs = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, v array<double>")
    cents, assigned = kmeans_fit(vecs, k=k, iters=iters)
    got = {r["vec_id"]: r["cl"] for r in assigned.collect()}

    # integer numpy model, same init / schedule / rounding
    P = np.floor(pts * _KM_SCALE + 0.5).astype(np.int64)
    C = P[:k].copy()
    for _ in range(iters):
        diff = P[:, None, :] - C[None, :, :]
        dist = (diff * diff).sum(axis=2)
        lab = dist.argmin(axis=1)     # argmin = FIRST min, same tie-break
        for ci in range(k):
            if (lab == ci).any():
                s = P[lab == ci].sum(axis=0)
                cnt = int((lab == ci).sum())
                C[ci] = np.array([math.floor(float(sv) / cnt + 0.5)
                                  for sv in s], dtype=np.int64)
    assert got == {i: int(lab[i]) for i in range(n)}
    assert [list(map(int, row)) for row in C] == \
        [list(map(int, c)) for c in cents]


def test_check_table_invariants(spark):
    """O10 checkTrie analog: valid tables pass; duplicate or null keys
    fail; operators preserve validity."""
    from messdb_spark.operators.core import (KeyedTable, check_table,
                                             merge_tables, sort_table)

    good = KeyedTable(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"), ("k",))
    assert check_table(good)

    dup = KeyedTable(spark.createDataFrame(
        [(1, "a"), (1, "b")], "k long, v string"), ("k",))
    assert not check_table(dup)

    withnull = KeyedTable(spark.createDataFrame(
        [(None, "a"), (2, "b")], "k long, v string"), ("k",))
    assert not check_table(withnull)

    missing = KeyedTable(spark.createDataFrame(
        [(1, "a")], "k long, v string"), ("nope",))
    assert not check_table(missing)

    # composite keys: (1, 'x') vs (1, 'y') are distinct
    comp = KeyedTable(spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "a long, b string, v double"),
        ("a", "b"))
    assert check_table(comp)

    # merge of two valid overlapping tables stays valid (fold collapses
    # cross-input collisions; note merge assumes VALID inputs — the
    # reference's merge operates on tries, which are maps by
    # construction, so an input with duplicate keys is out of contract)
    other = KeyedTable(spark.createDataFrame(
        [(2, "B"), (3, "c")], "k long, v string"), ("k",))
    merged = merge_tables([good, other])
    assert check_table(merged)


def test_merge_schema_evolution_adds_column(spark):
    """Schema-evolving upsert: the delta carries a new value column;
    base rows get typed nulls for it, colliding keys take the delta
    row whole (last-wins), old columns survive. Works on both merge
    strategies."""
    from messdb_spark.operators.core import KeyedTable, merge_tables
    from messdb_spark.registry import FOLD_TO_FIRST

    base = KeyedTable(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"), ("k",))
    delta = KeyedTable(spark.createDataFrame(
        [(2, "B", 9.5), (3, "c", 1.5)], "k long, v string, score double"),
        ("k",))

    out = merge_tables([base, delta], allow_schema_evolution=True)
    assert out.df.columns == ["k", "v", "score"]
    got = {tuple(r) for r in out.df.collect()}
    assert got == {(1, "a", None), (2, "B", 9.5), (3, "c", 1.5)}

    # agg path (fold_to_first keeps base rows on collision)
    out2 = merge_tables([base, delta], FOLD_TO_FIRST,
                        allow_schema_evolution=True)
    got2 = {tuple(r) for r in out2.df.collect()}
    assert got2 == {(1, "a", None), (2, "b", None), (3, "c", 1.5)}

    # without the flag, mismatched schemas still follow the base schema
    out3 = merge_tables([base, KeyedTable(delta.df, ("k",))])
    assert out3.df.columns == ["k", "v"]


def test_countmin_bounds_vs_exact(spark):
    """Count-min property: estimate >= exact for every token, and the
    top-20 estimates stay within the eps*N additive bound (w=1024,
    d=4 => overwhelming probability on this vocab)."""
    from messdb_spark.queries import QUERIES
    from messdb_spark.queries.text import _TOKENS
    from messdb_spark.session import read_table
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.001"
    doc = read_table(spark, sf_dir, "documents")
    tokens = (doc.filter(F.length("text") > 0)
                 .select(F.explode(F.expr(_TOKENS)).alias("token")))
    exact = {r["token"]: r["n"] for r in
             tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    n_total = sum(exact.values())
    est = {r["token"]: r["est_count"] for r in
           QUERIES["countmin_heavy_hitters"].fn(spark, sf_dir).collect()}
    eps_bound = (2.0 / 1024) * n_total   # e/w additive error, generous
    for tok, e_cnt in est.items():
        assert e_cnt >= exact[tok], tok            # never underestimates
        assert e_cnt <= exact[tok] + eps_bound, tok
    # the true top token must appear in the sketch top-20
    true_top = max(exact, key=lambda t: (exact[t], t))
    assert true_top in est


def test_sketch_inbody_bounds_fire_on_bad_estimates(spark):
    """The rows-only sketch queries self-check in-body: the bound
    helpers must (a) pass on the real sf0.001 run and (b) raise on a
    perturbed estimate — so a bad sketch fails the driver run itself,
    not just CI."""
    import pytest as _pytest

    from messdb_spark.queries import QUERIES
    from messdb_spark.queries.approx import (check_hll_bounds,
                                             check_quantile_bounds)

    sf_dir = "/root/testdata/sf0.001"
    # real runs pass their own in-body assertions
    assert QUERIES["approx_distinct_users_hll"].fn(spark, sf_dir).count() > 0
    assert QUERIES["approx_price_quantiles"].fn(spark, sf_dir).count() > 0

    # perturbed estimates fire
    check_hll_bounds([("t/users", 105, 100)], rel_tol=0.10)
    with _pytest.raises(AssertionError, match="out of bounds"):
        check_hll_bounds([("t/users", 120, 100)], rel_tol=0.10)
    with _pytest.raises(AssertionError, match="out of bounds"):
        check_hll_bounds([("t/users", 3, 0)], rel_tol=0.10)
    check_quantile_bounds([("SEG", 0.5, 10.0, 9.0, 11.0)])
    with _pytest.raises(AssertionError, match="out of bounds"):
        check_quantile_bounds([("SEG", 0.5, 11.5, 9.0, 11.0)])


def test_salted_join_matches_plain_join(spark):
    from messdb_spark.operators.skew import salted_join
    import pytest
    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(
            (F.col("id") % 50)).alias("k"),          # 90% on one key
        F.col("id").alias("rid"))
    small = spark.range(60).select(F.col("id").alias("k"),
                                   F.concat(F.lit("d"), F.col("id")).alias("d"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for how in ("inner", "left"):
            got = {tuple(r) for r in
                   salted_join(big, small, ["k"], n_salts=8, how=how).collect()}
            expect = {tuple(r) for r in
                      big.join(small, on=["k"], how=how).collect()}
            assert got == expect, how
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, ["k"], how="full")


def test_salted_join_duplicate_small_keys(spark):
    """A small side with duplicate join keys must fan out exactly as
    the plain join does (replication is per salt, not per row)."""
    from messdb_spark.operators.skew import salted_join
    big = spark.range(1000).select((F.col("id") % 3).alias("k"),
                                   F.col("id").alias("rid"))
    small = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], ["k", "d"])
    got = sorted(tuple(r) for r in
                 salted_join(big, small, ["k"], n_salts=4).collect())
    expect = sorted(tuple(r) for r in big.join(small, on=["k"]).collect())
    assert got == expect


# ---- apply_cdc (MERGE with delete tombstones) -------------------------

def model_cdc(base_rows, ops):
    """Pure-dict model: ops sorted by ordinal; upsert sets, delete
    removes (absent-key delete is a no-op)."""
    state = dict(base_rows)
    for _ord, k, op, v in sorted(ops):
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = v
    return sorted(state.items())


def cdc_df(spark, ops):
    return spark.createDataFrame(
        [(k, op, v, o) for o, k, op, v in ops],
        schema="k string, op string, v string, ord long")


def test_apply_cdc_matches_model(spark):
    from messdb_spark.operators.core import apply_cdc
    rng = random.Random(11)
    keys = [f"k{i}" for i in range(12)]
    base_rows = {k: f"b_{k}" for k in keys[:8]}
    base = kv(spark, sorted(base_rows.items()))
    ops = [(o, rng.choice(keys),
            rng.choice(["upsert", "upsert", "delete"]), f"v{o}")
           for o in range(60)]
    got = apply_cdc(base, cdc_df(spark, ops), op_col="op", ord_col="ord")
    assert sorted(table_to_rows(got)) == model_cdc(base_rows.items(), ops)


def test_apply_cdc_semantics(spark):
    from messdb_spark.operators.core import apply_cdc
    base = kv(spark, [("a", "1"), ("b", "2")])
    ops = [
        (1, "a", "delete", None),      # delete existing
        (2, "c", "upsert", "3"),       # insert new
        (3, "z", "delete", None),      # delete absent: silent no-op
        (4, "b", "delete", None),
        (5, "b", "upsert", "9"),       # re-insert after delete: later wins
    ]
    got = apply_cdc(base, cdc_df(spark, ops), op_col="op", ord_col="ord")
    assert sorted(table_to_rows(got)) == [("b", "9"), ("c", "3")]


def test_apply_cdc_batch_composition(spark):
    """apply(apply(base, ops[:n]), ops[n:]) == apply(base, ops) when the
    split respects ordinal order — the property cdc_apply_tombstones
    relies on."""
    from messdb_spark.operators.core import apply_cdc
    rng = random.Random(23)
    keys = [f"k{i}" for i in range(6)]
    base = kv(spark, [(k, "b") for k in keys[:3]])
    ops = [(o, rng.choice(keys),
            rng.choice(["upsert", "delete"]), f"v{o}") for o in range(30)]
    df_all = cdc_df(spark, ops)
    one_shot = apply_cdc(base, df_all, op_col="op", ord_col="ord")
    half = apply_cdc(base, cdc_df(spark, ops[:15]), op_col="op", ord_col="ord")
    chained = apply_cdc(half, cdc_df(spark, ops[15:]), op_col="op", ord_col="ord")
    assert sorted(table_to_rows(chained)) == sorted(table_to_rows(one_shot))
