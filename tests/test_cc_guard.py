"""Round-11 guards on the connected-components building block
(`cc_labels_from_edges` is public via the ``dedup-near`` verb):
bounded rounds with a loud failure, and the session-scoped label cache
keyed by applicationId instead of the recyclable id(spark)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _path_edges(spark, n: int):
    """Bidirectional path graph 1-2-...-n — diameter n-1, the
    adversarial shape for label propagation."""
    star = spark.createDataFrame([(i, i + 1) for i in range(1, n)],
                                 "src bigint, dst bigint")
    return (star.union(star.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
                .repartition(F.col("dst")).persist())


def test_cc_path_graph_converges_near_ceiling(spark):
    """256-node path: distance-to-min grows d' = 2d + 2 per round
    (neighbor-min + pointer jump), so convergence needs ~9 rounds —
    correct labels with a ceiling just above that."""
    from messdb_spark.queries.graph import cc_labels_from_edges

    n = 256
    edges = _path_edges(spark, n)
    labels = cc_labels_from_edges(edges, max_rounds=12)
    got = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert set(got) == set(range(1, n + 1))
    assert set(got.values()) == {1}
    edges.unpersist()


def test_cc_too_small_ceiling_fails_loud(spark):
    """A ceiling the graph cannot converge under must raise (naming
    the large-star/small-star alternative), never return wrong labels
    or spin unbounded."""
    from messdb_spark.queries.graph import cc_labels_from_edges

    edges = _path_edges(spark, 256)
    with pytest.raises(RuntimeError, match="large-star/small-star"):
        cc_labels_from_edges(edges, max_rounds=2)
    edges.unpersist()


def test_cc_string_key_path_converges_with_full_action_probe(spark):
    """The non-numeric convergence path (changed-rows probe, now a
    FULL action per ADVICE r10) on a deep path graph: correct labels,
    lineage truncation exercised across many rounds."""
    from messdb_spark.queries.graph import cc_labels_from_edges

    n = 64
    star = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(1, n)],
        "src string, dst string")
    edges = (star.union(star.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(F.col("dst")).persist())
    labels = cc_labels_from_edges(edges, numeric_key=False, max_rounds=12)
    got = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert set(got.values()) == {"n001"}
    assert len(got) == n
    edges.unpersist()


# -- large-star/small-star: the adversarial-graph alternative ----------


def test_largestar_path_graph_in_logsq_rounds(spark):
    """The 256-node path that needs ~9 min-label rounds (and FAILS
    under a ceiling of 2) converges under large-star/small-star well
    inside its O(log² n) bound — the exact routing the min-label
    ceiling error advertises."""
    from messdb_spark.queries.graph import cc_labels_large_small_star

    n = 256
    edges = _path_edges(spark, n)
    labels = cc_labels_large_small_star(edges, max_rounds=16)
    got = {r["doc_id"]: r["comp"] for r in labels.collect()}
    assert set(got) == set(range(1, n + 1))
    assert set(got.values()) == {1}
    edges.unpersist()


def test_largestar_matches_minlabel_on_random_graph(spark):
    """Two independently-formulated closures must agree label-for-label
    on a seeded random multi-component graph (self-loops, duplicate and
    reversed edges included — the canonicalization path)."""
    import random

    from messdb_spark.queries.graph import (cc_labels_from_edges,
                                            cc_labels_large_small_star)

    rng = random.Random(11)
    raw = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    raw += [(i, i) for i in range(0, 40, 7)]          # self-loops
    raw += [(b, a) for a, b in raw[:50]]              # reversed dups
    star = spark.createDataFrame(raw, "src bigint, dst bigint")
    edges = (star.union(star.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(F.col("dst")).persist())
    a = {r["doc_id"]: r["comp"]
         for r in cc_labels_from_edges(edges).collect()}
    b = {r["doc_id"]: r["comp"]
         for r in cc_labels_large_small_star(edges).collect()}
    # min-label includes self-loop-only nodes (they appear in the edge
    # frame); large/small-star drops self-loops up front — compare on
    # the common (real-edge) node set, where labels must be identical
    real = {k for k, v in b.items()}
    assert real <= set(a)
    assert {k: a[k] for k in real} == b
    for k in set(a) - real:
        assert a[k] == k      # self-loop-only nodes label themselves
    edges.unpersist()


def test_cc_both_algorithms_match_union_find(spark):
    """Ground truth from a trivially-correct pure-Python union-find:
    BOTH distributed closures (min-label + pointer jumping, and
    large-star/small-star) must produce comp == component minimum for
    every edge-touched node, across several seeded random graphs —
    guards against a shared bug the two-implementation cross-check
    cannot see."""
    import random

    from messdb_spark.queries.graph import (cc_labels_from_edges,
                                            cc_labels_large_small_star)

    for seed in (3, 7, 42):
        rng = random.Random(seed)
        n_nodes, n_edges = 120, 150
        raw = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
               for _ in range(n_edges)]
        raw = [(a, b) for a, b in raw if a != b]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in raw:
            parent[find(a)] = find(b)
        comp_min: dict[int, int] = {}
        for x in {v for e in raw for v in e}:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        truth = {x: comp_min[find(x)] for x in {v for e in raw for v in e}}

        star = spark.createDataFrame(raw, "src bigint, dst bigint")
        edges = (star.union(star.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
                     .repartition(F.col("dst")).persist())
        for fn in (cc_labels_from_edges, cc_labels_large_small_star):
            got = {r["doc_id"]: r["comp"] for r in fn(edges).collect()}
            assert got == truth, f"seed {seed}, {fn.__name__}"
        edges.unpersist()


def test_largestar_string_keys_and_empty(spark):
    from messdb_spark.queries.graph import cc_labels_large_small_star

    n = 64
    star = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(1, n)],
        "src string, dst string")
    edges = (star.union(star.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(F.col("dst")).persist())
    got = {r["doc_id"]: r["comp"]
           for r in cc_labels_large_small_star(
               edges, numeric_key=False).collect()}
    assert set(got.values()) == {"n001"} and len(got) == n
    edges.unpersist()

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert cc_labels_large_small_star(empty).count() == 0


def test_largestar_too_small_ceiling_fails_loud(spark):
    from messdb_spark.queries.graph import cc_labels_large_small_star

    edges = _path_edges(spark, 256)
    with pytest.raises(RuntimeError, match="convergence-witness bug"):
        cc_labels_large_small_star(edges, max_rounds=1)
    edges.unpersist()


def test_cc_label_cache_is_session_scoped(spark, tmp_path):
    """The cache key uses spark.sparkContext.applicationId — an entry
    left by a DEAD session (whose id(spark) address could be recycled)
    must never be returned to a live one (VERDICT r10 what's-wrong #3)."""
    from messdb_spark.queries import graph

    sf_dir = str(tmp_path)
    text = ("the quick brown fox jumps over the lazy dog and keeps "
            "jumping for a while longer than needed")
    spark.createDataFrame(
        [(1, text), (2, text), (3, "something else entirely different "
                                   "with no shared shingles at all")],
        "doc_id bigint, text string") \
        .write.mode("overwrite").parquet(os.path.join(sf_dir,
                                                      "documents.parquet"))
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    sentinel = object()
    graph._CC_LABEL_CACHE.clear()
    dead = ("application_dead_0000", src, st.st_mtime_ns, st.st_size)
    graph._CC_LABEL_CACHE[dead] = sentinel
    out = graph.cc_cluster_labels(spark, sf_dir)
    assert out is not sentinel, "cache returned a dead session's frame"
    live = (spark.sparkContext.applicationId, src, st.st_mtime_ns,
            st.st_size)
    assert live in graph._CC_LABEL_CACHE
    # repeat call on the live session: a genuine hit
    assert graph.cc_cluster_labels(spark, sf_dir) is out
    graph._CC_LABEL_CACHE.clear()


# -- r12: warm-started min-label closure (VERDICT r11 next round #1) ----


def test_cc_warm_seed_fixpoint_verifies_in_one_round(spark):
    """Seeding with the graph's own fixpoint (the verb's restore case,
    and the no-topology-change refresh) converges in ONE verification
    round — the witness sum is already stationary — where the cold
    start needs ~log2(diameter) rounds; labels identical."""
    from messdb_spark.queries import graph as G

    n = 256
    edges = _path_edges(spark, n)
    cold = G.cc_labels_from_edges(edges, max_rounds=12)
    cold_rounds = G.LAST_CC_ROUNDS
    assert cold_rounds >= 3
    warm = G.cc_labels_from_edges(edges, max_rounds=12, seed=cold)
    assert G.LAST_CC_ROUNDS == 1
    got = {(r["doc_id"], r["comp"]) for r in warm.collect()}
    assert got == {(i, 1) for i in range(1, n + 1)}
    edges.unpersist()


def test_cc_warm_seed_adds_only_growth_fewer_rounds(spark):
    """The verb's actual adds-only case: labels of a 200-node path seed
    the grown 256-node path. Every old label (all = node 1) is still a
    node id in the same — merged — component, so the fixpoint is
    unchanged, and propagation only has to cross the 56-node merge
    boundary: strictly fewer rounds than a cold start over the full
    diameter."""
    from messdb_spark.queries import graph as G

    old_edges = _path_edges(spark, 200)
    old = G.cc_labels_from_edges(old_edges, max_rounds=12)
    old.count()                      # materialize before growing
    edges = _path_edges(spark, 256)
    cold = G.cc_labels_from_edges(edges, max_rounds=12)
    cold_rounds = G.LAST_CC_ROUNDS
    warm = G.cc_labels_from_edges(edges, max_rounds=12, seed=old)
    warm_rounds = G.LAST_CC_ROUNDS
    assert warm_rounds < cold_rounds, (warm_rounds, cold_rounds)
    assert sorted((r["doc_id"], r["comp"]) for r in warm.collect()) \
        == sorted((r["doc_id"], r["comp"]) for r in cold.collect())
    old_edges.unpersist()
    edges.unpersist()


def test_cc_warm_seed_ignores_departed_nodes(spark):
    """Seed rows for nodes no longer in the edge frame must drop out
    silently (the left join side), not resurrect ghost labels."""
    from messdb_spark.queries import graph as G

    edges = _path_edges(spark, 16)
    seed = spark.createDataFrame(
        [(i, 1) for i in range(1, 17)] + [(999, 1), (1000, 500)],
        "doc_id bigint, comp bigint")
    warm = G.cc_labels_from_edges(edges, max_rounds=12, seed=seed)
    got = {(r["doc_id"], r["comp"]) for r in warm.collect()}
    assert got == {(i, 1) for i in range(1, 17)}
    edges.unpersist()


def test_cc_warm_seed_string_keys(spark):
    """Warm start through the non-numeric (changed-rows) witness: an
    exact-fixpoint seed breaks after one round, labels unchanged."""
    from messdb_spark.queries import graph as G

    n = 32
    star = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(1, n)],
        "src string, dst string")
    edges = (star.union(star.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(F.col("dst")).persist())
    cold = G.cc_labels_from_edges(edges, numeric_key=False, max_rounds=12)
    cold_rounds = G.LAST_CC_ROUNDS
    warm = G.cc_labels_from_edges(edges, numeric_key=False, max_rounds=12,
                                  seed=cold)
    assert G.LAST_CC_ROUNDS == 1 <= cold_rounds
    got = {(r["doc_id"], r["comp"]) for r in warm.collect()}
    assert got == {(f"n{i:03d}", "n001") for i in range(1, n + 1)}
    edges.unpersist()
