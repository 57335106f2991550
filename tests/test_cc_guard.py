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
