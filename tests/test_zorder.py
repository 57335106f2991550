"""Z-order clustered layout: Morton interleave, per-bucket min/max
skipping on BOTH dimensions, exact residual semantics vs a full scan,
and the locality property a single-key sort cannot give (a band on the
SECOND column also prunes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from messdb_spark.plans.incremental import EMPTY
from messdb_spark.plans.zorder import (ZClusteredRef, _morton2,
                                       read_box, write_zclustered)
from messdb_spark.store import ObjectStore


def _grid(spark, n=4096):
    # two independent uniform dimensions (x = id order, y = bit-mixed)
    return spark.range(n).select(
        F.col("id").alias("x"),
        ((F.col("id") * 2654435761) % n).alias("y"),
        (F.col("id") % 7).alias("v"))


def test_morton_interleave_exact(spark):
    rows = (spark.range(256)
            .select((F.col("id") / 16).cast("int").alias("cx"),
                    (F.col("id") % 16).cast("int").alias("cy"))
            .withColumn("z", _morton2(F.col("cx"), F.col("cy")))
            .collect())
    for r in rows:
        z = 0
        for i in range(4):
            z |= ((r["cx"] >> i) & 1) << (2 * i + 1)
            z |= ((r["cy"] >> i) & 1) << (2 * i)
        assert r["z"] == z


def test_box_read_exact_and_pruned(spark, warehouse):
    store = ObjectStore(warehouse)
    df = _grid(spark)
    ref = write_zclustered(store, df, ("x", "y"), n_buckets=16)
    assert ref.n_buckets == 16
    box = {"x": (1000, 1800), "y": (500, 1300)}
    loads0 = store.loads
    got = read_box(spark, store, ref, box)
    expect = df.filter((F.col("x").between(1000, 1800))
                       & (F.col("y").between(500, 1300)))
    assert {tuple(r) for r in got.collect()} == \
           {tuple(r) for r in expect.collect()}
    opened = store.loads - loads0
    # a ~20% x ~20% box must open well under half the buckets
    assert 1 <= opened <= 8


def test_both_dimensions_prune(spark, warehouse):
    """The z-order headline: a band on EITHER dimension alone skips
    buckets — impossible for the non-leading key of a sorted layout."""
    store = ObjectStore(warehouse)
    df = _grid(spark)
    ref = write_zclustered(store, df, ("x", "y"), n_buckets=16)
    for col in ("x", "y"):
        loads0 = store.loads
        got = read_box(spark, store, ref, {col: (0, 400)})
        assert got.count() == df.filter(F.col(col) <= 400).count()
        assert store.loads - loads0 < ref.n_buckets  # skipped some
    # and the stats are per-column tight enough that a far-corner box
    # opens almost nothing
    wanted = ref.overlapping({"x": (0.0, 100.0), "y": (0.0, 100.0)})
    assert len(wanted) <= 4


def test_empty_box_opens_nothing(spark, warehouse):
    store = ObjectStore(warehouse)
    df = _grid(spark, n=512)
    ref = write_zclustered(store, df, ("x", "y"), n_buckets=8)
    loads0 = store.loads
    got = read_box(spark, store, ref, {"x": (10_000, 20_000)})
    assert got.count() == 0
    assert store.loads == loads0          # manifest-only decision


def test_unbounded_side_and_residual(spark, warehouse):
    store = ObjectStore(warehouse)
    df = _grid(spark, n=1024)
    ref = write_zclustered(store, df, ("x", "y"), n_buckets=8)
    got = read_box(spark, store, ref, {"y": (900, None)})
    expect = df.filter(F.col("y") >= 900)
    assert {tuple(r) for r in got.collect()} == \
           {tuple(r) for r in expect.collect()}


def test_manifest_stats_cover_rows(spark, warehouse):
    store = ObjectStore(warehouse)
    df = _grid(spark, n=1024)
    ref = write_zclustered(store, df, ("x", "y"), n_buckets=8)
    total = 0
    for b in range(ref.n_buckets):
        if ref.bucket_hashes[b] == EMPTY:
            continue
        part = spark.read.parquet(store.path(ref.bucket_hashes[b]))
        mn_x, mx_x = ref.stats[b]["x"]
        mn_y, mx_y = ref.stats[b]["y"]
        bad = part.filter(~(F.col("x").between(mn_x, mx_x)
                            & F.col("y").between(mn_y, mx_y))).count()
        assert bad == 0
        total += part.count()
    assert total == 1024
