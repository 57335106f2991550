"""Bucketed range/interval join — the pure-overlap join Spark lacks.

The reference's only range machinery is the key-range filter
(``messdb-base/src/MessDB/Trie.hs:472-510``); a point-in-interval JOIN
between two relations has no reference or Spark built-in (Catalyst
plans a non-equi condition as BroadcastNestedLoopJoin — O(n*m) and
broadcast-bound). The standard scale design (Flink interval joins,
Databricks' binned range join) is implemented here natively:

1. pick a bucket width >= the typical interval length;
2. each interval [lo, hi) explodes to the buckets it covers
   (<= 2 when hi-lo <= width), each point maps to exactly ONE bucket;
3. join on bucket equality (+ optional extra equi-keys), then apply
   the exact range predicate.

Cost: shuffle of |points| + ~2|intervals| 8-byte-keyed rows and a hash
join — no nested loop, no broadcast of a fact table. Each matching
(point, interval) pair is emitted exactly once because the point's
single bucket matches exactly one exploded bucket. Hot buckets (a
burst of points in one window) are ordinary join skew — AQE's
skew-join splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_col: str, lo_col: str, hi_col: str,
                  bucket_width: int,
                  extra_keys: list[tuple[str, str]] | None = None) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (half-open, messdb's includeStart/excludeEnd
    default range shape).

    ``point_col``/``lo_col``/``hi_col`` must be integral columns in the
    same units (e.g. ``unix_micros``); callers with timestamps convert
    first. Column names must be disjoint between the two inputs apart
    from the internal bucket key. ``extra_keys`` adds (point_side,
    interval_side) equi-key pairs to the shuffle key, e.g. per-user
    windows.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(int(bucket_width))
    pts = points.withColumn("_rj_b", F.floor(F.col(point_col) / w))
    ivs = (intervals
           .filter(F.col(hi_col) > F.col(lo_col))
           .withColumn("_rj_b", F.explode(F.sequence(
               F.floor(F.col(lo_col) / w),
               F.floor((F.col(hi_col) - 1) / w)))))
    cond = [pts["_rj_b"] == ivs["_rj_b"],
            pts[point_col] >= ivs[lo_col],
            pts[point_col] < ivs[hi_col]]
    for pk, ik in (extra_keys or []):
        cond.append(pts[pk] == ivs[ik])
    return pts.join(ivs, cond, "inner").drop(pts["_rj_b"]).drop(ivs["_rj_b"])
