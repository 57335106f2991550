"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning at scale.

The reference's tables are single-key sorted tries, so range pruning
works on exactly ONE dimension (`rangeFilterTrie`,
`/root/reference/messdb-base/src/MessDB/Trie.hs:472-510`). At 100 TB a
table is typically filtered on several independent columns (user AND
time, part AND supplier); a linear sort gives perfect pruning on the
leading column and none on the rest. Z-ordering interleaves the bits
of k normalized key columns into one Morton key and lays files out
along that curve, so EVERY participating column's values are locally
clustered — parquet file/row-group min-max stats then skip most of the
data for a point or range filter on ANY of the columns.

All computation is JVM-side column expressions (whole-stage codegen):
min/max normalization from one tiny agg, bit interleave via a
``aggregate(sequence(...))`` fold. One range shuffle to lay out the
files — the same cost as the linear sort it replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_layout"]

_ZCOL = "__zkey"


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over ``cols`` (numeric/timestamp), ``bits`` bits per
    column (k·bits ≤ 63). Each column is scaled to [0, 2^bits) with
    min/max collected in ONE small agg (plan literals — no join), then
    bit j of column c lands at position j·k + c of the key."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    aggs = []
    for c in cols:
        num = F.col(c).cast("double")
        aggs += [F.min(num).alias(f"mn_{c}"), F.max(num).alias(f"mx_{c}")]
    stats = df.agg(*aggs).first()
    top = (1 << bits) - 1
    parts = []
    for ci, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        scaled = (f"CAST(least(CAST({top} AS DOUBLE), greatest(CAST(0.0 AS DOUBLE), "
                  f"(CAST(`{c}` AS DOUBLE) - CAST({mn!r} AS DOUBLE)) / CAST({span!r} AS DOUBLE) "
                  f"* CAST({top} AS DOUBLE))) AS BIGINT)")
        parts.append(
            f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc | (shiftleft(shiftright({scaled}, i) & CAST(1 AS BIGINT), "
            f"i * {k} + {ci})))")
    return F.expr(" | ".join(parts))


def zorder_layout(df: DataFrame, cols: list[str], n_files: int,
                  bits: int = 16) -> DataFrame:
    """Return ``df`` laid out along the Z-curve of ``cols``: one range
    shuffle on the Morton key into ``n_files`` partitions, sorted
    within each, helper key dropped. Writing the result produces files
    whose per-column min/max footers are tight on every ``cols``
    member — the write-side half of predicate pushdown."""
    z = zorder_key(df, cols, bits)
    return (df.withColumn(_ZCOL, z)
              .repartitionByRange(n_files, F.col(_ZCOL))
              .sortWithinPartitions(_ZCOL)
              .drop(_ZCOL))
