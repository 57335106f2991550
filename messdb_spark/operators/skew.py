"""Skew-aware aggregation — the explicit salting pattern for hot keys
(complements AQE's runtime skew-join splitting, which only covers
joins; aggregation skew needs the two-stage salt).

At 100 TB a hot group key (one language, one null-ish id, one power-law
user) concentrates a partition on a single reducer. ``salted_agg``
splits every group into S salted subgroups (stage 1: partial agg on
(key, salt) — the hot key's rows spread over S reducers) and combines
the S partials (stage 2: tiny agg on key). Only algebraic aggregates
(sum/count/min/max and combinations, e.g. avg = sum/count) can be
salted this way — exactly the class that Spark partial-aggregates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__messdb_salt"


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, Column]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: output name → (combine_fn, stage1 aggregate Column) where
    combine_fn ∈ {"sum", "min", "max"} re-aggregates the partials.
    Example::

        salted_agg(df, ["lang"], {
            "n":     ("sum", F.count(F.lit(1))),
            "total": ("sum", F.sum("value")),
            "mx":    ("max", F.max("value")),
        })

    Stage 1 shuffles on (keys, salt): a key with 10⁹ rows spreads over
    ``n_salts`` reducers instead of one. Stage 2 shuffles ≤ n_salts
    rows per group — negligible.
    """
    salted = df.withColumn(_SALT, (F.rand(seed=7) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, _SALT).agg(
        *[col.alias(name) for name, (_, col) in aggs.items()])
    combine = {"sum": F.sum, "min": F.min, "max": F.max}
    stage2 = stage1.groupBy(*keys).agg(
        *[combine[fn](name).alias(name) for name, (fn, _) in aggs.items()])
    return stage2
