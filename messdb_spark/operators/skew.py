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


def salted_join(big: DataFrame, small: DataFrame, keys: Sequence[str],
                n_salts: int = 8, how: str = "inner",
                seed: int = 7) -> DataFrame:
    """Skew-safe equi-join WITHOUT broadcast — the explicit salting
    pattern for when the small side is too big to broadcast and AQE's
    runtime skew split can't engage (pre-shuffled inputs, or a skewed
    partition that still fits under its split threshold).

    Every ``big`` row draws a salt in [0, S); ``small`` is replicated S
    times, once per salt value; the join key becomes (keys…, salt).
    A hot key's 10⁹ rows then land on S reducers instead of one, at the
    price of shuffling S copies of the small side. The result is
    row-identical to the plain join for ``inner``/``left`` (each big
    row matches exactly its own salt's replica of every matching small
    row); right/full would miss unmatched small rows — rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(_SALT, (F.rand(seed=seed) * n_salts).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return big_s.join(small_s, on=[*keys, _SALT], how=how).drop(_SALT)
