"""Named-function registry — the ``FuncKey`` analog.

The reference identifies every user function by a string key so the memo
layer can hash plans that contain user code
(``/root/reference/messdb-base/src/MessDB/Trie.hs:513-521``). We keep the
same discipline: transforms and folds are *registered by name*, and the
view-IR references them by name only. Bodies are Column-expression
builders (Catalyst-optimizable, JVM-side); Pandas-UDF bodies are allowed
but discouraged in hot paths.

Two function shapes, mirroring the reference:

- **TransformFunc** (``Trie.hs:517``): row → row with a new key. Here: a
  callable ``DataFrame -> DataFrame`` that must emit the new key columns
  plus value columns. 1→1 (the reference has no UDTF).
- **FoldFunc** (``Trie.hs:521``): combine two values for an equal key,
  applied left-to-right in input-precedence order (``Trie.hs:396-401``).
  Here: a spec that builds aggregate expressions over
  ``(value_struct, ordinal)`` pairs so Spark's unordered aggregation
  still realizes the deterministic input-order fold.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TransformFunc:
    """Named 1→1 re-keying transform (``TransformFunc`` analog)."""
    key: str                                  # FuncKey — feeds the plan digest
    fn: Callable[[DataFrame], DataFrame]      # must produce new key + value cols
    new_key_cols: tuple[str, ...]             # key columns of the output


@dataclass(frozen=True)
class FoldFunc:
    """Named fold for equal-key collisions (``FoldFunc`` analog).

    ``agg(value_cols, ord_col)`` returns one aggregate Column per value
    column, named exactly like the value columns. ``ord_col`` is the
    precedence ordinal: higher = later input = folds on the right.
    """
    key: str
    agg: Callable[[list[str], Column], list[Column]]


def _fold_to_last_agg(value_cols: list[str], ord_col: Column) -> list[Column]:
    # max_by over a struct keeps the whole row of the winning (latest)
    # ordinal — one JVM-side aggregate, no collect_list materialization.
    winner = F.max_by(F.struct(*[F.col(c) for c in value_cols]), ord_col)
    return [winner.getField(c).alias(c) for c in value_cols]


def _fold_to_first_agg(value_cols: list[str], ord_col: Column) -> list[Column]:
    winner = F.min_by(F.struct(*[F.col(c) for c in value_cols]), ord_col)
    return [winner.getField(c).alias(c) for c in value_cols]


def _fold_sum_agg(value_cols: list[str], ord_col: Column) -> list[Column]:
    # Commutative fold: ordinal irrelevant. Map-side partial aggregation
    # (partial sum before shuffle) comes free from Catalyst.
    return [F.sum(c).alias(c) for c in value_cols]


class Registry:
    """Process-wide named function registry."""

    def __init__(self) -> None:
        self.transforms: dict[str, TransformFunc] = {}
        self.folds: dict[str, FoldFunc] = {}

    def transform(self, key: str, new_key_cols: tuple[str, ...]):
        def deco(fn):
            self.transforms[key] = TransformFunc(key, fn, new_key_cols)
            return fn
        return deco

    def register_fold(self, fold: FoldFunc) -> FoldFunc:
        self.folds[fold.key] = fold
        return fold

    def get_transform(self, key: str) -> TransformFunc:
        return self.transforms[key]

    def get_fold(self, key: str) -> FoldFunc:
        return self.folds[key]


REGISTRY = Registry()

# The reference's only built-in named function (``Trie.hs:523-529``).
FOLD_TO_LAST = REGISTRY.register_fold(FoldFunc("fold_to_last", _fold_to_last_agg))
FOLD_TO_FIRST = REGISTRY.register_fold(FoldFunc("fold_to_first", _fold_to_first_agg))
FOLD_SUM = REGISTRY.register_fold(FoldFunc("fold_sum", _fold_sum_agg))
