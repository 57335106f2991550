"""Query inventory — every implemented operator from SURVEY.md §2 plus
the north-star additions (§2.9), each as a (spark_fn, oracle_sql) pair
for the driver's DuckDB correctness gate.

Conventions (driver contract, ``/root/repo/__spark_entry__.py``):
- every computed column aliased identically in Spark and SQL;
- every floating-point output rounded (both sides) so value hashes
  match despite FP summation-order differences;
- top-k queries rank on full precision with a unique tiebreaker column
  so both engines select the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


from pyspark.sql import Column, functions as _F


def quantize(col: Column, n: int) -> Column:
    """Engine-portable rounding of a DOUBLE: floor(x·10ⁿ + 0.5)/10ⁿ in
    pure double arithmetic. Spark's round() rounds the double's decimal
    *representation* (BigDecimal HALF_UP) while DuckDB rounds the
    binary value — they disagree whenever the true value sits exactly
    on a half boundary (common for money/ratio data). This quantizer
    is bit-identical on both engines because every step is IEEE double
    math. Use for ratios/divisions; for exact DECIMAL aggregates round
    in decimal first and cast (round(dec, n) is exact HALF_UP on both
    engines)."""
    if isinstance(col, str):
        col = _F.col(col)
    m = _F.lit(float(10 ** n))
    return _F.floor(col * m + _F.lit(0.5)) / m


def quantize_sql(expr: str, n: int) -> str:
    """DuckDB-side mirror of quantize()."""
    m = float(10 ** n)
    return f"floor(({expr}) * {m} + 0.5) / {m}"


def pin_result(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a (small — pair list / top-k / vocab-bounded)
    result with an eager localCheckpoint, then unpersist the
    corpus-sized cached frames that fed it. Without this each bench
    query leaks its cached blocks into executor storage memory for the
    rest of the 155-query run (ADVICE r4); with it a query's storage
    footprint after return is just its own result rows.

    The pre-checkpoint frame rides along on ``__pre_pin__`` so plan
    tests can still assert the REAL plan shape (a checkpointed frame
    explains as a bare ExistingRDD scan)."""
    pinned = out.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    pinned.__pre_pin__ = out
    return pinned


def plan_of(df: DataFrame) -> DataFrame:
    """The frame whose .explain() shows the query's real plan — the
    pre-pin frame for pin_result outputs, the frame itself otherwise."""
    return getattr(df, "__pre_pin__", df)


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None → non-SQL-expressible, rows-only check


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = Query(name, fn, oracle)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    from ..session import read_table
    out = []
    for n in names:
        df = read_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out.append(df)
    return out


# importing modules populates QUERIES
from . import core_ops, analytics, events, text, similarity, advanced, multimodal, extra, tpch_more, tpch3, approx, udtf_ops, pipeline, graph, packing, quality, corpus, features, relops, engine_ops, mining, sketches, linkage, tokenizer, paths, experiments  # noqa: E402,F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
