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
from . import core_ops, analytics, events, text, similarity, advanced, multimodal, extra  # noqa: E402,F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
