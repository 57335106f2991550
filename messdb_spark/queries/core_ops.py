"""Core-operator queries — the reference's engine proper exercised on
the driver testdata (O1 merge-fold, O2 sort-transform, O3 range filter,
O5 insert; SURVEY.md §2.1). Each oracle states the equivalent relational
semantics in ANSI SQL."""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.core import (KeyBound, KeyedTable, merge_tables, range_filter,
                              sort_table, table_insert)
from ..registry import FOLD_SUM, FOLD_TO_LAST, REGISTRY
from . import query, load, quantize


@query(
    "core_merge_upsert",
    oracle="""
    SELECT o_orderkey, o_custkey,
           floor((CASE WHEN o_orderkey % 100 < 10 THEN o_totalprice * 2
                      ELSE o_totalprice END) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS o_totalprice
    FROM orders
    """)
def core_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 mergeTables + O7 foldToLast (``Trie.hs:297-430,523-529``):
    base ∪ delta with last-wins upsert — the reference's only write path.
    Plan: unionByName (narrow) + one hash-agg shuffle; max_by fold keeps
    partial aggregation, so this scales like a plain groupBy."""
    (orders,) = load(spark, sf_dir, "orders")
    base = KeyedTable(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                      ("o_orderkey",))
    delta = KeyedTable(
        orders.filter(F.col("o_orderkey") % 100 < 10)
              .select("o_orderkey", "o_custkey",
                      (F.col("o_totalprice") * 2).alias("o_totalprice")),
        ("o_orderkey",))
    merged = merge_tables([base, delta], FOLD_TO_LAST)
    return merged.df.select("o_orderkey", "o_custkey",
                            quantize("o_totalprice", 2).alias("o_totalprice"))


@query(
    "core_merge_fold_sum",
    oracle="""
    SELECT l_partkey,
           floor((CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS qty,
           floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_partkey
    """)
def core_merge_fold_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 with a commutative fold: two disjoint yearly partials merged
    with fold_sum — the incremental-aggregate pattern the reference's
    memo layer exists to serve. Map-side combine on both inputs."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    cut = datetime.datetime(1998, 1, 1)

    def partial(df):
        return KeyedTable(
            df.groupBy("l_partkey")
              .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
                   F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue")),
            ("l_partkey",))

    early = partial(lineitem.filter(F.col("l_shipdate") < F.lit(cut)))
    late = partial(lineitem.filter(F.col("l_shipdate") >= F.lit(cut)))
    merged = merge_tables([early, late], FOLD_SUM)
    return merged.df.select("l_partkey",
                            quantize(F.col("qty").cast("double"), 2).alias("qty"),
                            quantize(F.col("revenue").cast("double"), 2).alias("revenue"))


REGISTRY.transforms.pop("orders_by_customer", None)


@REGISTRY.transform("orders_by_customer", new_key_cols=("o_custkey",))
def _orders_by_customer(df: DataFrame) -> DataFrame:
    return df.select("o_custkey", F.lit(1).cast("long").alias("n_orders"),
                     F.col("o_totalprice").cast("decimal(18,2)").alias("spend"),
                     "__messdb_ord")


@query(
    "core_sort_rekey",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS spend
    FROM orders GROUP BY o_custkey
    """)
def core_sort_rekey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 sortTable (``Trie.hs:433-470``): named transform re-keys
    orders by customer, fold_sum collapses collisions — projection +
    GROUP BY + re-sort in one operator, one shuffle."""
    (orders,) = load(spark, sf_dir, "orders")
    t = KeyedTable(orders, ("o_orderkey",))
    out = sort_table(t, "orders_by_customer", "fold_sum")
    return out.df.select("o_custkey", "n_orders",
                         quantize(F.col("spend").cast("double"), 2).alias("spend"))


@query(
    "core_range_filter",
    oracle="""
    SELECT o_orderkey, o_orderdate, floor((o_totalprice) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    """)
def core_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 rangeFilterTable (``Trie.hs:472-510``) on a composite
    (orderdate, orderkey) key; compiles to a pushed-down parquet filter
    (min/max row-group skip = the trie's subtree pruning)."""
    (orders,) = load(spark, sf_dir, "orders")
    t = KeyedTable(orders.select("o_orderdate", "o_orderkey", "o_totalprice"),
                   ("o_orderdate", "o_orderkey"))
    out = range_filter(
        t,
        KeyBound((datetime.datetime(1996, 1, 1),), inclusive=True),
        KeyBound((datetime.datetime(1997, 1, 1),), inclusive=False))
    return out.df.select("o_orderkey", "o_orderdate",
                         quantize("o_totalprice", 2).alias("o_totalprice"))


@query(
    "core_table_insert",
    oracle="""
    SELECT r_regionkey,
           CASE WHEN r_regionkey = 0 THEN 'AFRICA (UPDATED)' ELSE r_name END AS r_name
    FROM region
    UNION ALL SELECT 5 AS r_regionkey, 'MIDDLE EARTH' AS r_name
    """)
def core_table_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 tableInsert (``Table.hs:142-143``): point upserts — one new
    key, one overwrite — via singleton merges."""
    (region,) = load(spark, sf_dir, "region")
    t = KeyedTable(region, ("r_regionkey",))
    t = table_insert(t, {"r_regionkey": 5, "r_name": "MIDDLE EARTH"})
    t = table_insert(t, {"r_regionkey": 0, "r_name": "AFRICA (UPDATED)"})
    return t.df.select("r_regionkey", "r_name")


@query(
    "merge_schema_evolution",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    delta AS (
      SELECT o_orderkey, o_custkey, cents * 2 AS cents,
             'rush' AS priority_tag
      FROM base WHERE o_orderkey % 10 = 0
    )
    SELECT b.o_orderkey,
           coalesce(d.o_custkey, b.o_custkey) AS o_custkey,
           coalesce(d.cents, b.cents) AS cents,
           d.priority_tag
    FROM base b LEFT JOIN delta d USING (o_orderkey)
    """)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 merge with SCHEMA EVOLUTION: the delta carries a column the
    base table has never seen (``priority_tag``); the merge widens the
    value schema, backfilling typed NULLs for untouched base rows —
    the ADD-COLUMN upsert the reference's static Haskell schemas
    cannot express (its schema is fixed at table creation,
    ``Repo.hs:57-68``) but any long-lived 100 TB table needs.

    The oracle states the same result relationally: delta rows win on
    collision (all delta keys exist in base here, so last-wins ==
    LEFT JOIN + coalesce), non-delta rows keep their values with a
    NULL new column. Physical: same anti-join + union as every
    last-wins merge — schema width changes, the plan shape doesn't."""
    from ..operators.core import KeyedTable, merge_tables

    (orders,) = load(spark, sf_dir, "orders")
    base = KeyedTable(
        orders.select("o_orderkey", "o_custkey",
                      F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                       .cast("long").alias("cents")),
        ("o_orderkey",))
    delta = KeyedTable(
        base.df.filter(F.col("o_orderkey") % 10 == 0)
              .select("o_orderkey", "o_custkey",
                      (F.col("cents") * 2).alias("cents"),
                      F.lit("rush").alias("priority_tag")),
        ("o_orderkey",))
    merged = merge_tables([base, delta], FOLD_TO_LAST,
                          allow_schema_evolution=True)
    return merged.df.select("o_orderkey", "o_custkey", "cents",
                            "priority_tag")
