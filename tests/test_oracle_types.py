"""Oracle output-type lint: every ``oracle_sql()`` must type through
DuckDB to a portable scalar set.

The driver hashes (type, value) pairs, so a DuckDB-only output type —
most notably HUGEINT (int128) from ``sum(int)`` — hash-mismatches a
value-identical Spark BIGINT column.  This lint would have caught all
four round-1 HUGEINT failures (events_sessionization,
token_stats_by_lang, q12_priority_class_agg, training_corpus_prep):
any oracle whose output column types DuckDB to something outside
{BIGINT, INTEGER, SMALLINT, TINYINT, DOUBLE, FLOAT, VARCHAR, TIMESTAMP,
DATE, BOOLEAN, DECIMAL(p,s), BLOB} fails here with the offending
column named, before the driver ever sees it."""

from __future__ import annotations

import re

import duckdb
import pytest

from messdb_spark.queries import QUERIES
from tests.test_oracle_parity import TABLES

from tests.conftest import SF_DIR

PORTABLE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
            "FLOAT", "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN", "BLOB"}
_DECIMAL_RE = re.compile(r"^DECIMAL\(\d+,\d+\)$")


@pytest.fixture(scope="module")
def typed_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _portable(type_str: str) -> bool:
    t = type_str.upper()
    return t in PORTABLE or bool(_DECIMAL_RE.match(t))


@pytest.mark.parametrize("name", sorted(n for n in QUERIES
                                        if QUERIES[n].oracle is not None))
def test_oracle_output_types_portable(typed_con, name):
    rel = typed_con.sql(QUERIES[name].oracle)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if not _portable(str(t))]
    assert not bad, (
        f"{name}: non-portable oracle output types {bad}; "
        f"CAST them (e.g. sum(int) -> HUGEINT needs CAST(... AS BIGINT))")
