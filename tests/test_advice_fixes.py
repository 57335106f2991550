"""Regression tests for the round-1 advisor findings: DDL re-run
safety, single-evaluation CAS writes, sqlite memo replace semantics,
and content-hash encoding unambiguity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from messdb_spark.engine import Engine
from messdb_spark.operators.core import KeyedTable
from messdb_spark.sql_ddl import SqlError


def test_create_table_if_not_exists_preserves_data(spark, warehouse):
    eng = Engine(spark, warehouse)
    eng.ddl("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR)")
    df = spark.createDataFrame([(1, "x")], "k bigint, v string")
    eng.save_table("t", KeyedTable(df, ("k",)))
    # IF NOT EXISTS re-run: no-op, data survives
    eng.ddl("CREATE TABLE IF NOT EXISTS t (k BIGINT PRIMARY KEY, v VARCHAR)")
    assert eng.load_table("t").df.count() == 1
    # plain CREATE over an existing name: error, data still survives
    with pytest.raises(SqlError):
        eng.ddl("CREATE TABLE t (k BIGINT PRIMARY KEY, v VARCHAR)")
    assert eng.load_table("t").df.count() == 1


def test_put_hashes_written_bytes_of_nondeterministic_plan(spark, warehouse):
    """A rand()-bearing plan must store bytes matching its content
    address: hash-then-write would evaluate the plan twice and can
    store a second, different evaluation under the first's hash."""
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import ObjectStore

    store = ObjectStore(warehouse)
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.rand().alias("v"))   # nondeterministic
    h = store.put(df, table_content_hash)
    stored = store.load(spark, h)
    # the stored object re-hashes to its own address
    assert table_content_hash(stored) == h


def test_put_dedups_equal_content(spark, warehouse):
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.store import ObjectStore

    store = ObjectStore(warehouse)
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    h1 = store.put(df, table_content_hash)
    h2 = store.put(df.orderBy(F.desc("k")), table_content_hash)  # same rows
    assert h1 == h2
    assert store.save_skips >= 1


def test_sqlite_memo_put_replaces_dead_entry(warehouse):
    from messdb_spark.sqlite_store import SqliteMemoStore

    memo = SqliteMemoStore(warehouse)
    memo.put("digest", "dead-hash")
    # materializer re-puts after discovering the target object is gone;
    # the fresh hash must stick (OR IGNORE kept the dead one forever)
    memo.put("digest", "fresh-hash")
    assert memo.get("digest") == "fresh-hash"


def test_content_hash_nul_bytes_unambiguous(spark):
    """Strings equal to the NULL sentinel, containing the separator, or
    redistributing content across column boundaries must hash
    distinctly."""
    from messdb_spark.hashing import table_content_hash

    def t(rows):
        return spark.createDataFrame(rows, "a string, b string").coalesce(1)

    null_row = t([(None, "x")])
    sentinel_row = t([("\x00N", "x")])            # value == NULL sentinel
    assert table_content_hash(null_row) != table_content_hash(sentinel_row)

    shifted1 = t([("p\x00|q", "r")])              # value contains separator
    shifted2 = t([("p", "q\x00|r")])
    assert table_content_hash(shifted1) != table_content_hash(shifted2)


# ---- round-3 advisor findings ---------------------------------------


def test_check_table_accepts_empty_table(spark):
    """An empty table satisfies the key invariants vacuously; the
    NULL-sum-over-zero-rows bug made check_table reject it (the round-3
    streaming-test flake)."""
    from messdb_spark.operators.core import check_table

    empty = spark.createDataFrame([], "k bigint, v string")
    assert check_table(KeyedTable(empty, ("k",)))
    two_key = spark.createDataFrame([], "a bigint, b bigint, v string")
    assert check_table(KeyedTable(two_key, ("a", "b")))


def test_asof_excludes_equal_timestamp_views(spark, tmp_path):
    """A view at exactly the purchase's timestamp must NOT attribute
    (oracle semantics: strictly v.ts < p.ts). Crafted collision:
    user 1 has a view and a purchase at the same microsecond."""
    import datetime

    from messdb_spark.queries.advanced import asof_join_purchase_view

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    earlier = t0 - datetime.timedelta(minutes=5)
    rows = [
        (1, 1, "view", earlier, 1.0),      # valid earlier view
        (2, 1, "view", t0, 1.0),           # equal-ts view: must NOT win
        (3, 1, "purchase", t0, 9.0),
        (4, 2, "purchase", t0, 9.0),       # user 2: no views at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    p = tmp_path / "events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(str(p.parent / "sf"))
    # query functions read <sf_dir>/events.parquet
    import os
    os.rename(str(p.parent / "sf"), str(p.parent / "events.parquet"))
    out = {r["purchase_id"]: r["last_view_id"]
           for r in asof_join_purchase_view(spark, str(p.parent)).collect()}
    assert out == {3: 1, 4: None}


def test_read_event_stream_starts_on_empty_dir(spark, tmp_path):
    """Stream setup must not require a parquet footer to exist yet
    (the round-3 regression from schema sniffing)."""
    from messdb_spark.streaming.stream import read_event_stream

    d = tmp_path / "empty_in"
    d.mkdir()
    stream = read_event_stream(spark, str(d))
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        "event_id", "user_id", "event_type", "ts", "value"]
