"""Property-based tests (hypothesis) mirroring the reference's
QuickCheck suites (SURVEY.md §5): random kv sets → operators vs a pure
dict model (TrieSpec style, alphabet a-c strings like
``TrieSpec.hs:115-130``), and DDL schema derivation properties
(``SQL/Schema.hs``). Spark examples are kept few-but-fat (each example
is a full job); the pure-Python DDL property runs wide."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from messdb_spark.operators.core import (KeyBound, KeyedTable, merge_tables,
                                         range_filter, table_from_rows,
                                         table_to_rows)
from messdb_spark.registry import FOLD_TO_LAST
from messdb_spark.sql_ddl import CreateTable, SqlError, parse_create_table

short_str = st.text(alphabet="abc", min_size=0, max_size=8)
kv_lists = st.lists(st.tuples(short_str, short_str), min_size=0, max_size=40)

SPARK_SETTINGS = settings(max_examples=8, deadline=None,
                          suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=kv_lists)
@SPARK_SETTINGS
def test_from_rows_is_last_wins_dict(spark, rows):
    """tableFromRows folds duplicate keys in input order
    (``Table.hs:125-140``): result == dict(rows), key-sorted."""
    t = table_from_rows(spark, rows, "k string, v string", ("k",))
    assert table_to_rows(t) == sorted(dict(rows).items())


@given(a=kv_lists, b=kv_lists, c=kv_lists)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_is_dict_union(spark, a, b, c):
    """mergeTables+foldToLast == left-to-right dict update
    (``Trie.hs:297-430``), for any number of inputs incl. empties."""
    tabs = [table_from_rows(spark, rows, "k string, v string", ("k",))
            for rows in (a, b, c)]
    got = table_to_rows(merge_tables(tabs, FOLD_TO_LAST))
    model: dict = {}
    for rows in (a, b, c):
        model.update(dict(rows))
    assert got == sorted(model.items())


@given(rows=kv_lists, lo=short_str, hi=short_str,
       lo_inc=st.booleans(), hi_inc=st.booleans())
@SPARK_SETTINGS
def test_range_filter_is_list_filter(spark, rows, lo, hi, lo_inc, hi_inc):
    """rangeFilterTable == plain filter by keyRangeIncludes
    (``TrieSpec.hs:47-78``)."""
    t = table_from_rows(spark, rows, "k string, v string", ("k",))
    got = table_to_rows(range_filter(t, KeyBound((lo,), lo_inc), KeyBound((hi,), hi_inc)))

    def inc(k: str) -> bool:
        if (k < lo) if lo_inc else (k <= lo):
            return False
        if (k > hi) if hi_inc else (k >= hi):
            return False
        return True

    assert got == sorted((k, v) for k, v in dict(rows).items() if inc(k))


# ---- DDL properties (pure python, wide sampling) ---------------------

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
sql_type = st.sampled_from(["smallint", "integer", "bigint", "real", "double precision",
                            "text", "bytes", "boolean", "timestamp", "decimal(12,3)"])


@given(name=ident,
       cols=st.lists(st.tuples(ident, sql_type, st.booleans()),
                     min_size=1, max_size=8,
                     unique_by=lambda c: c[0]))
@settings(max_examples=200, deadline=None)
def test_ddl_parse_properties(name, cols):
    """For any CREATE TABLE: first column is the key; key cols non-null;
    NOT NULL honored; column order preserved; names exact."""
    defs = [f"{cols[0][0]} {cols[0][1]} PRIMARY KEY"]
    defs += [f"{c} {t}{' NOT NULL' if nn else ''}" for c, t, nn in cols[1:]]
    ct = parse_create_table(f"CREATE TABLE {name} ({', '.join(defs)})")
    assert isinstance(ct, CreateTable) and ct.name == name
    assert ct.key_cols == [cols[0][0]]
    assert [f.name for f in ct.schema.fields] == [c for c, _, _ in cols]
    assert not ct.schema.fields[0].nullable
    for f, (_, _, nn) in zip(ct.schema.fields[1:], cols[1:]):
        assert f.nullable == (not nn)


def test_ddl_rejects_keyless_and_garbage():
    with pytest.raises(SqlError):
        parse_create_table("CREATE TABLE t (a bigint, b text)")   # no key
    with pytest.raises(SqlError):
        parse_create_table("SELECT 1")
    with pytest.raises(SqlError):
        parse_create_table("CREATE TABLE t (a frobnicate PRIMARY KEY)")


@given(points=st.lists(st.integers(-100, 200), min_size=0, max_size=25),
       ivals=st.lists(st.tuples(st.integers(-100, 200), st.integers(0, 40)),
                      min_size=0, max_size=15),
       width=st.integers(1, 50))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_property(spark, points, ivals, width):
    """Bucketed interval join == naive nested-loop filter for arbitrary
    points, intervals (incl. empty and wider-than-bucket), and widths —
    every matching pair exactly once (TrieSpec model style)."""
    from messdb_spark.operators.range_join import interval_join

    pdf = spark.createDataFrame(
        [(p, i) for i, p in enumerate(points)] or [(0, -1)],
        "p long, pid long")
    idf = spark.createDataFrame(
        [(lo, lo + ln, i) for i, (lo, ln) in enumerate(ivals)] or [(0, 0, -1)],
        "lo long, hi long, iid long")
    if not points:
        pdf = pdf.filter("pid >= 0")
    if not ivals:
        idf = idf.filter("iid >= 0")
    got = sorted((r.pid, r.iid) for r in
                 interval_join(pdf, idf, point_col="p", lo_col="lo",
                               hi_col="hi", bucket_width=width).collect())
    want = sorted((pid, iid)
                  for pid, p in enumerate(points)
                  for iid, (lo, ln) in enumerate(ivals)
                  if lo <= p < lo + ln)
    assert got == want


_W64_MAX = 2**64 - 1
w64_vals = st.integers(min_value=0, max_value=_W64_MAX)


@given(vals=st.lists(w64_vals, min_size=1, max_size=12, unique=True))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_word64_boundary_roundtrip(spark, tmp_path_factory, vals):
    """word64 -> DECIMAL(20,0) mapping (SURVEY.md §7 risk 4): full-range
    unsigned values — always including the 2^63 sign boundary and
    2^64-1 — survive CSV import -> content hash -> ordered export, and
    key ORDER is unsigned-numeric (the reference's order-preserving key
    encoding property, ``Types.hs:97-111``; a signed-int64 readback
    would order 2^63.. before 0.. and corrupt the high half)."""
    import csv as _csv
    import glob

    from messdb_spark.engine import Engine
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.sources.io import export_csv, import_csv

    vals = sorted(set(vals) | {0, 2**63 - 1, 2**63, _W64_MAX})
    tmp = tmp_path_factory.mktemp("w64")
    eng = Engine(spark, str(tmp / "wh"))
    eng.ddl("CREATE TABLE w (k WORD64 PRIMARY KEY, v VARCHAR)")
    src = tmp / "in.csv"
    src.write_text("k,v\n" + "".join(f"{v},s{v}\n" for v in vals))
    t = import_csv(spark, str(src), eng.load_table("w"))
    # exact value survival through DECIMAL(20,0)
    got = {int(r["k"]): r["v"] for r in t.df.collect()}
    assert got == {v: f"s{v}" for v in vals}
    # deterministic content hash across two independent imports
    t2 = import_csv(spark, str(src), eng.load_table("w"))
    assert table_content_hash(t.df) == table_content_hash(t2.df)
    # ordered export follows unsigned numeric order
    out = tmp / "out"
    export_csv(t, str(out))
    rows = []
    for f in sorted(glob.glob(str(out / "part-*"))):
        with open(f) as fh:
            rows.extend(int(r["k"]) for r in _csv.DictReader(fh))
    assert rows == sorted(vals)


@given(old=kv_lists, new=kv_lists)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_diff_tables_reconstructs_new(spark, old, new):
    """diff(old, new) is a faithful changelog: applying it to old's
    dict (adds/changes set, removes delete) reproduces new's dict, and
    unchanged keys never appear."""
    from messdb_spark.operators.core import diff_tables, table_from_rows

    t_old = table_from_rows(spark, old, "k string, v string", ("k",))
    t_new = table_from_rows(spark, new, "k string, v string", ("k",))
    d_old, d_new = dict(old), dict(new)
    diff = diff_tables(t_old, t_new).collect()
    applied = dict(d_old)
    for r in diff:
        if r["change"] in ("added", "changed"):
            applied[r["k"]] = r["new_v"]
        elif r["change"] == "removed":
            applied.pop(r["k"], None)
        # unchanged keys must not be emitted
        assert not (r["k"] in d_old and r["k"] in d_new
                    and d_old[r["k"]] == d_new[r["k"]])
    assert applied == d_new


w64_high = st.integers(min_value=2**63, max_value=_W64_MAX)


@given(vals=st.lists(w64_high, min_size=2, max_size=10, unique=True),
       data=st.data())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_word64_high_band_reload_range_filter(spark, tmp_path_factory,
                                              vals, data):
    """r6 verdict task 8 — the 2^63..2^64-1 band (where a signed-int64
    readback would flip negative) through the FULL storage path: CSV
    import → content-addressed save (canonical row encoding,
    hashing.py) → catalog reload → O3 range filter. The reloaded
    DECIMAL(20,0) keys must compare unsigned-numerically so the range
    filter returns exactly the model's answer, and the content hash
    must be identical before save and after reload (the address IS the
    content, independent of physical layout)."""
    from decimal import Decimal

    from messdb_spark.engine import Engine
    from messdb_spark.hashing import table_content_hash
    from messdb_spark.operators.core import KeyBound, range_filter
    from messdb_spark.sources.io import import_csv

    vals = sorted(set(vals) | {2**63, _W64_MAX})
    lo, hi = sorted((data.draw(st.sampled_from(vals), label="lo"),
                     data.draw(st.sampled_from(vals), label="hi")))
    tmp = tmp_path_factory.mktemp("w64hi")
    eng = Engine(spark, str(tmp / "wh"))
    eng.ddl("CREATE TABLE w (k WORD64 PRIMARY KEY, v VARCHAR)")
    src = tmp / "in.csv"
    src.write_text("k,v\n" + "".join(f"{v},s{v}\n" for v in vals))
    t = import_csv(spark, str(src), eng.load_table("w"))
    pre_hash = table_content_hash(t.df)

    eng.save_table("w", t)
    r = eng.load_table("w")
    assert table_content_hash(r.df) == pre_hash

    got = sorted(int(row["k"]) for row in range_filter(
        r, KeyBound((Decimal(lo),)), KeyBound((Decimal(hi),))).df.collect())
    assert got == [v for v in vals if lo <= v <= hi]
