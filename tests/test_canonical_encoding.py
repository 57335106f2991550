"""Canonical row encoding vs an independent reimplementation at the
type edges (VERDICT r7 #6, SURVEY §7 risk 1).

``hashing._canon_col`` is the single point every content digest
(CAS identity, memo keys, bucket diffs) depends on. Three properties,
each against an engine-independent check:

1. **Cross-engine round-trip stability** — ``table_content_hash`` must
   be invariant under repartitioning, row order, a Spark-parquet
   round-trip, AND a DuckDB rewrite of that parquet (DuckDB reads the
   file and COPYs a new one; values must survive bit-exactly:
   NaN, -0.0, ±Inf, denormals, surrogate-adjacent unicode, NUL bytes,
   empty-vs-NULL binary, micro-precision timestamps).
2. **Injectivity at the edges** — multisets that differ only in an
   edge value (NULL vs the NULL-sentinel string, empty vs NULL binary,
   -0.0 vs 0.0, separator-forging NULs) must digest differently.
3. **Independent digest reimplementation** — rows are read back from
   the parquet by DUCKDB (independent decoder), canonically encoded by
   a pure-Python mirror of ``_canon_col``, hashed by a pure-Python
   XXH64 (verified bit-compatible with Spark's ``xxhash64``), and
   combined by a reimplementation of the count/sum/xor/sha256 digest —
   the result must equal Spark's ``table_content_hash``.

Doubles in property 3 are drawn from dyadic rationals in Java's
plain-decimal range [1e-3, 1e7) plus special values: Java 17's
``Double.toString`` (pre-Ryū FloatingDecimal) can emit different
shortest-digit strings than Python ``repr`` outside that set; the
full double space is still covered by properties 1-2, which never
compare decimal renderings across languages.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import math
import os
import struct

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from messdb_spark.hashing import table_content_hash

SPARK_SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture])

# --------------------------------------------------------------------------
# pure-Python XXH64, bit-compatible with Spark's xxhash64 (verified for
# string columns at seed 42 and the chained int-literal second arg)
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _rnd(acc, inp):
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed & _M, (seed - _P1) & _M
        while i <= n - 32:
            v1 = _rnd(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _rnd(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _rnd(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _rnd(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _rnd(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _rnd(0, struct.unpack_from("<Q", data, i)[0]), 27)
             * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((struct.unpack_from("<I", data, i)[0] * _P1) & _M),
                   23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    return h ^ (h >> 32)


def _spark_xxhash64_string(s: str) -> int:
    """Spark F.xxhash64(col) on a string column (seed 42)."""
    return _xxh64(s.encode("utf-8"), 42)


def _spark_xxhash64_string_int1(s: str) -> int:
    """Spark F.xxhash64(col, lit(1)): chained — the string's hash
    seeds the 4-byte int hash."""
    return _xxh64(struct.pack("<i", 1), _xxh64(s.encode("utf-8"), 42))


# --------------------------------------------------------------------------
# pure-Python mirror of hashing._canon_col for deterministic-format types
# --------------------------------------------------------------------------

_NULL = "\x00N"
_SEP = "\x00|"


def _canon_py(v, typ: str) -> str:
    if v is None:
        return _NULL
    if typ == "boolean":
        s = "true" if v else "false"
    elif typ == "binary":
        s = bytes(v).hex().upper()
    elif typ == "timestamp":
        s = v.strftime("%Y-%m-%d %H:%M:%S.%f")
    elif typ == "date":
        s = v.isoformat()
    elif typ == "double":
        # only called for the dyadic plain-range pool + specials where
        # Java 17 Double.toString and this rendering provably agree
        if math.isnan(v):
            s = "NaN"
        elif math.isinf(v):
            s = "Infinity" if v > 0 else "-Infinity"
        else:
            s = repr(float(v))
            if "e" in s or "E" in s:
                raise AssertionError(f"double {v!r} outside plain range")
            if "." not in s:
                s += ".0"
    else:   # int / long / string
        s = str(v)
    return s.replace("\x00", "\x00E")


def _digest_py(rows: list[list], cols: list[str], types: dict[str, str]) -> str:
    """Independent reimplementation of table_content_hash over python
    values (schema fingerprint + count/sum/xor digest combine)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    enc = [_SEP.join(_canon_py(r[i], types[cols[i]]) for i in order)
           for r in rows]
    h1 = [_spark_xxhash64_string(e) for e in enc]
    h2 = [_spark_xxhash64_string_int1(e) for e in enc]

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    def wrap(tot):
        return str(tot % (1 << 64))

    x1 = 0
    for h in h1:
        x1 ^= h
    x2 = 0
    for h in h2:
        x2 ^= h
    fields = sorted((c, types[c]) for c in cols)
    schema_fp = hashlib.sha256(
        json.dumps(fields, sort_keys=True).encode()).hexdigest()
    payload = json.dumps({
        "n": len(rows),
        "s1": wrap(sum(signed(h) for h in h1)),
        "x1": wrap(signed(x1)),
        "s2": wrap(sum(signed(h) for h in h2)),
        "x2": wrap(signed(x2)),
        "schema": schema_fp,
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()


# --------------------------------------------------------------------------
# strategies
# --------------------------------------------------------------------------

_EDGE_DOUBLES = [float("nan"), float("inf"), float("-inf"), -0.0, 0.0,
                 5e-324, -5e-324, 1.7976931348623157e308, 1e-310]
_EDGE_STRINGS = ["", "\x00", "\x00N", "\x00|", "a\x00Eb", "NaN", "null",
                 "퟿", "🎉́é", " lead", "trail "]

_any_double = st.one_of(st.sampled_from(_EDGE_DOUBLES),
                        st.floats(allow_nan=True, allow_infinity=True))
_any_string = st.one_of(
    st.sampled_from(_EDGE_STRINGS),
    st.text(alphabet=st.characters(codec="utf-8"), max_size=20))
_any_binary = st.one_of(st.just(b""), st.binary(max_size=16))
_ts = st.datetimes(min_value=datetime.datetime(1970, 1, 2),
                   max_value=datetime.datetime(2100, 1, 1))

_full_row = st.tuples(st.integers(-2**63, 2**63 - 1), _any_double,
                      st.none() | _any_string, st.none() | _any_binary, _ts)
_FULL_SCHEMA = "i long, d double, s string, b binary, t timestamp"

# property-3 pool: dyadic doubles in Java's plain-decimal range
_dyadic = st.builds(
    lambda m, k: m / float(1 << k),
    st.integers(1, 10**7 - 1), st.integers(0, 6),
).filter(lambda v: 1e-3 <= abs(v) < 1e7)
_safe_double = st.one_of(
    st.sampled_from([float("nan"), float("inf"), float("-inf"), 0.0, -0.0]),
    _dyadic, _dyadic.map(lambda v: -v))
import decimal

_decimal = st.integers(-10**16 + 1, 10**16 - 1).map(
    lambda c: decimal.Decimal(c).scaleb(-2))   # decimal(18,2) cents

_safe_row = st.tuples(st.integers(-2**63, 2**63 - 1),
                      st.none() | _safe_double,
                      st.none() | _any_string, st.none() | _any_binary,
                      st.none() | _ts, st.booleans(),
                      st.dates(min_value=datetime.date(1, 1, 1),
                               max_value=datetime.date(9999, 12, 31)),
                      st.none() | _decimal)
_SAFE_SCHEMA = ("i long, d double, s string, b binary, t timestamp, "
                "bo boolean, dt date, dc decimal(18,2)")
# values are Spark dataType.simpleString() names — the schema
# fingerprint hashes these exact strings (hashing.schema_fingerprint)
_SAFE_TYPES = {"i": "bigint", "d": "double", "s": "string", "b": "binary",
               "t": "timestamp", "bo": "boolean", "dt": "date",
               "dc": "decimal(18,2)"}


def _mkdf(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# 1. cross-engine round-trip stability
# --------------------------------------------------------------------------

@given(rows=st.lists(_full_row, min_size=1, max_size=8))
@SPARK_SETTINGS
def test_hash_survives_duckdb_rewrite(spark, tmp_path_factory, rows):
    df = _mkdf(spark, rows, _FULL_SCHEMA)
    h0 = table_content_hash(df)
    assert table_content_hash(df.repartition(7)) == h0
    assert table_content_hash(df.orderBy("d", "s")) == h0

    d = tmp_path_factory.mktemp("rt")
    p_spark, p_duck = str(d / "a.parquet"), str(d / "b.parquet")
    df.write.mode("overwrite").parquet(p_spark)
    assert table_content_hash(spark.read.parquet(p_spark)) == h0

    con = duckdb.connect()
    con.execute(f"COPY (SELECT * FROM read_parquet('{p_spark}/*.parquet')) "
                f"TO '{p_duck}' (FORMAT PARQUET)")
    back = spark.read.schema(df.schema).parquet(p_duck)
    assert table_content_hash(back) == h0, (
        "DuckDB parquet rewrite changed the content digest — the "
        "canonical encoding is not engine-stable for these rows: "
        f"{rows!r}")


# --------------------------------------------------------------------------
# 2. injectivity at the edges
# --------------------------------------------------------------------------

_EDGE_PAIRS = [
    # NULL vs values that could forge the NULL sentinel / separator
    ([("x",), (None,)], [("x",), ("\x00N",)], "s string"),
    ([("\x00|",)], [("\x00E|",)], "s string"),
    ([("a\x00", "b")], [("a", "\x00b")], "s string, t string"),
    # empty vs NULL binary
    ([(b"",)], [(None,)], "b binary"),
    # -0.0 vs 0.0 (distinct bit patterns → distinct content, like the
    # reference's byte-encoded keys)
    ([(-0.0,)], [(0.0,)], "d double"),
    # NaN is a VALUE (groupable), distinct from NULL
    ([(float("nan"),)], [(None,)], "d double"),
    # timestamp micro precision
    ([(datetime.datetime(2024, 1, 1, 0, 0, 0, 1),)],
     [(datetime.datetime(2024, 1, 1, 0, 0, 0, 0),)], "t timestamp"),
    # duplicate multiplicity matters
    ([("a",), ("a",)], [("a",)], "s string"),
]


@pytest.mark.parametrize("rows_a,rows_b,schema", _EDGE_PAIRS)
def test_edge_multisets_digest_distinct(spark, rows_a, rows_b, schema):
    ha = table_content_hash(_mkdf(spark, rows_a, schema))
    hb = table_content_hash(_mkdf(spark, rows_b, schema))
    assert ha != hb, f"collision: {rows_a!r} vs {rows_b!r}"


# --------------------------------------------------------------------------
# 3. independent digest reimplementation over DuckDB-read values
# --------------------------------------------------------------------------

@given(rows=st.lists(_safe_row, min_size=1, max_size=8))
@SPARK_SETTINGS
def test_digest_matches_python_reimpl_via_duckdb(spark, tmp_path_factory,
                                                 rows):
    df = _mkdf(spark, rows, _SAFE_SCHEMA)
    h_spark = table_content_hash(df)

    d = tmp_path_factory.mktemp("reimpl")
    path = str(d / "t.parquet")
    df.write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    cols = df.columns
    got = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet('{path}/*.parquet')"
    ).fetchall()
    h_py = _digest_py([list(r) for r in got], cols, _SAFE_TYPES)
    assert h_py == h_spark, (
        f"independent digest mismatch for rows {rows!r}")
