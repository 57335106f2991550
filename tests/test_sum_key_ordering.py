"""Sum-type key ordering equivalence (VERDICT r12 stretch #8).

The reference orders composite keys by their serialized BYTES
(``messdb-schema/src/MessDB/Table/Types.hs``): a sum-type key is the
constructor index as a 4-byte big-endian Word32 (``Types.hs:193-259``,
the ``:+:`` instance numbering constructors left to right) followed by
the constructor's field encodings — Int64 as offset-binary big-endian
(``Types.hs:81-82``), Text as UTF-8 through the base-7 continuation
scheme (``Types.hs:141-183``). The repo's documented non-goal
(COVERAGE.md §Non-goals) claims Spark's relational representation —
a (tag, payload...) composite key under per-column lexicographic
ordering (``operators/core.py`` ``KeyBound``) — induces the SAME total
order, so no byte-level codec is needed. This file retires that claim
with evidence instead of prose:

1. property: the reference's byte order over generated sum values
   equals tuple order (tag, fields), with each field compared the way
   Spark compares that column type (ints numeric, strings by UTF-8
   bytes — Spark's UTF8_BINARY default collation);
2. the base-7 ByteString scheme is order-preserving and prefix-safe
   (the 0x00 terminator sorts below every 0x80-or-above continuation
   byte), checked over adversarial prefix-heavy inputs;
3. a Spark leg: ``orderBy(tag, i, s)`` over a (tag, int, string) sum
   relation reproduces the byte order exactly. NULL payload columns
   of the OTHER constructor never matter: the tag decides first, and
   equal tags populate identical column sets.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st


# -- reference encoders, reimplemented from Types.hs ---------------------

def _enc_int64(x: int) -> bytes:
    """Int64: putWord64be (x + minBound) — offset binary (Types.hs:81)."""
    return struct.pack(">Q", (x + 2**63) % 2**64)


def _enc_bytes_base7(bs: bytes) -> bytes:
    """ByteString: base-7 big-endian, MSB set on every data byte, one
    0x00 terminator (Types.hs:141-161). Reimplemented from the spec in
    the comment: each group of ≤7 input bytes becomes (n+1) output
    bytes carrying the 7·n+n bits left-aligned."""
    out = bytearray()
    i = 0
    n_total = len(bs)
    while i < n_total:
        n = min(7, n_total - i)
        carry = 0
        for k in range(n):
            b = bs[i + k]
            out.append(0x80 | carry | (b >> (k + 1)))
            carry = (b & ((1 << (k + 1)) - 1)) << (6 - k)
        out.append(0x80 | carry)
        i += 7
    out.append(0x00)
    return bytes(out)


def _enc_text(s: str) -> bytes:
    return _enc_bytes_base7(s.encode("utf-8"))


def _enc_sum(tag: int, fields: tuple) -> bytes:
    """Sum key: Word32 BE constructor index ++ field encodings
    (Types.hs:211-240: putGenericConstructorTableKey)."""
    out = struct.pack(">I", tag)
    for f in fields:
        if isinstance(f, int):
            out += _enc_int64(f)
        elif isinstance(f, str):
            out += _enc_text(f)
        else:
            raise TypeError(type(f))
    return out


# -- 1: byte order == (tag, fields) tuple order ---------------------------

# three constructors with distinct shapes: C0(Int64), C1(Text),
# C2(Int64, Text) — the relational representation is
# (tag, c0_i, c1_s, c2_i, c2_s) with NULLs off-constructor
_SUM = st.one_of(
    st.tuples(st.just(0), st.tuples(
        st.integers(min_value=-2**63, max_value=2**63 - 1))),
    st.tuples(st.just(1), st.tuples(st.text(max_size=12))),
    st.tuples(st.just(2), st.tuples(
        st.integers(min_value=-2**63, max_value=2**63 - 1),
        st.text(max_size=8))),
)


def _spark_tuple_key(tag: int, fields: tuple):
    """The composite-key comparison Spark performs: tag first, then
    the constructor's columns in declaration order — ints numeric,
    strings as UTF-8 bytes (UTF8_BINARY collation)."""
    return (tag,) + tuple(
        f.encode("utf-8") if isinstance(f, str) else f for f in fields)


@given(st.lists(_SUM, min_size=2, max_size=20))
@settings(max_examples=300, deadline=None)
def test_sum_byte_order_equals_tuple_order(values):
    by_bytes = sorted(values, key=lambda v: _enc_sum(v[0], v[1]))
    by_tuple = sorted(values, key=lambda v: _spark_tuple_key(v[0], v[1]))
    assert [_spark_tuple_key(t, f) for t, f in by_bytes] == \
        [_spark_tuple_key(t, f) for t, f in by_tuple]


# -- 2: base-7 text codec is order-preserving and prefix-safe -------------

@given(st.lists(st.binary(max_size=18), min_size=2, max_size=16))
@settings(max_examples=300, deadline=None)
def test_base7_bytes_preserve_order(blobs):
    enc = sorted(blobs, key=_enc_bytes_base7)
    raw = sorted(blobs)
    assert enc == raw


def test_base7_prefix_terminator_sorts_first():
    # "ab" < "ab\x00" < "abc": the 0x00 terminator must sort below any
    # continuation byte (all ≥ 0x80) — the prefix-safety the scheme's
    # trailing zero byte exists for
    vals = [b"ab", b"ab\x00", b"abc", b"a", b"", b"\x00", b"\xff" * 8]
    assert sorted(vals, key=_enc_bytes_base7) == sorted(vals)
    # round-trip-free sanity: distinct inputs encode distinctly
    assert len({_enc_bytes_base7(v) for v in vals}) == len(vals)


@given(st.lists(st.text(max_size=10), min_size=2, max_size=12))
@settings(max_examples=200, deadline=None)
def test_text_keys_match_utf8_binary_collation(texts):
    # Spark UTF8_BINARY compares UTF-8 bytes; UTF-8 preserves code
    # point order, and base-7 preserves byte order — so all three
    # agree
    assert (sorted(texts, key=_enc_text)
            == sorted(texts, key=lambda s: s.encode("utf-8")))


# -- 3: the engine leg — Spark orderBy == reference byte order ------------

@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_SUM, min_size=2, max_size=12, unique=True))
def test_spark_composite_orderby_matches_byte_order(spark, values):
    rows = []
    for i, (tag, fields) in enumerate(values):
        c0_i = fields[0] if tag == 0 else None
        c1_s = fields[0] if tag == 1 else None
        c2_i = fields[0] if tag == 2 else None
        c2_s = fields[1] if tag == 2 else None
        rows.append((i, tag, c0_i, c1_s, c2_i, c2_s))
    df = spark.createDataFrame(
        rows, "rid bigint, tag int, c0_i bigint, c1_s string, "
              "c2_i bigint, c2_s string")
    got = [r["rid"] for r in
           df.orderBy("tag", "c0_i", "c1_s", "c2_i", "c2_s", "rid")
             .collect()]
    want = [i for i, _ in sorted(
        enumerate(values),
        key=lambda iv: (_enc_sum(iv[1][0], iv[1][1]), iv[0]))]
    assert got == want
