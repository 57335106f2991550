"""Cross-engine deterministic expression builders.

The engine's sketches and hash families (count-min, Bloom, HLL, k-fold
splits, weighted sampling) all need hashes and bit arithmetic that
evaluate BIT-IDENTICALLY on Spark and on the DuckDB oracle. Exactly
one hash qualifies — md5 — and these builders are the single home for
the md5-to-integer idiom and its portability notes.

The reference has no function surface at all (SURVEY.md §2.7: zero
built-in scalar functions; computation arrives as named user
TransformFunc/FoldFuncs, `messdb-base/src/MessDB/Trie.hs:513-521`);
this module is the engine's analog of that named-function discipline
for the cross-engine-deterministic subset.

Portability notes (each verified by the oracle parity suite):
- ``md5(x)`` over the same UTF-8 bytes agrees everywhere; 15 hex chars
  = 60 bits always fits BIGINT.
- Spark hex->int is ``conv(h, 16, 10)``; DuckDB is ``CAST('0x'||h AS
  BIGINT)``. (DuckDB's conv() does not exist; Spark cannot cast '0x'
  prefixes.)
- ``length(bin(x)) - 1`` is floor(log2(x)) for positive x on BOTH
  engines (both print unpadded binary) — the no-libm log that keeps
  HLL rho / DDSketch buckets integer-exact.
- Shift amounts must be INT in Spark (``shiftleft(x, CAST(n AS
  INT))``); DuckDB shifts by BIGINT natively.
- Keep packed bit positions < 2^62: ``1 << 63`` overflows signed
  BIGINT on DuckDB (error) while Spark wraps negative — pack 32 bits
  per word when words feed bit_or aggregates.
"""

from __future__ import annotations


def md5_int60_spark(expr: str) -> str:
    """Spark SQL: first 60 bits of md5(expr) as a non-negative BIGINT."""
    return (f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)")


def md5_int60_duck(expr: str) -> str:
    """DuckDB SQL: byte-identical twin of :func:`md5_int60_spark`."""
    return (f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)")


def seeded_key_spark(seed: str, key_expr: str) -> str:
    """'seed:key' hash input, Spark side (CASTs make any type portable)."""
    return (f"concat(CAST({seed} AS STRING), ':', "
            f"CAST({key_expr} AS STRING))")


def seeded_key_duck(seed: str, key_expr: str) -> str:
    return (f"concat(CAST({seed} AS VARCHAR), ':', "
            f"CAST({key_expr} AS VARCHAR))")


def floor_log2_spark(expr: str) -> str:
    """floor(log2(x)) for positive integer x, no libm involved."""
    return f"(length(bin({expr})) - 1)"


def floor_log2_duck(expr: str) -> str:
    return f"(length(bin({expr})) - 1)"
