"""Model-based checks for the round-5 deterministic operators: the
Spark pipelines vs pure-Python reference models (the TrieSpec oracle
style, SURVEY.md §5) — a third, independent implementation beside the
Spark query and its DuckDB oracle."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import given, settings, strategies as st


# --- Bloom filter model (mirrors queries/sketches.py md5 exprs) -----------

_BF_M = 1 << 16
_BF_K = 4


def _bf_pos(key: int, seed: int) -> int:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % _BF_M


def _bloom_candidates(build: set[int], probe: set[int]) -> set[int]:
    words: dict[int, int] = {}
    for k in build:
        for s in range(_BF_K):
            p = _bf_pos(k, s)
            words[p >> 5] = words.get(p >> 5, 0) | (1 << (p % 32))
    out = set()
    for k in probe:
        if all((words.get(_bf_pos(k, s) >> 5, 0)
                >> (_bf_pos(k, s) % 32)) & 1 for s in range(_BF_K)):
            out.add(k)
    return out


@given(build=st.sets(st.integers(0, 10**9), max_size=200),
       probe=st.sets(st.integers(0, 10**9), max_size=200))
@settings(max_examples=50, deadline=None)
def test_bloom_model_never_false_negative(build, probe):
    """Every true member passes the filter — the property the query
    body asserts at runtime, here over adversarial random sets."""
    cand = _bloom_candidates(build, probe)
    assert (build & probe) <= cand


def test_bloom_spark_matches_model(spark):
    """The Spark word-table pipeline produces exactly the model's
    candidate set (not just a superset) on a fixed example."""
    from pyspark.sql import functions as F
    from messdb_spark.queries.sketches import _bf_pos_spark, _BF_K

    build = {3, 17, 91, 1234, 999999}
    probe = set(range(0, 2000, 7)) | build
    bdf = spark.createDataFrame([(k,) for k in sorted(build)], "k bigint")
    pdf = spark.createDataFrame([(k,) for k in sorted(probe)], "k bigint")

    def positions(df):
        parts = [df.select("k", F.expr(_bf_pos_spark("k", str(s)))
                           .alias("pos")) for s in range(_BF_K)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    words = (positions(bdf).select("pos").distinct()
             .groupBy(F.expr("shiftright(pos, 5)").alias("word"))
             .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                         "CAST(pos % 32 AS INT)))").alias("wv")))
    hits = (positions(pdf)
            .join(F.broadcast(words),
                  F.expr("shiftright(pos, 5)") == F.col("word"), "left")
            .groupBy("k")
            .agg(F.min(F.when(
                F.col("wv").isNotNull()
                & (F.expr("(shiftright(wv, CAST(pos % 32 AS INT)) & 1)")
                   == 1), 1).otherwise(0)).alias("all_hit")))
    got = {r["k"] for r in hits.filter(F.col("all_hit") == 1).collect()}
    assert got == _bloom_candidates(build, probe)


# --- DDSketch bucket model ------------------------------------------------


def _dds_lb(cents: int) -> int:
    if cents < 32:
        return cents
    k = cents.bit_length() - 1          # == length(bin(c)) - 1
    sub_raw = cents >> (k - 4)
    return sub_raw << (k - 4)


@given(st.lists(st.integers(1, 10**12), min_size=1, max_size=500))
@settings(max_examples=200, deadline=None)
def test_ddsketch_bucket_error_bound(vals):
    """Every value's bucket lower bound is within the guaranteed
    relative error: lb <= v < lb * 17/16 (exact for v < 32)."""
    for v in vals:
        lb = _dds_lb(v)
        assert lb <= v
        if v >= 32:
            assert v * 16 < lb * 17
        else:
            assert lb == v


@given(st.lists(st.integers(1, 10**9), min_size=1, max_size=300),
       st.sampled_from([0.5, 0.9, 0.99]))
@settings(max_examples=100, deadline=None)
def test_ddsketch_quantile_selection_bound(vals, p):
    """The histogram-selected bucket's lower bound brackets the exact
    rank-ceil(p*n) order statistic within the sketch's error."""
    import math
    hist = Counter(_dds_lb(v) for v in vals)
    n = len(vals)
    rk = math.ceil(p * n)
    cum = 0
    for lb in sorted(hist):
        cum += hist[lb]
        if cum >= rk:
            break
    exact = sorted(vals)[rk - 1]
    assert lb <= exact
    assert exact * 16 < lb * 17 or exact < 32


# --- BPE reference model (Sennrich-style) ---------------------------------


def _bpe_model(word_counts: dict[str, int], n_merges: int):
    """Pure-python Sennrich BPE: overlapping pair counts, total-ordered
    argmax, left-to-right non-overlapping merge application."""
    seqs = {w: " ".join(w) for w in word_counts}
    merges = []
    for r in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, n in word_counts.items():
            s = seqs[w].split(" ")
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        if not counts:
            break
        # total order: count DESC then pair ASC
        best = sorted(counts.items(),
                      key=lambda kv: (-kv[1], " ".join(kv[0])))[0]
        pair, total = " ".join(best[0]), best[1]
        merges.append((r, pair, pair.replace(" ", ""), total))
        a, b = best[0]
        for w in seqs:
            s = seqs[w].split(" ")
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = " ".join(out)
    return merges


def test_bpe_query_matches_python_model(spark, sf_dir):
    """Three-way agreement: the Spark query (and via parity its DuckDB
    oracle) must learn the same merges as a literal-python Sennrich
    implementation over the same top-50 word dictionary."""
    import duckdb
    from messdb_spark.queries import QUERIES
    from messdb_spark.queries.tokenizer import _N_MERGES, _TOP_WORDS

    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(list_filter(string_split_regex(lower(text),
                 '\\s+'), x -> regexp_matches(x, '^[a-z]+$'))) AS word
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE length(text) > 0
        ) t GROUP BY word ORDER BY n DESC, word LIMIT {_TOP_WORDS}
        """).fetchall()
    model = _bpe_model(dict(rows), _N_MERGES)
    got = [(r["round"], r["pair"], r["merged"], r["total"]) for r in
           QUERIES["bpe_learn_merges"].fn(spark, sf_dir)
           .orderBy("round").collect()]
    assert got == model


def test_bpe_merge_replace_handles_runs(spark):
    """The bracketed-token replace equals left-to-right non-overlapping
    merging on every run length ('(a)(a)(a)(a)(a)' -> '(aa)(aa)(a)',
    never '(aa)(a)(aa)') and cannot match inside a longer symbol."""
    from pyspark.sql import functions as F
    cases = ["".join(["(a)"] * k) for k in range(1, 9)]
    cases += ["(ba)(a)", "(a)(ab)", "(ab)(ba)"]
    df = spark.createDataFrame([(c,) for c in cases], "seq string")
    got = [r["out"] for r in
           df.select(F.replace(F.col("seq"), F.lit("(a)(a)"),
                               F.lit("(aa)")).alias("out")).collect()]
    for k, out in zip(range(1, 9), got):
        exp = "(aa)" * (k // 2) + "(a)" * (k % 2)
        assert out == exp, f"run of {k}"
    assert got[8:] == ["(ba)(a)", "(a)(ab)", "(ab)(ba)"]


# --- interleave invariants ------------------------------------------------


def test_interleave_epoch_quota(spark, sf_dir):
    """In the generated training order: per (epoch, source) at most w_i
    docs; global position strictly follows the (epoch, snum, slot)
    key; per-source rank order is preserved globally."""
    from messdb_spark.queries import QUERIES
    rows = (QUERIES["training_mix_interleave"].fn(spark, sf_dir)
            .orderBy("global_pos").collect())
    per_epoch: Counter = Counter()
    last_rk: dict[str, int] = {}
    for r in rows:
        w = 1 + int(r["source"].lstrip("src")) % 3
        per_epoch[(r["epoch"], r["source"])] += 1
        assert per_epoch[(r["epoch"], r["source"])] <= w
        assert last_rk.get(r["source"], 0) < r["rk"]
        last_rk[r["source"]] = r["rk"]
    assert [r["global_pos"] for r in rows] == list(range(1, len(rows) + 1))
