"""Tokenizer training: distributed byte-pair-encoding merge learning.

The LLM-pipeline step the regex tokenizers (text.py:bpe_tokens_regex)
only approximate: BPE *learns* its merge table from corpus statistics.
Each round counts adjacent symbol pairs weighted by word frequency,
adopts the most frequent pair as a new symbol, and rewrites the word
inventory — exactly the sequential algorithm of Sennrich et al., run
with Spark doing the heavy counting.

Determinism discipline (the PageRank/count-min pattern): every round's
argmax uses a total order (count DESC, pair ASC), merges apply as ONE
plain string replace over paren-bracketed symbol sequences (exact
left-to-right non-overlapping application, no regex, no locale), and
the oracle UNROLLS the same rounds as chained CTEs — so the learned
merge table hash-checks across engines.

Scale: the word-frequency dictionary is the only state (vocab-bounded,
NOT corpus-bounded — 100 TB of text still collapses to a few million
distinct words); pair counting is a map + vocab-sized agg per round;
the per-round argmax is a 1-row collect (bounded artifact); applying a
merge is a narrow projection. Rounds are inherently sequential — that
is BPE, not a Spark limitation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, load

_N_MERGES = 5
_TOP_WORDS = 50

# paren-delimited symbol sequence: 'abc' -> '(a)(b)(c)'. A merge of
# (a, b) is then ONE plain replace of '(a)(b)' with '(ab)', and
# because every token is fully bracketed the replace is exactly
# Sennrich's left-to-right non-overlapping application — adjacent
# matches share no characters (space-sentinel encodings fail this on
# runs: ' a a a a a ' -> ' aa a aa ', not ' aa aa a ').
_SEQ_INIT_SPARK = "regexp_replace(word, '(.)', '($1)')"
_SEQ_INIT_DUCK = "regexp_replace(word, '(.)', '(\\1)', 'g')"
# symbols list back out of the bracketed form
_SYMS_SPARK = "split(substring(seq, 2, length(seq) - 2), '\\\\)\\\\(')"
_SYMS_DUCK = "string_split(substring(seq, 2, length(seq) - 2), ')(')"


def _bpe_oracle() -> str:
    """Unrolled BPE rounds as chained CTEs (the PageRank move: the
    iterative algorithm is replayed in pure SQL so the driver can
    hash-check the learned merges)."""
    ctes = [f"""
    w0 AS MATERIALIZED (
      SELECT word, n, {_SEQ_INIT_DUCK} AS seq FROM (
        SELECT word, count(*) AS n FROM (
          SELECT unnest(list_filter(string_split_regex(lower(text),
                 '\\s+'), x -> regexp_matches(x, '^[a-z]+$'))) AS word
          FROM documents WHERE length(text) > 0
        ) t GROUP BY word ORDER BY n DESC, word LIMIT {_TOP_WORDS}
      ) w
    )"""]
    for r in range(1, _N_MERGES + 1):
        p = r - 1
        ctes.append(f"""
    p{r} AS MATERIALIZED (
      SELECT pair, sum(n * cnt) AS total FROM (
        SELECT n, pair, count(*) AS cnt FROM (
          SELECT n, unnest(list_transform(range(1, len(s)),
                 i -> s[i] || ' ' || s[i + 1])) AS pair
          FROM (SELECT n, {_SYMS_DUCK} AS s FROM w{p})
          WHERE len(s) >= 2
        ) GROUP BY n, pair
      ) GROUP BY pair
    ),
    m{r} AS MATERIALIZED (
      SELECT pair, total FROM p{r} ORDER BY total DESC, pair LIMIT 1
    ),
    w{r} AS MATERIALIZED (
      SELECT word, n,
             replace(seq,
               (SELECT '(' || replace(pair, ' ', ')(') || ')' FROM m{r}),
               (SELECT '(' || replace(pair, ' ', '') || ')' FROM m{r}))
               AS seq
      FROM w{p}
    )""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, pair, replace(pair, ' ', '') AS merged, "
        f"CAST(total AS BIGINT) AS total FROM m{r}"
        for r in range(1, _N_MERGES + 1))
    return ("WITH " + ",".join(ctes)
            + f"\n    SELECT CAST(round AS BIGINT) AS round, pair, "
              f"merged, total FROM ({unions}) u")


def _learn_merges(spark: SparkSession, sf_dir: str):
    """The merge-learning loop shared by ``bpe_learn_merges`` (returns
    the merge table) and ``bpe_encode_docs`` (returns the final
    segmented word inventory). See ``bpe_learn_merges`` for the
    algorithm and determinism discussion."""
    (doc,) = load(spark, sf_dir, "documents")
    words = (doc.filter(F.length("text") > 0)
                .select(F.explode(F.expr(
                    "filter(split(lower(text), '\\\\s+'), "
                    "x -> x rlike '^[a-z]+$')")).alias("word"))
                .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), "word").limit(_TOP_WORDS)
                .select("word", "n", F.expr(_SEQ_INIT_SPARK).alias("seq"))
                .localCheckpoint(eager=True))   # tiny: <= 50 rows
    merges = []
    for r in range(1, _N_MERGES + 1):
        pairs = (words.select("n", F.expr(_SYMS_SPARK).alias("s"))
                      .filter(F.size("s") >= 2)
                      .select("n", F.explode(F.expr(
                          "transform(sequence(1, size(s) - 1), i -> "
                          "concat(element_at(s, i), ' ', "
                          "element_at(s, i + 1)))")).alias("pair"))
                      .groupBy("pair").agg(F.sum("n").alias("total")))
        top = pairs.orderBy(F.col("total").desc(), "pair").limit(1) \
                   .collect()[0]
        a, b = top["pair"].split(" ")
        merges.append((r, top["pair"], a + b, int(top["total"])))
        seq = F.replace(F.col("seq"), F.lit(f"({a})({b})"),
                        F.lit(f"({a}{b})"))
        words = (words.select("word", "n", seq.alias("seq"))
                      .localCheckpoint(eager=True))
    return words, merges


@query("bpe_learn_merges", oracle=_bpe_oracle())
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the corpus's first {N} BPE merges over its top-{W} [a-z]+
    words (frequency-weighted, Sennrich-style). Output: the merge
    table (round, pair, merged symbol, weighted pair count) — the
    artifact a tokenizer trainer persists.

    Each round: vocab-bounded pair count -> total-ordered argmax
    (1-row collect) -> one bracketed-token replace over the word
    inventory (exact left-to-right non-overlapping application). The
    oracle unrolls the same rounds as CTEs, so the driver hash-checks
    the whole trajectory, not just round 1."""
    _, merges = _learn_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "round bigint, pair string, merged string, total bigint")


def _bpe_encode_oracle() -> str:
    """Learn-chain CTEs + per-document token accounting."""
    chain = _bpe_oracle().split("\n    SELECT CAST(round")[0]  # WITH ... w{N}
    # _bpe_oracle returns "WITH <ctes> SELECT ..." — rebuild from parts
    return f"""{chain}
    , seg AS (SELECT word, len({_SYMS_DUCK}) AS t FROM w{_N_MERGES})
    , dw AS (
      SELECT doc_id, word, count(*) AS c FROM (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
               '\\s+'), x -> regexp_matches(x, '^[a-z]+$'))) AS word
        FROM documents WHERE length(text) > 0
      ) t GROUP BY doc_id, word
    )
    SELECT dw.doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           CAST(sum(c * coalesce(seg.t, length(dw.word)))
                AS BIGINT) AS n_bpe_tokens
    FROM dw LEFT JOIN seg USING (word)
    GROUP BY dw.doc_id
    """


@query("bpe_encode_docs", oracle=_bpe_encode_oracle())
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE with the learned tokenizer: per document, word count and
    BPE token count under the merge table ``bpe_learn_merges``
    produces — the token-budget accounting step between tokenizer
    training and batch packing (``sequence_packing_offsets``).

    The corpus is never re-segmented row by row: encoding factors
    through the VOCABULARY — the final segmented word inventory (word
    → token count) broadcasts, and each document's token count is
    Σ c_word · tokens(word) over its (doc, word) counts. Words outside
    the learned inventory fall back to character-level (one token per
    char) — real BPE's unknown-word behavior, exercised here because
    learning is capped at the top-{W} words.

    Scale: one explode+count pass over text (map-side combined), one
    broadcast join against a vocab-bounded dim, one hash agg by
    doc_id. The seq column stays bracketed symbols throughout — token
    counts come from the SAME representation the trainer built, so
    encode and train can never drift apart."""
    words, _ = _learn_merges(spark, sf_dir)
    seg = words.select("word", F.size(F.expr(_SYMS_SPARK)).alias("t"))
    (doc,) = load(spark, sf_dir, "documents")
    dw = (doc.filter(F.length("text") > 0)
             .select("doc_id", F.explode(F.expr(
                 "filter(split(lower(text), '\\\\s+'), "
                 "x -> x rlike '^[a-z]+$')")).alias("word"))
             .groupBy("doc_id", "word")
             .agg(F.count(F.lit(1)).alias("c")))
    return (dw.join(F.broadcast(seg), "word", "left")
              .groupBy("doc_id")
              .agg(F.sum("c").cast("long").alias("n_words"),
                   F.sum(F.col("c") * F.coalesce(F.col("t"),
                                                 F.length("word")))
                    .cast("long").alias("n_bpe_tokens")))
