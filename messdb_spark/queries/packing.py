"""Dataset-assembly operators: source-mixture sampling and sequence
packing — the two steps between a cleaned corpus (pipeline.py) and
actual pretraining batches.

Both are exact-integer computations so the DuckDB oracles hash-match
bit-for-bit; the only float op is ``sqrt`` (IEEE correctly-rounded on
both engines, floored immediately to an integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import load, query, quantize

_BUDGET = 120          # sampled docs across all sources
_CONTEXT = 512         # tokens per packed context window

_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"
_TOKS_SPARK = "filter(split(text, '\\\\s+'), x -> x != '')"


@query(
    "mixture_sample_by_source",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(floor(sqrt(count(*))) AS BIGINT) AS fs
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(fs) AS BIGINT) AS tot FROM c),
    q AS (SELECT source, ({_BUDGET} * fs) // tot AS quota FROM c, t),
    r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT r.doc_id, r.source FROM r JOIN q USING (source)
    WHERE rn <= quota
    """)
def mixture_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture (the pretraining data-mixing
    step): per-source quota ∝ count^(1/T) with T=2 — sqrt flattens the
    source distribution so small sources are over-represented relative
    to proportional sampling (the standard multilingual/multi-domain
    re-balancing move). Selection within a source is deterministic
    hash-rank (reproducible across runs/engines, unlike TABLESAMPLE).

    Exactness: quota arithmetic is all-integer (floor(sqrt(n)) is
    exact — sqrt is IEEE correctly-rounded, then floored); ranking
    keys are md5 strings. Scale: the quota table is one tiny agg
    (broadcast); ranking is one window whose rank-filter prunes
    map-side (WindowGroupLimit) so only quota winners shuffle —
    same discipline as stratified_sample_per_lang."""
    (d,) = load(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.floor(F.sqrt(F.count(F.lit(1)))).cast("long").alias("fs"))
    t = c.agg(F.sum("fs").cast("long").alias("tot"))
    q = (c.crossJoin(F.broadcast(t))
          .select("source", ((F.lit(_BUDGET) * F.col("fs")) / F.col("tot"))
                  .cast("long").alias("quota")))
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    r = (d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
          # constant upper bound (every quota <= _BUDGET): a LITERAL
          # rank filter triggers WindowGroupLimit, pruning each
          # partition to _BUDGET candidates map-side before the shuffle
          .filter(F.col("rn") <= _BUDGET))
    return (r.join(F.broadcast(q), "source")
             .filter(F.col("rn") <= F.col("quota"))
             .select("doc_id", "source"))


@query(
    "sequence_packing_offsets",
    oracle=f"""
    SELECT doc_id, source,
           CAST(sum(n) OVER w - n AS BIGINT) AS start_offset,
           CAST((sum(n) OVER w - n) // {_CONTEXT} AS BIGINT) AS bin_id
    FROM (SELECT doc_id, source, len({_TOKS_DUCK}) AS n FROM documents)
    WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    """)
def sequence_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concatenate-and-chop): documents concatenate
    in doc_id order per source and chop into {_CONTEXT}-token context
    windows; each doc gets its global token start offset and the
    window (bin) its first token lands in — the packing manifest a
    pretraining loader consumes.

    Scale: a naive ``sum() OVER (PARTITION BY source ORDER BY doc_id)``
    funnels each source through ONE partition (source cardinality is
    fixed — the q11 lesson). Implemented instead as a two-level
    distributed prefix-sum: (1) intra-shard running sums with shard =
    doc_id // 4096 — shard count GROWS with the data, so these windows
    parallelize; (2) per-shard totals (4096× smaller) get their own
    exclusive prefix sum and broadcast back as shard base offsets. At
    another 1000× the shard-totals level recurses the same way. All
    integer arithmetic — exact parity with the single-window oracle."""
    (d,) = load(spark, sf_dir, "documents")
    toks = F.size(F.expr(_TOKS_SPARK)).cast("long")
    base = d.select("doc_id", "source", toks.alias("n"),
                    (F.col("doc_id") / 4096).cast("long").alias("shard"))
    # (1) running sum WITHIN each (source, shard) — parallel width
    # grows with the data
    w_in = W.partitionBy("source", "shard").orderBy("doc_id")
    intra = base.withColumn("intra_end", F.sum("n").over(w_in))
    # (2) exclusive prefix over the per-shard totals (tiny relation)
    shard_tot = (base.groupBy("source", "shard")
                     .agg(F.sum("n").alias("tot")))
    w_sh = W.partitionBy("source").orderBy("shard")
    shard_base = shard_tot.select(
        "source", "shard",
        (F.sum("tot").over(w_sh) - F.col("tot")).alias("base"))
    out = (intra.join(F.broadcast(shard_base), ["source", "shard"])
                .select("doc_id", "source",
                        (F.col("base") + F.col("intra_end") - F.col("n"))
                        .alias("start_offset")))
    return out.withColumn(
        "bin_id", F.floor(F.col("start_offset") / _CONTEXT).cast("long"))


_APPORTION_BUDGET = 1000


@query(
    "token_budget_apportionment",
    oracle=f"""
    WITH c AS (
      SELECT source,
             CAST(sum(len({_TOKS_DUCK})) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM c),
    q AS (
      SELECT source, toks,
             ({_APPORTION_BUDGET} * toks) // total AS base,
             ({_APPORTION_BUDGET} * toks) % total AS rem
      FROM c, t
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk,
             {_APPORTION_BUDGET} - sum(base) OVER () AS leftover
      FROM q
    )
    SELECT source, toks,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM ranked
    """)
def token_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a {budget}-unit
    token budget across sources ∝ their token mass — the exact-integer
    allocation step of dataset mixing: floors alone under-fill the
    budget, naive rounding over/under-shoots; largest-remainder hands
    the leftover units to the sources with the biggest fractional
    claims (deterministic source-name tie-break), so quotas sum to the
    budget EXACTLY — an invariant float weights cannot give you.

    Scale: token counting is the only corpus pass (map-side combined);
    apportionment runs on the source-level relation (domain-bounded),
    and every step is integer div/mod — the whole allocation
    hash-checks."""
    (d,) = load(spark, sf_dir, "documents")
    toks = F.size(F.expr(_TOKS_SPARK)).cast("long")
    c = d.groupBy("source").agg(F.sum(toks).cast("long").alias("toks"))
    t = c.agg(F.sum("toks").cast("long").alias("total"))
    q = (c.crossJoin(F.broadcast(t))
          .select("source", "toks",
                  F.expr(f"({_APPORTION_BUDGET} * toks) DIV total")
                   .alias("base"),
                  F.expr(f"({_APPORTION_BUDGET} * toks) % total")
                   .alias("rem")))
    w = W.orderBy(F.col("rem").desc(), "source")
    wall = W.partitionBy()
    ranked = q.select(
        "source", "toks", "base",
        F.row_number().over(w).alias("rk"),
        (F.lit(_APPORTION_BUDGET) - F.sum("base").over(wall))
         .alias("leftover"))
    return ranked.select(
        "source", "toks",
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1)
                          .otherwise(0)).cast("long").alias("quota"))


token_budget_apportionment.__doc__ = \
    token_budget_apportionment.__doc__.format(budget=_APPORTION_BUDGET)


_LB_BUCKETS = (64, 128, 256, 512, 1024, 2048)   # length-bucket bounds
_LB_MAXLEN = 2048                                # hard truncation cap


@query(
    "length_bucketed_batching",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             least(len({_TOKS_DUCK}), {_LB_MAXLEN}) AS n_tokens
      FROM documents WHERE length(text) > 0
    ),
    bucketed AS (
      SELECT doc_id, n_tokens,
             CASE {" ".join(f"WHEN n_tokens <= {b} THEN {b}"
                            for b in _LB_BUCKETS)}
                  ELSE {_LB_MAXLEN} END AS bucket
      FROM docs
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_len,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS bucket_pad_tokens,
           CAST(count(*) * {_LB_MAXLEN} - sum(n_tokens) AS BIGINT)
             AS unbucketed_pad_tokens,
           floor((CAST(count(*) * max(n_tokens) - sum(n_tokens) AS DOUBLE)
                  / (count(*) * max(n_tokens)))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS pad_frac
    FROM bucketed GROUP BY bucket
    """)
def length_bucketed_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit — the padding-waste readout that
    justifies bucketed batch construction: docs group into power-of-2
    length buckets ({", ".join(map(str, _LB_BUCKETS))}); per bucket,
    the padding cost of batching at the bucket's own max length vs
    padding everything to the global {_LB_MAXLEN} cap. The
    ``unbucketed − bucketed`` padding delta is compute saved per epoch
    (padding tokens burn FLOPs and contribute nothing) — typically
    the single cheapest throughput win in a training pipeline, and
    this relation is the evidence a pipeline records before adopting
    it. Complements ``sequence_packing_offsets`` (packing removes
    padding entirely; bucketing is the simpler change that keeps
    example boundaries).

    Scale: one token-count pass (map-side combined), bucket-bounded
    output; all integers exact."""
    (d,) = load(spark, sf_dir, "documents")
    n_tokens = F.least(F.size(F.expr(_TOKS_SPARK)), F.lit(_LB_MAXLEN))
    bucket = F.coalesce(
        *[F.when(n_tokens <= b, F.lit(b)) for b in _LB_BUCKETS],
        F.lit(_LB_MAXLEN))
    docs = (d.filter(F.length("text") > 0)
             .select(n_tokens.alias("n_tokens"), bucket.alias("bucket")))
    cnt = F.count(F.lit(1))
    pad = (cnt * F.max("n_tokens") - F.sum("n_tokens")).cast("long")
    return (docs.groupBy(F.col("bucket").cast("long").alias("bucket"))
            .agg(cnt.alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("real_tokens"),
                 F.max("n_tokens").cast("long").alias("max_len"),
                 pad.alias("bucket_pad_tokens"),
                 (cnt * _LB_MAXLEN - F.sum("n_tokens")).cast("long")
                   .alias("unbucketed_pad_tokens"),
                 quantize(pad.cast("double")
                          / (cnt * F.max("n_tokens")), 4)
                   .alias("pad_frac")))
