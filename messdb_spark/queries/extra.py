"""Additional coverage batch: full window-rank suite, BPE-ish regex
tokenization, rolling-hash fingerprinting, DISTINCT dedup, and
embedding near-dup through LSH buckets (the composed scale pattern:
bucket prefilter → exact cosine only within buckets)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize


@query(
    "rank_functions_suite",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           floor((percent_rank() OVER w) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS prk,
           floor((cume_dist() OVER w) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """)
def rank_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite: dense_rank / ntile / percent_rank /
    cume_dist over a deterministic total order. One shuffle+sort per
    partition key — all four functions share the same window frame, so
    Spark evaluates them in a single Window operator."""
    (o,) = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(),
                                               F.col("o_orderkey"))
    return o.select(
        "o_orderkey", "o_orderstatus",
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
        quantize(F.percent_rank().over(w), 6).alias("prk"),
        quantize(F.cume_dist().over(w), 6).alias("cd"))


_BPE_RE = r"\w+|[^\w\s]"


@query(
    "bpe_tokens_regex",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS n_distinct,
           len(list_filter(regexp_extract_all(text, '{_BPE_RE}'),
                           t -> NOT regexp_matches(t, '^\\w+$'))) AS n_punct
    FROM documents WHERE length(text) > 0
    """)
def bpe_tokens_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer: word-or-single-punct regex (the pre-merge
    vocabulary of byte-pair encoders). Narrow map, codegen'd regex."""
    (d,) = load(spark, sf_dir, "documents")
    # Spark SQL string literals eat single backslashes — double them
    spark_re = _BPE_RE.replace("\\", "\\\\")
    toks = F.expr(f"regexp_extract_all(text, '{spark_re}', 0)")
    return (d.filter(F.length("text") > 0)
             .select("doc_id",
                     F.size(toks).cast("long").alias("n_bpe_tokens"),
                     F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
                     F.size(F.filter(toks, lambda t: ~t.rlike(r"^\w+$")))
                      .cast("long").alias("n_punct")))


_MOD = 1_000_000_007


@query(
    "rolling_hash_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(lower(text)) + 1),
                              i -> CAST(ascii(substring(lower(text), i, 1)) AS BIGINT))),
             (a, c) -> (a * 31 + c) % {_MOD}) AS fingerprint
    FROM documents WHERE length(text) > 0
    """)
def rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash (base-31 mod 1e9+7) over the lowercased
    document — the incremental-fingerprint primitive (a rolling window
    variant reuses the same fold with a subtract term). Exact integer
    arithmetic → identical on both engines; in-order char fold."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    fp = F.expr(
        f"aggregate(sequence(1, length(lower(text))), CAST(0 AS BIGINT), "
        f"(a, i) -> (a * 31 + ascii(substring(lower(text), i, 1))) % {_MOD})")
    return (d.filter(F.length("text") > 0).repartition(par)
             .select("doc_id", fp.alias("fingerprint")))


@query(
    "distinct_doc_sources",
    oracle="SELECT DISTINCT lang, source FROM documents")
def distinct_doc_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates (exact dedup on a projection): hash-agg shuffle
    on the pair, partial dedup map-side."""
    (d,) = load(spark, sf_dir, "documents")
    return d.select("lang", "source").dropDuplicates()


_N_PLANES = 8
_NIBBLES = "('0','1','2','3','4','5','6','7')"
_COS_MIN = 0.25


def _duck_bucket_expr() -> str:
    bits = []
    for p in range(_N_PLANES):
        bits.append(
            f"CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * "
            f"(CASE WHEN substring(md5('plane{p}_' || i), 1, 1) IN {_NIBBLES} "
            f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), 'sum') >= 0 "
            f"THEN '1' ELSE '0' END")
    return " || ".join(bits)


@query(
    "embedding_bucket_near_dup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_duck_bucket_expr()} AS bucket,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
           floor((list_aggregate(list_transform(range(1, len(a.embedding) + 1),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE)),
                   'sum') / (a.nrm * b2.nrm)) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS sim
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE list_aggregate(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b2.embedding[i] AS DOUBLE)),
            'sum') / (a.nrm * b2.nrm) >= {_COS_MIN}
    """)
def embedding_bucket_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, the composed scale pattern: LSH
    sign-bit buckets prefilter the pair space (same planes as
    lsh_bucket_cosine_topk), exact cosine runs only within buckets.
    Shuffle is one hash partition on the bucket id; pair work is
    O(Σ bucket²) ≪ O(n²)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    ndims = emb.select(F.size("embedding").alias("n")).first()["n"]
    sign_bits = []
    for p in range(_N_PLANES):
        ws = [1.0 if hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()[0] < "8"
              else -1.0 for i in range(1, ndims + 1)]
        arr = "array(" + ", ".join(f"CAST({w} AS DOUBLE)" for w in ws) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr}, "
               f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
        sign_bits.append(f"IF({dot} >= 0, '1', '0')")
    bucket = F.expr("concat(" + ", ".join(sign_bits) + ")")
    nrm = F.sqrt(F.expr(
        "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (a, v) -> a + v)"))
    b = (emb.select("vec_id", "embedding", bucket.alias("bucket"), nrm.alias("nrm")))
    a2, b2 = b.alias("a"), b.alias("b")
    dot_ab = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    sim = dot_ab / (F.col("a.nrm") * F.col("b.nrm"))
    return (a2.join(b2, (F.col("a.bucket") == F.col("b.bucket")) &
                        (F.col("a.vec_id") < F.col("b.vec_id")))
              .withColumn("sim_raw", sim)
              .filter(F.col("sim_raw") >= _COS_MIN)
              .select(F.col("a.vec_id").alias("vec_a"),
                      F.col("b.vec_id").alias("vec_b"),
                      quantize("sim_raw", 4).alias("sim")))
