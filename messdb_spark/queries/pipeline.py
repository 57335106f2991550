"""Composite pipeline queries — operators chained the way a real
training-data prep or reporting job chains them, oracle-checked
end-to-end (each stage is covered alone elsewhere; these pin the
composition semantics).

``training_corpus_prep`` is the LLM-data showcase: language gate →
quality gate → exact near-dup removal (normalized fingerprint,
min-doc_id canonical) → per-source corpus accounting. One scan, two
shuffles (dedup + final agg) — the 100 TB shape where text never
shuffles, only (fingerprint, doc_id) pairs and per-source partials.

``trailing_week_revenue`` pins RANGE-frame windows (value-based frame,
unlike the ROWS frames elsewhere): 7-day trailing revenue per market
segment over the daily revenue series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import load, quantize, quantize_sql, query

D = "DECIMAL(18,2)"

_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"
_TOKS_SPARK = "filter(split(text, '\\\\s+'), x -> x != '')"


@query(
    "training_corpus_prep",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, source,
             len({_TOKS_DUCK}) AS n_tokens,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
      WHERE lang IN ('en', 'es') AND length(text) BETWEEN 40 AND 100000
        AND len({_TOKS_DUCK}) >= 8
        AND len(list_distinct({_TOKS_DUCK})) * 2 >= len({_TOKS_DUCK})
    ),
    canon AS (
      SELECT fp, min(doc_id) AS doc_id, count(*) AS n_copies
      FROM gated GROUP BY fp
    ),
    kept AS (
      SELECT g.* FROM gated g JOIN canon c ON g.doc_id = c.doc_id
    )
    SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {quantize_sql("avg(CAST(n_tokens AS DOUBLE))", 4)} AS avg_tokens
    FROM kept GROUP BY source
    """)
def training_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language gate → quality gate (length, token count, type-token
    ratio ≥ 0.5) → exact dedup keeping the lowest doc_id per normalized
    fingerprint → per-source token accounting.

    Scale: the gates are pushed/codegen'd column predicates on the
    scan; dedup shuffles only (fp, doc_id, n_tokens, source); the final
    agg partial-aggregates map-side. Text bytes never cross the wire."""
    (d,) = load(spark, sf_dir, "documents")
    toks = F.expr(_TOKS_SPARK)
    n_tokens = F.size(toks)
    gated = (d.filter(F.col("lang").isin("en", "es") &
                      F.length("text").between(40, 100000))
              .select("doc_id", "source", n_tokens.cast("long").alias("n_tokens"),
                      F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
                      F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")),
                                                    r"\s+", " ")).cast("binary"))
                       .alias("fp"))
              .filter((F.col("n_tokens") >= 8) &
                      (F.col("n_distinct") * 2 >= F.col("n_tokens"))))
    canon = gated.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = gated.join(canon, ["fp", "doc_id"], "left_semi")
    return (kept.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("total_tokens"),
                     quantize(F.avg(F.col("n_tokens").cast("double")), 4)
                      .alias("avg_tokens")))


@query(
    "trailing_week_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT c_mktsegment, CAST(o_orderdate AS DATE) AS day,
             sum(CAST(o_totalprice AS {D})) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_mktsegment, CAST(o_orderdate AS DATE)
    )
    SELECT c_mktsegment, day,
           {quantize_sql("CAST(sum(rev) OVER (PARTITION BY c_mktsegment ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)", 2)}
             AS trailing_7d
    FROM daily
    """)
def trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: 7-day trailing revenue per segment. The
    frame is value-based (calendar days, including days absent from
    the data), not row-based — Spark expresses it as rangeBetween over
    an epoch-day ordering column. Daily pre-aggregation keeps the
    window input at O(segments × days); decimal sums stay exact until
    the final double cast."""
    o, c = load(spark, sf_dir, "orders", "customer")
    daily = (o.filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) &
                      (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
               .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
               .groupBy("c_mktsegment",
                        F.to_date("o_orderdate").alias("day"))
               .agg(F.sum(F.col("o_totalprice").cast(D)).alias("rev")))
    w = (W.partitionBy("c_mktsegment")
          .orderBy(F.unix_date(F.col("day")))
          .rangeBetween(-6, 0))
    return daily.select("c_mktsegment", "day",
                        quantize(F.sum("rev").over(w).cast("double"), 2)
                         .alias("trailing_7d"))


# ---------------------------------------------------------------------------
# near-dup-aware corpus prep: gates + connected-component dedup
# ---------------------------------------------------------------------------

def _near_dedup_oracle() -> str:
    from .graph import _CC_CTES
    return f"""
    WITH RECURSIVE {_CC_CTES},
    gated AS (
      SELECT doc_id, source, len({_TOKS_DUCK}) AS n_tokens
      FROM documents
      WHERE lang IN ('en', 'es') AND length(text) BETWEEN 40 AND 100000
        AND len({_TOKS_DUCK}) >= 8
        AND len(list_distinct({_TOKS_DUCK})) * 2 >= len({_TOKS_DUCK})
    ),
    lab AS (
      SELECT g.*, COALESCE(a.cluster_id, g.doc_id) AS cluster_id
      FROM gated g LEFT JOIN assign a USING (doc_id)
    ),
    canon AS (
      SELECT cluster_id, min(doc_id) AS doc_id FROM lab GROUP BY cluster_id
    ),
    kept AS (
      SELECT l.* FROM lab l
      JOIN canon c ON l.cluster_id = c.cluster_id AND l.doc_id = c.doc_id
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {quantize_sql("avg(CAST(n_tokens AS DOUBLE))", 4)} AS avg_tokens
    FROM kept GROUP BY source
    """


@query("corpus_prep_near_dedup", oracle=_near_dedup_oracle())
def corpus_prep_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup-aware corpus prep — ``training_corpus_prep``'s exact-
    fingerprint stage upgraded to transitive near-dup clusters: language
    gate → quality gates → connected components over the MinHash-LSH
    candidate graph (``graph.cc_cluster_labels``) → keep the min-doc_id
    survivor among the GATED members of each cluster → per-source token
    accounting. Docs in no candidate bucket are their own cluster
    (COALESCE to doc_id).

    Scale: the cluster labels are (bigint, bigint) rows — text never
    enters the graph or any shuffle; gates prune on the scan; the
    survivor choice is one hash-agg + semi-join on (cluster, doc);
    final agg partial-aggregates per source. This is the full pipeline
    a pretraining-data curator runs: near-dup (not just byte-identical)
    documents collapse to one representative before token accounting."""
    from .graph import cc_cluster_labels

    (d,) = load(spark, sf_dir, "documents")
    toks = F.expr(_TOKS_SPARK)
    n_tokens = F.size(toks)
    gated = (d.filter(F.col("lang").isin("en", "es") &
                      F.length("text").between(40, 100000))
              .select("doc_id", "source",
                      n_tokens.cast("long").alias("n_tokens"),
                      F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"))
              .filter((F.col("n_tokens") >= 8) &
                      (F.col("n_distinct") * 2 >= F.col("n_tokens"))))
    labels = cc_cluster_labels(spark, sf_dir).select(
        "doc_id", F.col("comp").alias("cluster_id"))
    lab = (gated.join(labels, "doc_id", "left")
                .withColumn("cluster_id",
                            F.coalesce(F.col("cluster_id"), F.col("doc_id"))))
    canon = lab.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    kept = lab.join(canon, ["cluster_id", "doc_id"], "left_semi")
    return (kept.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tokens").alias("total_tokens"),
                     quantize(F.avg(F.col("n_tokens").cast("double")), 4)
                      .alias("avg_tokens")))


_N_FOLDS = 5


@query(
    "dataset_fold_split",
    oracle=f"""
    WITH f AS (
      SELECT source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_N_FOLDS} AS fold,
             len({_TOKS_DUCK}) AS n_tokens
      FROM documents
    )
    SELECT source, fold, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM f GROUP BY source, fold
    """)
def dataset_fold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (train/val/test splitting by
    content-stable hash, never by position or RNG): fold =
    md5(doc_id) mod {_N_FOLDS}, so membership is reproducible across
    runs, engines, and repartitions — the property a data pipeline
    needs so that later incremental additions never reshuffle existing
    examples between folds. Output: per-(source, fold) doc and token
    accounting to check balance.

    Scale: pure map (hash + mod) then one small-keyed agg; fold
    assignment never shuffles the corpus."""
    (d,) = load(spark, sf_dir, "documents")
    fold = (F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            % _N_FOLDS)
    n_tokens = F.size(F.expr(_TOKS_SPARK))
    return (d.select("source", fold.alias("fold"),
                     n_tokens.cast("long").alias("n_tokens"))
             .groupBy("source", "fold")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_tokens").alias("total_tokens")))


_LEAK_K = 8     # character shingle width (the corpus-wide dedup unit,
                # text.py _SHINGLE_K)


@query(
    "train_eval_leakage_audit",
    oracle=f"""
    WITH folds AS (
      SELECT doc_id, source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_N_FOLDS} AS fold
      FROM documents WHERE length(text) >= {_LEAK_K}
    ),
    sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, length(text) - {_LEAK_K - 2}),
                 i -> CAST(concat('0x', substring(md5(substring(text, i, {_LEAK_K})), 1, 15)) AS BIGINT))) AS s
        FROM documents WHERE length(text) >= {_LEAK_K})
    ),
    eval_sh AS (
      SELECT DISTINCT sh.s FROM sh JOIN folds f ON f.doc_id = sh.doc_id
      WHERE f.fold = 0
    ),
    leaky AS (
      SELECT DISTINCT sh.doc_id
      FROM sh JOIN folds f ON f.doc_id = sh.doc_id
      WHERE f.fold != 0 AND sh.s IN (SELECT s FROM eval_sh)
    )
    SELECT f.source,
           CAST(sum(CASE WHEN f.fold != 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaky,
           floor((CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS DOUBLE)
                  / sum(CASE WHEN f.fold != 0 THEN 1 ELSE 0 END))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS leak_rate
    FROM folds f LEFT JOIN leaky l ON l.doc_id = f.doc_id
    GROUP BY f.source
    """)
def train_eval_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval DECONTAMINATION sweep — the internal complement to
    ``benchmark_contamination`` (which checks against an external
    benchmark): using the pipeline's own fold assignment
    (``dataset_fold_split``: fold 0 = eval, others = train), flag
    every train document sharing ANY {_LEAK_K}-char shingle with any
    eval document. A near-dup straddling the split inflates eval — the
    leak every 'we dedup'd train' paper still gets burned by; this
    audit runs per ingest so the flagged docs are dropped from train
    BEFORE a token is spent.

    Scale: shingle hashes are 8-byte 60-bit ints (text never
    shuffles); the eval shingle set is (eval docs × shingles)-bounded
    and semi-joins the train side — at a 1/{_N_FOLDS} eval fraction
    this is the small side and broadcasts; per-source rollup is
    domain-bounded."""
    (d,) = load(spark, sf_dir, "documents")
    base = d.filter(F.length("text") >= _LEAK_K)
    fold = (F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, "
                   "15), 16, 10) AS BIGINT)") % _N_FOLDS)
    folds = base.select("doc_id", "source", fold.alias("fold"))
    par = spark.sparkContext.defaultParallelism
    sh = (base.repartition(par)
              .select("doc_id", F.explode(F.expr(
                  f"transform(sequence(1, length(text) - {_LEAK_K - 1}), "
                  f"i -> CAST(conv(substring(md5(substring(text, i, "
                  f"{_LEAK_K})), 1, 15), 16, 10) AS BIGINT))"))
                  .alias("s"))
              .distinct())
    sh_f = sh.join(folds.select("doc_id", "fold"), "doc_id")
    eval_sh = (sh_f.filter(F.col("fold") == 0)
                   .select("s").distinct())
    leaky = (sh_f.filter(F.col("fold") != 0)
                 .join(eval_sh, "s", "left_semi")
                 .select("doc_id").distinct()
                 .withColumn("is_leaky", F.lit(1)))
    j = folds.join(leaky, "doc_id", "left")
    n_train = F.sum(F.when(F.col("fold") != 0, 1).otherwise(0))
    n_leaky = F.sum(F.when(F.col("is_leaky").isNotNull(), 1).otherwise(0))
    return (j.groupBy("source")
             .agg(n_train.cast("long").alias("n_train"),
                  n_leaky.cast("long").alias("n_leaky"),
                  quantize(n_leaky.cast("double") / n_train, 4)
                    .alias("leak_rate")))


_SHARD_N = 8    # export shards


@query(
    "export_shard_manifest",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_SHARD_N} AS shard_id,
             len({_TOKS_DUCK}) AS n_tokens,
             CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
                  '|', coalesce(text, ''))), 1, 15)) AS BIGINT) AS doc_fp
      FROM documents
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(bit_xor(doc_fp) AS BIGINT) AS shard_fingerprint
    FROM docs GROUP BY shard_id
    """)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data DELIVERY manifest — the last step of the
    pipeline: docs assign to {_SHARD_N} shards by content-stable hash
    (reproducible across runs/engines/repartitions, and stable under
    incremental additions — a new doc lands in one shard without
    reshuffling the others, the ``dataset_fold_split`` property), and
    each shard's manifest row carries doc/token/source accounting plus
    an ORDER-INSENSITIVE fingerprint (xor of per-doc content hashes —
    the engine's own commutative-digest discipline, ``hashing.py``).
    The consumer verifies a downloaded shard against its fingerprint
    without trusting transport or ordering; the producer diffs
    manifests across releases to ship only changed shards.

    Scale: one map pass (hash + token count), one {_SHARD_N}-row agg;
    xor is commutative so the fingerprint partial-aggregates map-side
    like every digest in this engine."""
    (d,) = load(spark, sf_dir, "documents")
    shard = (F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, "
                    "15), 16, 10) AS BIGINT)") % _SHARD_N)
    doc_fp = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|', "
        "coalesce(text, ''))), 1, 15), 16, 10) AS BIGINT)")
    n_tokens = F.size(F.expr(_TOKS_SPARK))
    docs = d.select(shard.alias("shard_id"), "source",
                    n_tokens.cast("long").alias("n_tokens"),
                    doc_fp.alias("doc_fp"))
    return (docs.groupBy(F.col("shard_id").cast("long").alias("shard_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.countDistinct("source").cast("long").alias("n_sources"),
                 F.expr("bit_xor(doc_fp)").cast("long")
                  .alias("shard_fingerprint")))


_CH_FROM = 8     # current shard count
_CH_TO = 10      # target shard count
_CH_VNODES = 64  # virtual nodes per physical shard on the ring

import hashlib as _chl

# ring boundaries: md5('ring_<shard>_<vnode>')[:13] — 52-bit points,
# shared literals on both engines; a key belongs to the first boundary
# clockwise from its hash (wrap to the minimum boundary)


def _ring(n_shards: int) -> list[tuple[int, int]]:
    pts = [(int(_chl.md5(f"ring_{s}_{v}".encode()).hexdigest()[:13], 16), s)
           for s in range(n_shards) for v in range(_CH_VNODES)]
    return sorted(pts)


def _ring_case(n_shards: int, h_expr: str) -> str:
    """SQL CASE mapping a 52-bit hash to its ring shard (first
    boundary ≥ h, wrapping to the smallest boundary)."""
    pts = _ring(n_shards)
    arms = " ".join(f"WHEN {h_expr} <= {p} THEN {s}" for p, s in pts)
    return f"(CASE {arms} ELSE {pts[0][1]} END)"


@query(
    "consistent_hash_rebalance",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                  AS BIGINT) AS h
      FROM documents
    ),
    assigned AS (
      SELECT doc_id,
             h % {_CH_FROM} AS mod_from, h % {_CH_TO} AS mod_to,
             {_ring_case(_CH_FROM, "h")} AS ring_from,
             {_ring_case(_CH_TO, "h")} AS ring_to
      FROM d
    )
    SELECT count(*) AS n_docs,
           CAST(sum(CASE WHEN mod_from != mod_to THEN 1 ELSE 0 END)
                AS BIGINT) AS mod_moved,
           CAST(sum(CASE WHEN ring_from != ring_to THEN 1 ELSE 0 END)
                AS BIGINT) AS ring_moved,
           floor((CAST(sum(CASE WHEN mod_from != mod_to THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS mod_moved_frac,
           floor((CAST(sum(CASE WHEN ring_from != ring_to THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS ring_moved_frac
    FROM assigned
    """)
def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding-cost analysis: growing {_CH_FROM} → {_CH_TO} shards,
    how much data MOVES under modulo placement vs a consistent-hash
    ring ({_CH_VNODES} virtual nodes/shard, Karger et al. 1997)?
    Modulo reassigns ~1 − 1/lcm ≈ 90% of keys; the ring moves ≈
    2/{_CH_TO} — the measurement that justifies ring placement for
    any sharded store before the first painful reshard (the engine's
    own bucket layouts face exactly this when n_buckets changes; the
    adaptive layout's split-only growth is the other answer).

    Exactness: assignments are integer comparisons against shared
    md5-derived ring literals — the whole relation is integer
    arithmetic.

    Scale: one map pass + one global agg; the ring is a plan literal
    (CASE ladder here; binary-search over a literal array at larger
    vnode counts)."""
    (d,) = load(spark, sf_dir, "documents")
    h = ("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13), 16, "
         "10) AS BIGINT)")
    a = d.select(
        F.expr(h).alias("h")).select(
        (F.col("h") % _CH_FROM).alias("mod_from"),
        (F.col("h") % _CH_TO).alias("mod_to"),
        F.expr(_ring_case(_CH_FROM, "h")).alias("ring_from"),
        F.expr(_ring_case(_CH_TO, "h")).alias("ring_to"))
    moved_mod = F.sum(F.when(F.col("mod_from") != F.col("mod_to"), 1)
                       .otherwise(0))
    moved_ring = F.sum(F.when(F.col("ring_from") != F.col("ring_to"), 1)
                        .otherwise(0))
    n = F.count(F.lit(1))
    return a.agg(n.alias("n_docs"),
                 moved_mod.cast("long").alias("mod_moved"),
                 moved_ring.cast("long").alias("ring_moved"),
                 quantize(moved_mod.cast("double") / n, 4)
                   .alias("mod_moved_frac"),
                 quantize(moved_ring.cast("double") / n, 4)
                   .alias("ring_moved_frac"))
