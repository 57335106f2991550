"""Corpus-quality and dedup-widening operators (SURVEY.md §2.9
north-star set, round 2 additions).

- ``repetition_ngram_stats``: Gopher-style within-document repetition
  signals (top-bigram fraction, duplicate-bigram fraction) — the
  standard web-corpus quality gate for boilerplate/spam.
- ``sorted_neighborhood_pairs``: the classic sorted-neighborhood
  blocking method for fuzzy dedup — an alternative recall profile to
  the segment-banded blocking of ``fuzzy_name_pairs`` (text.py):
  neighborhood catches same-prefix typo clusters in one window pass
  with zero candidate-pair joins.

Both are pure DataFrame plans — no Python UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize, quantize_sql

_TOKS = "filter(split(text, '\\\\s+'), x -> x != '')"
_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"


@query(
    "repetition_ngram_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_DUCK} AS t FROM documents WHERE length(text) > 0
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   j -> md5(concat(t[j], ' ', t[j+1])))) AS bg
      FROM tok WHERE len(t) >= 2
    ),
    cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           count(*) AS n_distinct_bigrams,
           CAST(max(c) AS BIGINT) AS top_bigram_count,
           {quantize_sql("CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 4)}
             AS top_bigram_frac,
           {quantize_sql("CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)"
                         " / CAST(sum(c) AS DOUBLE)", 4)} AS dup_bigram_frac
    FROM cnt GROUP BY doc_id
    """)
def repetition_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document n-gram repetition signals (the Gopher quality
    gates): fraction of bigram mass held by the single most frequent
    bigram, and fraction of bigram occurrences that are duplicates.
    High values mean boilerplate / keyword-stuffing / template spam.

    Scale: bigrams are md5-hashed BEFORE the explode, so the two
    hash-agg shuffles carry (doc_id, 128-bit hash) — never text. Both
    aggs partial-aggregate map-side; output is one row per doc."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select("doc_id", F.expr(_TOKS).alias("t"))
             .filter(F.size("t") >= 2))
    bg = toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(t, 1, size(t) - 1),"
            " (x, i) -> md5(concat(x, ' ', element_at(t, i + 2))))"
        )).alias("bg"))
    cnt = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c").cast("double")
    return (cnt.groupBy("doc_id")
               .agg(F.sum("c").cast("long").alias("n_bigrams"),
                    F.count(F.lit(1)).alias("n_distinct_bigrams"),
                    F.max("c").cast("long").alias("top_bigram_count"),
                    quantize(F.max("c").cast("double") / tot, 4)
                      .alias("top_bigram_frac"),
                    quantize(F.sum(F.when(F.col("c") > 1, F.col("c"))
                                    .otherwise(F.lit(0))).cast("double") / tot, 4)
                      .alias("dup_bigram_frac")))


@query(
    "sorted_neighborhood_pairs",
    oracle="""
    WITH s AS (
      SELECT p_partkey, p_name,
             lead(p_name) OVER w AS next_name,
             lead(p_partkey) OVER w AS next_key
      FROM part
      WINDOW w AS (PARTITION BY p_brand, substr(p_name, 1, 4)
                   ORDER BY p_name, p_partkey)
    )
    SELECT p_partkey AS key_a, next_key AS key_b,
           p_name AS name_a, next_name AS name_b,
           levenshtein(p_name, next_name) AS edit_dist
    FROM s
    WHERE next_name IS NOT NULL AND levenshtein(p_name, next_name) <= 2
    """)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood fuzzy dedup: sort names within a block,
    compare each row only to its successor (window size 2), keep pairs
    within edit distance 2. Complements ``fuzzy_name_pairs``'s
    segment-banded blocking: neighborhood scanning is O(n log n) with
    ZERO candidate-pair joins — one window, one lead().

    Scale: the window partitions by (brand, 4-char name prefix), so
    partition count grows with the data and no partition funnels the
    corpus through one task (the q11 lesson). The prefix block is also
    the recall knob: a typo in the first 4 chars escapes the block —
    that recall loss is the documented trade of the method; the
    segment-banded variant covers it."""
    (p,) = load(spark, sf_dir, "part")
    blk = F.substring("p_name", 1, 4)
    w = (W.partitionBy("p_brand", blk.alias("blk"))
          .orderBy("p_name", "p_partkey"))
    s = p.select(
        "p_partkey", "p_name",
        F.lead("p_name").over(w).alias("next_name"),
        F.lead("p_partkey").over(w).alias("next_key"))
    return (s.filter(F.col("next_name").isNotNull())
             .select(F.col("p_partkey").alias("key_a"),
                     F.col("next_key").alias("key_b"),
                     F.col("p_name").alias("name_a"),
                     F.col("next_name").alias("name_b"),
                     F.levenshtein("p_name", "next_name").alias("edit_dist"))
             .filter(F.col("edit_dist") <= 2))


@query(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS group_size
      FROM customer GROUP BY 1, 2
    ),
    ldiv AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             count(DISTINCT o.o_orderpriority) AS l_distinct
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT qi.c_nationkey, qi.c_mktsegment,
           CAST(qi.group_size AS BIGINT) AS group_size,
           CAST(coalesce(ldiv.l_distinct, 0) AS BIGINT) AS l_distinct,
           qi.group_size < 5 AS k_violation
    FROM qi LEFT JOIN ldiv
      ON ldiv.c_nationkey = qi.c_nationkey
         AND ldiv.c_mktsegment = qi.c_mktsegment
    """)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-release audit: k-anonymity and l-diversity over the
    quasi-identifier (nation, market segment) — the pre-publication
    check a data-release pipeline runs before sharing 'anonymized'
    records: a QI group smaller than k re-identifies its members, and
    a group whose sensitive attribute (here the member's order
    priorities) takes too few distinct values leaks it even at size k.

    Exact and trivially portable: two hash aggs (group sizes; distinct
    sensitive values per group via one join) — the audit is itself a
    query, so it composes with the release query under the same memo
    layer. Scale: both aggs are map-side combinable; the QI-group
    relation is domain-bounded (QI cardinality, not rows)."""
    (c, o) = load(spark, sf_dir, "customer", "orders")
    qi = (c.groupBy("c_nationkey", "c_mktsegment")
           .agg(F.count(F.lit(1)).cast("long").alias("group_size")))
    ldiv = (c.join(o, o.o_custkey == c.c_custkey)
             .groupBy("c_nationkey", "c_mktsegment")
             .agg(F.countDistinct("o_orderpriority").cast("long")
                   .alias("l_distinct")))
    return (qi.join(ldiv, ["c_nationkey", "c_mktsegment"], "left")
              .select("c_nationkey", "c_mktsegment", "group_size",
                      F.coalesce("l_distinct", F.lit(0)).cast("long")
                       .alias("l_distinct"),
                      (F.col("group_size") < 5).alias("k_violation")))


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT)
    """)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan census across the star schema — the
    referential-integrity leg of the data-quality audit family
    (``data_quality_audit`` covers nulls/ranges, ``check_table`` key
    invariants; this one catches broken joins before they silently
    drop rows in inner-join pipelines).

    Each FK check is ONE left-anti join (broadcast when the parent key
    set is small; SMJ otherwise) counting rows whose parent is
    missing — the same physical shape the engine's merge uses, so the
    audit costs one scan per edge and never materializes the orphans
    themselves."""
    (l, o, c, s) = load(spark, sf_dir, "lineitem", "orders", "customer",
                        "supplier")

    def check(name, child, child_key, parent, parent_key):
        n = child.count()
        orphans = (child.select(F.col(child_key).alias("k"))
                        .join(parent.select(F.col(parent_key).alias("k")),
                              "k", "left_anti")
                        .count())
        return (name, n, orphans)

    rows = [
        check("lineitem.l_orderkey->orders", l, "l_orderkey",
              o, "o_orderkey"),
        check("orders.o_custkey->customer", o, "o_custkey",
              c, "c_custkey"),
        check("lineitem.l_suppkey->supplier", l, "l_suppkey",
              s, "s_suppkey"),
    ]
    return spark.createDataFrame(rows, "fk string, n_rows long, "
                                       "n_orphans long")


@query(
    "gini_spend_inequality",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS spend
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend, user_id) AS i
      FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(spend) AS BIGINT) AS total_cents,
           CAST(2 * sum(i * spend) - (count(*) + 1) * sum(spend)
                AS BIGINT) AS gini_num,
           CAST(count(*) * sum(spend) AS BIGINT) AS gini_den
    FROM r
    """)
def gini_spend_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user spend — the inequality /
    concentration metric (how top-heavy is the revenue base) as an
    EXACT RATIONAL: G = (2·Σ i·yᵢ − (n+1)·S) / (n·S) over
    ascending-sorted spends with 1-based ranks — every term BIGINT, no
    float until the caller divides. The same statistic audits token
    budgets across corpus sources or sample weights across strata.

    Scale: facts fold to per-user totals first (map-side combined);
    the rank runs on the user-level relation (cardinality-bounded —
    the two-level prefix sum is the unbounded fallback), and the
    moments are one final agg."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    u = (e.groupBy("user_id")
          .agg(F.sum(cents).cast("long").alias("spend")))
    w = W.orderBy("spend", "user_id")
    r = u.select("spend", F.row_number().over(w).alias("i"))
    n = F.count(F.lit(1))
    return r.agg(
        n.cast("long").alias("n"),
        F.sum("spend").cast("long").alias("total_cents"),
        (2 * F.sum(F.col("i") * F.col("spend"))
         - (n + 1) * F.sum("spend")).cast("long").alias("gini_num"),
        (n * F.sum("spend")).cast("long").alias("gini_den"))


_PSI_BINS = 10
_PSI_SPLIT = "2024-01-16"      # fixed early/late boundary for the corpus


@query(
    "psi_value_drift",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 0 ELSE 1 END
               AS late
      FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
      SELECT event_type, min(cents) AS lo, max(cents) AS hi
      FROM e WHERE late = 0 GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type, e.late,
             least({_PSI_BINS - 1}, greatest(0,
               (e.cents - b.lo) * {_PSI_BINS} // (b.hi - b.lo + 1)))
               AS bin
      FROM e JOIN bounds b ON b.event_type = e.event_type
    ),
    counts AS (
      SELECT event_type, bin,
             CAST(sum(CASE WHEN late = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS c_early,
             CAST(sum(CASE WHEN late = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS c_late
      FROM binned GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, CAST(sum(c_early) AS BIGINT) AS t_early,
             CAST(sum(c_late) AS BIGINT) AS t_late
      FROM counts GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type,
             CAST(floor(
               ((CAST(c.c_early AS DOUBLE) / t.t_early
                 - CAST(c.c_late AS DOUBLE) / t.t_late)
                * ln((CAST(c.c_early AS DOUBLE) / t.t_early)
                     / (CAST(c.c_late AS DOUBLE) / t.t_late)))
               * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
      FROM counts c JOIN tot t ON t.event_type = c.event_type
    )
    SELECT event_type, count(*) AS n_bins,
           floor((CAST(sum(term_nano) AS DOUBLE) / 1000000000.0)
                 * CAST(1000000.0 AS DOUBLE) + 0.5)
             / CAST(1000000.0 AS DOUBLE) AS psi,
           CAST(sum(term_nano) AS DOUBLE) / 1000000000.0 > 0.2 AS drifted
    FROM terms GROUP BY event_type
    """)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the standard production drift
    monitor for model inputs/features: per event type, value
    distributions of the early vs late half of the corpus over 10
    equal-width bins (bounds fit on the EARLY half, the deployment-
    time convention), PSI = Σ (p−q)·ln(p/q) with +1 smoothing;
    PSI > 0.2 flags drift (the usual action threshold).

    FP parity: each bin's term is computed from exact integer counts
    and floored to nano-units, so the cross-bin sum is exact integer
    arithmetic — order-insensitive on both engines — and the drift
    flag compares on the same scaled sum.

    Scale: two hash aggs over (type, bin) — bin-cardinality shuffles;
    the raw stream is touched once."""
    (e,) = load(spark, sf_dir, "events")
    ev = (e.filter(F.col("value").isNotNull())
           .select("event_type",
                   F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                    .alias("cents"),
                   (F.col("ts") >= F.lit(_PSI_SPLIT).cast("timestamp"))
                   .cast("int").alias("late")))
    bounds = (ev.filter(F.col("late") == 0)
                .groupBy("event_type")
                .agg(F.min("cents").alias("lo"), F.max("cents").alias("hi")))
    binned = (ev.join(F.broadcast(bounds), "event_type")
                .select("event_type", "late",
                        F.least(F.lit(_PSI_BINS - 1), F.greatest(
                            F.lit(0),
                            F.expr(f"(cents - lo) * {_PSI_BINS} "
                                   f"div (hi - lo + 1)")))
                        .alias("bin")))
    counts = (binned.groupBy("event_type", "bin")
              .agg((F.sum(F.when(F.col("late") == 0, 1).otherwise(0)) + 1)
                   .alias("c_early"),
                   (F.sum(F.when(F.col("late") == 1, 1).otherwise(0)) + 1)
                   .alias("c_late")))
    tot = (counts.groupBy("event_type")
                 .agg(F.sum("c_early").alias("t_early"),
                      F.sum("c_late").alias("t_late")))
    p = F.col("c_early").cast("double") / F.col("t_early")
    q = F.col("c_late").cast("double") / F.col("t_late")
    term = F.floor(((p - q) * F.log(p / q)) * 1e9 + F.lit(0.5)) \
        .cast("long")
    terms = (counts.join(F.broadcast(tot), "event_type")
                   .select("event_type", term.alias("term_nano")))
    psi_d = F.col("s").cast("double") / F.lit(1e9)
    return (terms.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n_bins"),
                      F.sum("term_nano").alias("s"))
                 .select("event_type", "n_bins",
                         quantize(psi_d, 6).alias("psi"),
                         (psi_d > 0.2).alias("drifted")))


# ε-DP geometric mechanism (Ghosh–Roughgarden–Sundararajan 2009): the
# discrete analog of Laplace for integer counts. α = 1/2 → ε = ln 2.
# CDF of the two-sided geometric, P(X ≤ k) = 2^(k+1)/3 (k < 0) and
# 1 − 2^(−k)/3 (k ≥ 0), truncated to [−16, 16] by clamping the inverse.
# The thresholds are correctly-rounded double literals (Fraction →
# float) whose TEXT is shared with the oracle, so noise = count of
# thresholds ≤ u is pure integer arithmetic on both engines — no
# transcendentals, no FP-summation drift, full value-hash parity (the
# codebase's micro-nat/Poisson-CDF discipline applied to DP noise).
from fractions import Fraction as _Fr

_DP_SPAN = 16
_DP_CDF = tuple(
    repr(float(_Fr(2) ** (k + 1) / 3)) if k < 0
    else repr(float(1 - _Fr(1, 3) / 2 ** k))
    for k in range(-_DP_SPAN, _DP_SPAN))

# u in [0,1): md5 of the cell key, 13 hex nibbles / 2^52 (double-exact)
_DP_U = ("(CAST({h} AS DOUBLE) / 4503599627370496.0)")


def _dp_noise(u_expr: str) -> str:
    """Engine-shared inverse-CDF text: noise = −{span} + |{{k: cdf_k ≤ u}}|."""
    return (f"(-{_DP_SPAN} + (" + " + ".join(
        f"CASE WHEN {u_expr} >= {c} THEN 1 ELSE 0 END"
        for c in _DP_CDF) + "))")


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n_true
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type,
           CAST(n_true + {_dp_noise(_DP_U.format(
               h="CAST(concat('0x', substring(md5(concat('dp_', CAST(day AS VARCHAR), '_', event_type)), 1, 13)) AS BIGINT)"))}
             AS BIGINT) AS noisy_count
    FROM cells
    """)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: daily event-type
    counts with ε = ln 2 geometric-mechanism noise — the release step
    after the ``k_anonymity_audit`` pre-check when counts themselves
    must be published (usage dashboards, data-sharing agreements,
    telemetry exports). The geometric mechanism is the
    utility-optimal ε-DP mechanism for integer counts; noise here is
    drawn deterministically per cell (md5 inverse-CDF) so the release
    is reproducible and hash-checkable — a production deployment
    swaps the uniform for a real RNG and keeps every other line.

    Scale: one map-side-combined count agg; noise is a per-cell
    projection over the (days × types)-bounded release relation —
    zero extra shuffles, noise cost independent of corpus size."""
    (e,) = load(spark, sf_dir, "events")
    cells = (e.groupBy(F.col("ts").cast("date").alias("day"),
                       "event_type")
              .agg(F.count(F.lit(1)).alias("n_true")))
    h = ("CAST(conv(substring(md5(concat('dp_', CAST(day AS STRING), '_', "
         "event_type)), 1, 13), 16, 10) AS BIGINT)")
    noise = F.expr(_dp_noise(_DP_U.format(h=h)))
    return cells.select(
        "day", "event_type",
        (F.col("n_true") + noise).cast("long").alias("noisy_count"))


_QC_B = 512        # hashed feature buckets
_QC_WSPAN = 1000   # weights are integers in [-1000, 1000] (milli-units)


def _qc_weights() -> list[int]:
    """Deterministic 'trained' linear-model weights, one per hashed
    feature bucket: md5('qw_<b>') mod 2001 − 1000. Stands in for real
    learned weights; a production run loads them from the model
    artifact and keeps every other line."""
    import hashlib

    return [int(hashlib.md5(f"qw_{b}".encode()).hexdigest()[:8], 16)
            % (2 * _QC_WSPAN + 1) - _QC_WSPAN
            for b in range(_QC_B)]


@query(
    "quality_classifier_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKS_DUCK}) AS tok
      FROM documents WHERE length(text) > 0
    ),
    scored AS (
      SELECT doc_id, source,
             count(*) AS n_tokens,
             CAST(sum(
               (CAST(concat('0x', substring(md5('qw_' ||
                  CAST(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
                       % {_QC_B} AS VARCHAR)), 1, 8)) AS BIGINT)
                % {2 * _QC_WSPAN + 1}) - {_QC_WSPAN}
             ) AS BIGINT) AS margin_milli
      FROM toks GROUP BY doc_id, source
    )
    SELECT doc_id, source, n_tokens, margin_milli,
           floor((CAST(margin_milli AS DOUBLE) / n_tokens)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS margin_per_token,
           margin_milli >= 0 AS keep
    FROM scored
    """)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the linear-classifier stage of
    every LLM data pipeline (the CCNet / GPT-3 'quality classifier'
    shape): hashed bag-of-words features ({_QC_B} md5 buckets) scored
    against a weight vector, per-document margin decides keep/drop.
    Complements the HEURISTIC gates (``text_quality``,
    ``length_percentile_gate``): this is the plumbing for a trained
    model applied corpus-wide. Weights here are deterministic
    md5-derived integers (see ``_qc_weights``) so the release
    hash-checks; swap in learned weights and nothing else changes.

    FP discipline: the margin is an exact BIGINT milli-unit sum (the
    DSIR integer-micro-nat move); only the final per-token
    normalization divides, and that division of two exact integers is
    correctly rounded identically on both engines, then quantized.

    Scale: weights ride as ONE plan-literal array (element_at lookup —
    no join); tokens never leave their partition (explode + map-side
    combine into per-doc partials), so the only shuffle is the per-doc
    aggregation of (doc_id, partial-sum) pairs. At 100 TB this is one
    corpus pass — the same cost as counting tokens."""
    (d,) = load(spark, sf_dir, "documents")
    W_arr = F.lit(_qc_weights())
    par = spark.sparkContext.defaultParallelism
    toks = (d.filter(F.length("text") > 0)
             .repartition(par)
             .select("doc_id", "source",
                     F.explode(F.expr(_TOKS)).alias("tok")))
    w_tok = F.element_at(
        W_arr,
        (F.expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)")
         % _QC_B + 1).cast("int"))
    scored = (toks.select("doc_id", "source", w_tok.alias("w"))
                  .groupBy("doc_id", "source")
                  .agg(F.count(F.lit(1)).alias("n_tokens"),
                       F.sum("w").cast("long").alias("margin_milli")))
    return scored.select(
        "doc_id", "source", "n_tokens", "margin_milli",
        quantize(F.col("margin_milli").cast("double") / F.col("n_tokens"),
                 4).alias("margin_per_token"),
        (F.col("margin_milli") >= 0).alias("keep"))


# Randomized response (Warner 1965) — LOCAL differential privacy: each
# user reports their true bit with probability p = 3/4, the flipped
# bit otherwise, so any single report is plausibly deniable
# (ε = ln(p/(1−p)) = ln 3); the aggregator debiases the population
# rate as (p̂ + p − 1)/(2p − 1). p·2^52 is an exact integer, so the
# per-user coin (md5 uniform < p) is a pure integer comparison.
_RR_P_NUM = 3 * 2 ** 50          # 0.75 * 2^52, exact


@query(
    "randomized_response_rate",
    oracle=f"""
    WITH u AS (
      SELECT user_id, user_id % 5 AS cohort,
             max(CASE WHEN event_type = 'purchase'
                      AND coalesce(value, 0) >= 100
                  THEN 1 ELSE 0 END) AS b
      FROM events GROUP BY user_id
    ),
    rr AS (
      SELECT cohort, b,
             CASE WHEN CAST(concat('0x', substring(
                      md5('rr_' || CAST(user_id AS VARCHAR)), 1, 13))
                      AS BIGINT) < {_RR_P_NUM}
                  THEN b ELSE 1 - b END AS reported
      FROM u
    )
    SELECT cohort, count(*) AS n_users,
           CAST(sum(reported) AS BIGINT) AS n_reported,
           CAST(sum(b) AS BIGINT) AS n_true,
           CAST(4 * sum(reported) - count(*) AS BIGINT) AS est_num,
           CAST(2 * count(*) AS BIGINT) AS est_den,
           floor((CAST(4 * sum(reported) - count(*) AS DOUBLE)
                  / (2 * count(*)))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS est_rate
    FROM rr GROUP BY cohort
    """)
def randomized_response_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL differential privacy: Warner's randomized response over a
    sensitive per-user bit (did the user make a ≥$100 purchase), the
    client-side complement to the central-DP ``dp_noisy_counts`` —
    here the TRUE bits never need to be collected; each user's report
    is already privatized (ε = ln 3), and the per-cohort rate is
    recovered by the unbiased estimator (p̂ − 1/4)/(1/2), emitted as
    an exact integer rational (4·Σreport − n)/(2n) plus a quantized
    display rate. The n_true column (available here because this is a
    correctness harness) lets the driver hash pin BOTH the mechanism
    and the estimator; a deployment drops it and nothing else changes.
    The coin is deterministic md5-vs-exact-integer-threshold
    (0.75·2^52), so the whole relation is integer arithmetic.

    Scale: one per-user reduction (map-side combined), then a
    cohort-bounded aggregate; the mechanism adds one hash + compare
    per user — no joins, no extra shuffles."""
    (e,) = load(spark, sf_dir, "events")
    u = (e.groupBy("user_id")
          .agg(F.max(F.when((F.col("event_type") == "purchase")
                            & (F.coalesce("value", F.lit(0.0)) >= 100),
                            1).otherwise(0)).alias("b"))
          .withColumn("cohort", F.col("user_id") % 5))
    coin = F.expr("CAST(conv(substring(md5(concat('rr_', "
                  "CAST(user_id AS STRING))), 1, 13), 16, 10) AS BIGINT)")
    rr = u.withColumn(
        "reported",
        F.when(coin < F.lit(_RR_P_NUM), F.col("b"))
         .otherwise(1 - F.col("b")))
    agg = (rr.groupBy("cohort")
             .agg(F.count(F.lit(1)).alias("n_users"),
                  F.sum("reported").cast("long").alias("n_reported"),
                  F.sum("b").cast("long").alias("n_true")))
    est_num = (4 * F.col("n_reported") - F.col("n_users")).cast("long")
    est_den = (2 * F.col("n_users")).cast("long")
    return agg.select(
        "cohort", "n_users", "n_reported", "n_true",
        est_num.alias("est_num"), est_den.alias("est_den"),
        quantize(est_num.cast("double") / est_den, 4).alias("est_rate"))


@query(
    "calibration_bins_ece",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS tok, length(text) AS n_chars
      FROM documents WHERE length(text) > 0
    ),
    scored AS (
      SELECT doc_id, max(n_chars) AS n_chars, count(*) AS n_tokens,
             CAST(sum(
               (CAST(concat('0x', substring(md5('qw_' ||
                  CAST(CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT)
                       % {_QC_B} AS VARCHAR)), 1, 8)) AS BIGINT)
                % {2 * _QC_WSPAN + 1}) - {_QC_WSPAN}
             ) AS BIGINT) AS margin_milli
      FROM toks GROUP BY doc_id
    ),
    binned AS (
      SELECT doc_id,
             least(9, CAST(floor(
               CAST(10 * (margin_milli + {_QC_WSPAN} * n_tokens) AS DOUBLE)
               / (2 * {_QC_WSPAN} * n_tokens)) AS BIGINT)) AS bin,
             CAST(floor(
               CAST(1000000 * (margin_milli + {_QC_WSPAN} * n_tokens)
                    AS DOUBLE)
               / (2 * {_QC_WSPAN} * n_tokens) + 0.5) AS BIGINT)
               AS conf_micro,
             CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS label
      FROM scored
    )
    SELECT bin, count(*) AS n_docs,
           CAST(sum(label) AS BIGINT) AS n_pos,
           floor((CAST(sum(conf_micro) AS DOUBLE) / count(*) / 1000000.0)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS confidence,
           floor((CAST(sum(label) AS DOUBLE) / count(*))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS accuracy
    FROM binned GROUP BY bin
    """)
def calibration_bins_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality classifier
    (``quality_classifier_scores``): margins map to [0,1] confidences
    (affine from the ±{_QC_WSPAN} milli-unit range), docs bin into
    confidence deciles, and each bin reports confidence vs observed
    label rate (label: document length ≥ 400 chars — the
    deterministic stand-in for a held-out quality label). The gap
    column per bin is what Expected Calibration Error sums — the
    standard post-training check before a classifier's scores gate a
    corpus; an uncalibrated filter silently shifts the kept
    distribution.

    Exactness: bin assignment is an integer-ratio floor (numerator and
    denominator exact BIGINTs; a double quotient can't cross an
    integer boundary because the true ratio is ≥ 2^-40 from one unless
    exactly integral); per-doc confidence quantizes to an INTEGER
    micro-unit before any summation (the micro-nat move), so bin
    averages are exact integer sums ÷ counts — no order-dependent
    double accumulation on either engine.

    Scale: same single corpus pass as the classifier, then a 10-row
    aggregate."""
    (d,) = load(spark, sf_dir, "documents")
    W_arr = F.lit(_qc_weights())
    par = spark.sparkContext.defaultParallelism
    toks = (d.filter(F.length("text") > 0)
             .repartition(par)
             .select("doc_id", F.length("text").alias("n_chars"),
                     F.explode(F.expr(_TOKS)).alias("tok")))
    w_tok = F.element_at(
        W_arr,
        (F.expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)")
         % _QC_B + 1).cast("int"))
    scored = (toks.select("doc_id", "n_chars", w_tok.alias("w"))
                  .groupBy("doc_id")
                  .agg(F.max("n_chars").alias("n_chars"),
                       F.count(F.lit(1)).alias("n_tokens"),
                       F.sum("w").cast("long").alias("margin_milli")))
    p_num = (F.col("margin_milli")
             + _QC_WSPAN * F.col("n_tokens")).cast("long")
    p_den = (2 * _QC_WSPAN * F.col("n_tokens")).cast("long")
    binned = scored.select(
        F.least(F.lit(9),
                F.floor((10 * p_num).cast("double") / p_den)
                 .cast("long")).alias("bin"),
        F.floor((1000000 * p_num).cast("double") / p_den + F.lit(0.5))
         .cast("long").alias("conf_micro"),
        F.when(F.col("n_chars") >= 400, 1).otherwise(0).alias("label"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("label").cast("long").alias("n_pos"),
                 quantize(F.sum("conf_micro").cast("double")
                          / F.count(F.lit(1)) / 1000000.0, 4)
                   .alias("confidence"),
                 quantize(F.sum("label").cast("double")
                          / F.count(F.lit(1)), 4).alias("accuracy")))


# candidate functional dependencies to profile: (table, lhs, rhs)
_FD_CANDIDATES = (
    ("part", "p_name", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_size"),
    ("customer", "c_name", "c_nationkey"),
    ("orders", "o_orderkey", "o_orderstatus"),
)


@query(
    "functional_dependency_audit",
    oracle="\n    UNION ALL\n".join(f"""
    SELECT '{t}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds,
           floor((CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                  / count(*)) * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS violation_frac
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd
          FROM {t} GROUP BY {lhs})
    """ for t, lhs, rhs in _FD_CANDIDATES))
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/profiling — the schema-quality
    audit a warehouse runs before trusting a column as a join or
    partition key: for each candidate FD lhs → rhs, the number of lhs
    groups mapping to more than one rhs value. A dependency that
    HOLDS licenses normalization, dictionary encoding, and
    sort-key/partition-key choices; a violated one flags dirty data or
    a wrong assumption. Complements ``referential_integrity_audit``
    (cross-table) and ``data_quality_audit`` (per-column) with the
    cross-column axis.

    Scale: each candidate is one (lhs, rhs-distinct) hash agg with
    map-side partials folded to a single verdict row — candidates ×
    one-pass, no joins; at a thousand candidates you'd batch the same
    probes per table scan."""
    (p, c, o) = load(spark, sf_dir, "part", "customer", "orders")
    frames = {"part": p, "customer": c, "orders": o}
    outs = []
    for t, lhs, rhs in _FD_CANDIDATES:
        g = (frames[t].groupBy(lhs)
             .agg(F.countDistinct(rhs).alias("nd")))
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        outs.append(g.agg(
            F.lit(t).alias("tbl"), F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).alias("n_groups"),
            viol.cast("long").alias("n_violating"),
            (viol == 0).alias("holds"),
            quantize(viol.cast("double") / F.count(F.lit(1)), 4)
              .alias("violation_frac")))
    out = outs[0]
    for f_ in outs[1:]:
        out = out.unionByName(f_)
    return out


_KL_SCALE = 1_000_000   # micro-nats


@query(
    "source_mix_kl_drift",
    oracle=f"""
    WITH halves AS (
      SELECT source,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_ref,
             CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cur
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur,
             count(*) AS n_src
      FROM halves
    ),
    lr AS (
      SELECT h.source, h.n_ref, h.n_cur,
             CAST(floor(ln(
                 (CAST(h.n_cur + 1 AS DOUBLE) / (o.t_cur + o.n_src))
               / (CAST(h.n_ref + 1 AS DOUBLE) / (o.t_ref + o.n_src))
             ) * {_KL_SCALE}.0 + 0.5) AS BIGINT) AS lr_micro,
             o.t_cur, o.n_src
      FROM halves h CROSS JOIN tot o
    )
    SELECT source, n_ref, n_cur, lr_micro,
           CAST(floor(CAST((n_cur + 1) * lr_micro AS DOUBLE)
                      / (t_cur + n_src) + 0.5) AS BIGINT)
             AS kl_contrib_micro,
           abs(lr_micro) > {_KL_SCALE} / 2 AS drifted
    FROM lr
    """)
def source_mix_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus COMPOSITION drift monitor: KL(current ‖ reference) of
    the source mixture, per-source — the companion to ``psi_value_
    drift`` (value distributions) for the axis that silently ruins
    training runs: the crawl's source mix shifting between snapshots
    (halves here stand in for two crawl snapshots, deterministic by
    doc parity). Per-source log-ratios floor to INTEGER micro-nats
    (the DSIR discipline) with add-1 smoothing, each source's KL
    contribution is an exact integer, and sources beyond ±0.5 nats
    flag ``drifted`` — so both the per-source diagnosis and the total
    (an exact integer sum of the contributions) hash-check.

    Scale: one map-side-combined count agg, a 1-row total broadcast,
    source-bounded output — composition monitoring is free at any
    corpus size."""
    (d,) = load(spark, sf_dir, "documents")
    halves = (d.groupBy("source")
               .agg(F.sum(F.when(F.col("doc_id") % 2 == 0, 1)
                           .otherwise(0)).cast("long").alias("n_ref"),
                    F.sum(F.when(F.col("doc_id") % 2 == 1, 1)
                           .otherwise(0)).cast("long").alias("n_cur")))
    tot = halves.agg(F.sum("n_ref").cast("long").alias("t_ref"),
                     F.sum("n_cur").cast("long").alias("t_cur"),
                     F.count(F.lit(1)).alias("n_src"))
    j = halves.crossJoin(F.broadcast(tot))
    lr_micro = F.floor(
        F.log(((F.col("n_cur") + 1).cast("double")
               / (F.col("t_cur") + F.col("n_src")))
              / ((F.col("n_ref") + 1).cast("double")
                 / (F.col("t_ref") + F.col("n_src"))))
        * _KL_SCALE + F.lit(0.5)).cast("long")
    withlr = j.withColumn("lr_micro", lr_micro)
    contrib = F.floor(((F.col("n_cur") + 1) * F.col("lr_micro"))
                      .cast("double")
                      / (F.col("t_cur") + F.col("n_src"))
                      + F.lit(0.5)).cast("long")
    return withlr.select(
        "source", "n_ref", "n_cur", "lr_micro",
        contrib.alias("kl_contrib_micro"),
        (F.abs(F.col("lr_micro")) > _KL_SCALE / 2).alias("drifted"))
