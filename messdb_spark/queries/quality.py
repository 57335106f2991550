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
