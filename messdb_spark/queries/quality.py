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
