"""Relational-completeness and history operators (round 3):

- ``daily_activity_full_outer``: FULL OUTER join — the one join type
  the inventory hadn't exercised; orders and events live in disjoint
  date ranges, so both null sides actually materialize.
- ``scd2_user_value_history``: slowly-changing-dimension (type 2)
  validity intervals derived from an event log — the versioned-row
  view a warehouse keeps for every mutable entity (and the query-side
  analog of the engine catalog's root-history time travel).
- ``bigram_lm_condprob``: conditional bigram probabilities — the
  smallest useful language model, and the shape of every n-gram count
  pipeline (KenLM-style) at corpus scale.
- ``cdf_doc_length_per_source``: cumulative-distribution transform
  (percentile rank) of document length within each source — the
  rank-based normalization that is exact on ties, unlike z-scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize, quantize_sql

_TOKS = "filter(split(text, '\\\\s+'), x -> x != '')"
_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"


@query(
    "daily_activity_full_outer",
    oracle="""
    WITH o AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             count(*) AS n_orders
      FROM orders GROUP BY 1
    ),
    e AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT COALESCE(o.day, e.day) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(n_events, 0) AS n_events,
           CASE WHEN o.day IS NULL THEN 'events_only'
                WHEN e.day IS NULL THEN 'orders_only'
                ELSE 'both' END AS side
    FROM o FULL OUTER JOIN e ON o.day = e.day
    """)
def daily_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily-activity series. The order and
    event histories cover different eras, so both unmatched sides are
    non-empty — the join type's semantics actually get exercised.

    Scale: both inputs are already day-grained aggregates (tiny
    relative to their sources), so the full-outer shuffle moves
    day-counts, never raw rows."""
    o_df, e_df = load(spark, sf_dir, "orders", "events")
    o = (o_df.groupBy(F.date_trunc("day", "o_orderdate").cast("date")
                      .alias("day"))
             .agg(F.count(F.lit(1)).alias("n_orders")))
    e = (e_df.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events")))
    oo, ee = o.alias("o"), e.alias("e")
    j = oo.join(ee, F.col("o.day") == F.col("e.day"), "full_outer")
    return j.select(
        F.coalesce(F.col("o.day"), F.col("e.day")).alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("o.day").isNull(), "events_only")
         .when(F.col("e.day").isNull(), "orders_only")
         .otherwise("both").alias("side"))


@query(
    "scd2_user_value_history",
    oracle="""
    SELECT user_id, event_id, value AS obs_value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL) AS is_current
    FROM events WHERE event_type = 'purchase'
    """)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history: each purchase observation becomes a
    versioned row with a [valid_from, valid_to) interval, open-ended
    on the latest (``is_current``). This is the query-side mirror of
    the engine catalog's version history (store.py root chain): state
    AS OF t = the row whose interval contains t.

    Scale: one window per user (partition count grows with users), a
    filter pushed to the scan, map-only otherwise."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (e.filter(F.col("event_type") == "purchase")
             .select("user_id", "event_id",
                     F.col("value").alias("obs_value"),
                     F.col("ts").alias("valid_from"),
                     nxt.alias("valid_to"),
                     nxt.isNull().alias("is_current")))


@query(
    "bigram_lm_condprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_DUCK} AS t FROM documents WHERE length(text) > 0
    ),
    bg AS (
      SELECT t[j] AS tok_a, t[j+1] AS tok_b
      FROM tok, unnest(range(1, len(t))) AS r(j)
      WHERE len(t) >= 2
    ),
    ab AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM bg GROUP BY 1, 2),
    a AS (SELECT tok_a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM ab GROUP BY 1)
    SELECT ab.tok_a, ab.tok_b, n_ab, n_a,
           {quantize_sql("CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE)", 6)}
             AS p_b_given_a
    FROM ab JOIN a USING (tok_a)
    WHERE n_ab >= 5
    """)
def bigram_lm_condprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model estimation: P(b | a) = c(a,b) / c(a,·)
    over corpus token bigrams (pairs seen >= 5 times). The count
    pipeline is exactly a KenLM-style n-gram pass; at 100 TB the only
    change is more n-gram orders, not more shuffles.

    Scale: bigrams explode map-side; both count aggs partial-aggregate
    and shuffle vocabulary²-bounded keys; the unigram marginal comes
    from re-aggregating the bigram counts (one corpus pass total) and
    broadcasts into the divide."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select(F.expr(_TOKS).alias("t"))
             .filter(F.size("t") >= 2))
    bg = toks.select(F.explode(F.expr(
        "transform(slice(t, 1, size(t) - 1),"
        " (x, i) -> struct(x AS tok_a, element_at(t, i + 2) AS tok_b))"))
        .alias("p")).select("p.tok_a", "p.tok_b")
    ab = bg.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_ab"))
    a = ab.groupBy("tok_a").agg(F.sum("n_ab").alias("n_a"))
    return (ab.filter(F.col("n_ab") >= 5)
              .join(F.broadcast(a), "tok_a")
              .select("tok_a", "tok_b", "n_ab", "n_a",
                      quantize(F.col("n_ab").cast("double")
                               / F.col("n_a").cast("double"), 6)
                       .alias("p_b_given_a")))


@query(
    "cdf_doc_length_per_source",
    oracle=f"""
    SELECT doc_id, source, n_chars,
           {quantize_sql("cume_dist() OVER (PARTITION BY source"
                         " ORDER BY n_chars)", 6)} AS len_cdf
    FROM documents
    """)
def cdf_doc_length_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF / percentile-rank transform of document length within its
    source: rank-based normalization, exact under ties (cume_dist is
    counting, not float accumulation) — the robust alternative to
    z-scoring a heavy-tailed length distribution.

    Scale: one window partitioned by source; partition count grows
    with sources. For a corpus where one source dominates, pre-agg to
    (source, n_chars, count) first — same CDF from vastly fewer rows
    (documented escape, not needed at these SFs)."""
    (d,) = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("n_chars")
    return d.select("doc_id", "source", "n_chars",
                    quantize(F.cume_dist().over(w), 6).alias("len_cdf"))


_PPL_GATE_NATS = 6.0   # keep docs whose avg bigram NLL <= this


@query(
    "perplexity_filter_bigram",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_DUCK} AS t FROM documents WHERE length(text) > 0
    ),
    bg AS (
      SELECT doc_id, j, t[j] AS tok_a, t[j+1] AS tok_b
      FROM tok, unnest(range(1, len(t))) AS r(j)
      WHERE len(t) >= 2
    ),
    ab AS (SELECT tok_a, tok_b, count(*) AS n_ab FROM bg GROUP BY 1, 2),
    a AS (SELECT tok_a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM ab GROUP BY 1),
    lp AS (
      SELECT bg.doc_id, bg.j,
             ln(CAST(ab.n_ab AS DOUBLE) / CAST(a.n_a AS DOUBLE)) AS l
      FROM bg JOIN ab USING (tok_a, tok_b) JOIN a USING (tok_a)
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_bigrams,
             list_aggregate(array_agg(l ORDER BY j), 'sum') AS s
      FROM lp GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           {quantize_sql("-s / CAST(n_bigrams AS DOUBLE)", 6)} AS avg_nll,
           (-s / CAST(n_bigrams AS DOUBLE)) <= {_PPL_GATE_NATS} AS kept
    FROM agg
    """)
def perplexity_filter_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the perplexity gate of pretraining
    pipelines, CCNet-style): score every document by its average
    negative log-likelihood under the corpus's own bigram LM
    (``bigram_lm_condprob``'s counts), gate at {_PPL_GATE_NATS} nats —
    high-NLL docs are unnatural text (boilerplate, mangled encodings,
    word salad). Self-contained: the LM is estimated from the corpus
    being scored, no external model.

    FP parity discipline: a per-doc SUM of logs is order-sensitive, so
    both engines fold the log terms in EXPLICIT bigram-position order
    (collect → sort by position → in-order aggregate fold), not
    whatever order the aggregation visits rows — hash-exact without
    rounding slack beyond the standard quantize.

    Scale: the count sides re-aggregate the same corpus pass as the LM
    query (vocab²-bounded shuffles); scoring joins the positional
    bigrams to counts co-partitioned on (tok_a, tok_b); the unigram
    marginal broadcasts; the per-doc fold carries doc-length lists —
    bounded by document size, never corpus-wide."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select("doc_id", F.expr(_TOKS).alias("t"))
             .filter(F.size("t") >= 2))
    bg = toks.select("doc_id", F.posexplode(F.expr(
        "transform(slice(t, 1, size(t) - 1),"
        " (x, i) -> struct(x AS tok_a, element_at(t, i + 2) AS tok_b))"))
        .alias("j", "p")).select("doc_id", "j", "p.tok_a", "p.tok_b")
    ab = bg.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("n_ab"))
    a = ab.groupBy("tok_a").agg(F.sum("n_ab").alias("n_a"))
    lp = (bg.join(ab, ["tok_a", "tok_b"])
            .join(F.broadcast(a), "tok_a")
            .select("doc_id", "j",
                    F.log(F.col("n_ab").cast("double")
                          / F.col("n_a").cast("double")).alias("l")))
    agg = (lp.groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_bigrams"),
                  F.expr("aggregate(array_sort(collect_list(struct(j, l)),"
                         " (x, y) -> CASE WHEN x.j < y.j THEN -1"
                         " WHEN x.j > y.j THEN 1 ELSE 0 END),"
                         " CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.l)")
                   .alias("s")))
    nll = -F.col("s") / F.col("n_bigrams").cast("double")
    return agg.select("doc_id", "n_bigrams",
                      quantize(nll, 6).alias("avg_nll"),
                      (nll <= F.lit(_PPL_GATE_NATS)).alias("kept"))
