"""Cross-document corpus analysis (SURVEY.md §2.9 north-star set,
round 3 additions) — the corpus-wide statistics a training-data
pipeline computes between dedup and packing:

- ``boilerplate_bigram_docfreq``: n-grams shared by an outsized share
  of documents (navigation chrome, license banners, template spam) —
  the cross-document complement of the within-document
  ``repetition_ngram_stats`` gate.
- ``inverted_index_postings``: term -> sorted posting list, the
  classic IR structure (and the shape a contamination / attribution
  service queries).
- ``token_pmi_pairs``: pointwise mutual information over token
  co-occurrence — collocation mining / topic-signal extraction.
- ``char_class_profile``: per-language character-class census, the
  cheap script/encoding sanity gate run before any tokenizer.

All pure DataFrame plans — no Python UDFs; every shuffle carries
hashes or counters, never raw text (except the bounded vocab of the
PMI/postings outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, load, pin_result, quantize, quantize_sql

_TOKS = "filter(split(text, '\\\\s+'), x -> x != '')"
_TOKS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"


@query(
    "boilerplate_bigram_docfreq",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_DUCK} AS t FROM documents WHERE length(text) > 0
    ),
    bg AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t)),
                                   j -> concat(t[j], ' ', t[j+1]))) AS bigram
      FROM tok WHERE len(t) >= 2
    ),
    df AS (SELECT bigram, count(*) AS n_docs FROM bg GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM documents WHERE length(text) > 0)
    SELECT bigram, n_docs,
           {quantize_sql("CAST(n_docs AS DOUBLE) / CAST(tot.n AS DOUBLE)", 6)}
             AS doc_frac
    FROM df, tot
    WHERE CAST(n_docs AS DOUBLE) >= 0.05 * CAST(tot.n AS DOUBLE)
    """)
def boilerplate_bigram_docfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: bigrams present in >= 5% of all documents.
    Web-corpus cleaning removes lines/spans made of such n-grams
    (cookie banners, nav menus) before dedup so they don't glue
    unrelated pages into one MinHash cluster.

    Scale: DISTINCT(doc, bigram) then a bigram-keyed count — both
    partial-aggregate map-side, and the shuffled payload is bounded by
    the corpus *vocabulary*, not its size. The 5% threshold is a
    1-row scalar aggregate broadcast into the filter (the q11/q15
    pattern — no single-partition window)."""
    (d,) = load(spark, sf_dir, "documents")
    docs = d.filter(F.length("text") > 0)
    toks = docs.select("doc_id", F.expr(_TOKS).alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(t, 1, size(t) - 1),"
            " (x, i) -> concat(x, ' ', element_at(t, i + 2)))")).alias("bigram")
    ).distinct()
    df = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    return (df.crossJoin(F.broadcast(tot))
              .filter(F.col("n_docs").cast("double")
                      >= 0.05 * F.col("n").cast("double"))
              .select("bigram", "n_docs",
                      quantize(F.col("n_docs").cast("double")
                               / F.col("n").cast("double"), 6)
                      .alias("doc_frac")))


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(list_distinct({_TOKS_DUCK})) AS term
      FROM documents WHERE length(text) > 0
    )
    SELECT term, source,
           count(*) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS postings
    FROM tok GROUP BY term, source
    """)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: (term, source) -> document-frequency + sorted
    doc_id posting list, serialized as a CSV string for engine-portable
    comparison. The source dimension is the partitioning story: at
    100 TB a single term's postings exceed one task, so the index
    shards by (term, source-or-range) exactly like this grouping —
    each shard's list stays bounded and merges are sorted-list unions.

    Scale: explode(distinct terms per doc) -> one hash agg keyed by
    (term, source); collect_list holds doc ids (8 bytes each), never
    text. sort_array makes the posting order deterministic without a
    global sort."""
    (d,) = load(spark, sf_dir, "documents")
    tok = (d.filter(F.length("text") > 0)
            .select("doc_id", "source",
                    F.explode(F.array_distinct(F.expr(_TOKS))).alias("term")))
    return (tok.groupBy("term", "source")
               .agg(F.count(F.lit(1)).alias("df"),
                    F.array_join(F.sort_array(F.collect_list("doc_id")), ",")
                     .alias("postings")))


@query(
    "token_pmi_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_TOKS_DUCK})) AS t
      FROM documents WHERE length(text) > 0
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    uni AS (SELECT t, count(*) AS n_t FROM tok GROUP BY 1),
    pairs AS (
      SELECT a.t AS tok_a, b.t AS tok_b, count(*) AS n_ab
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT tok_a, tok_b, n_ab, ua.n_t AS n_a, ub.n_t AS n_b,
           {quantize_sql(
               "ln((CAST(n_ab AS DOUBLE) * CAST(n.n_docs AS DOUBLE))"
               " / (CAST(ua.n_t AS DOUBLE) * CAST(ub.n_t AS DOUBLE)))", 6)}
             AS pmi
    FROM pairs
    JOIN uni ua ON ua.t = tok_a
    JOIN uni ub ON ub.t = tok_b
    CROSS JOIN n
    WHERE n_ab >= 5
    """)
def token_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI = ln(P(a,b) / (P(a)P(b))) over document
    co-occurrence, for pairs seen together in >= 5 docs.

    Scale: pair generation is a self-equi-join of the exploded
    distinct-token relation on doc_id — per-doc cost is quadratic in
    the doc's DISTINCT-token count, which a real pipeline bounds by
    intersecting with a broadcast top-V vocabulary first (the
    heavy-hitters output is exactly that V). The three count aggs all
    partial-aggregate; the unigram table is vocabulary-sized and
    broadcast into the final join; n_docs is a 1-row scalar broadcast
    (never a window)."""
    (d,) = load(spark, sf_dir, "documents")
    tok = (d.filter(F.length("text") > 0)
            .select("doc_id",
                    F.explode(F.array_distinct(F.expr(_TOKS))).alias("t")))
    tok = tok.cache()
    n = tok.agg(F.countDistinct("doc_id").alias("n_docs"))
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                       & (F.col("a.t") < F.col("b.t")))
              .groupBy(F.col("a.t").alias("tok_a"), F.col("b.t").alias("tok_b"))
              .agg(F.count(F.lit(1)).alias("n_ab"))
              .filter(F.col("n_ab") >= 5))
    ua = F.broadcast(uni.select(F.col("t").alias("tok_a"),
                                F.col("n_t").alias("n_a")))
    ub = F.broadcast(uni.select(F.col("t").alias("tok_b"),
                                F.col("n_t").alias("n_b")))
    out = (pairs.join(ua, "tok_a").join(ub, "tok_b")
                .crossJoin(F.broadcast(n))
                .select("tok_a", "tok_b", "n_ab", "n_a", "n_b",
                        quantize(F.log(
                            (F.col("n_ab").cast("double")
                             * F.col("n_docs").cast("double"))
                            / (F.col("n_a").cast("double")
                               * F.col("n_b").cast("double"))), 6)
                        .alias("pmi")))
    return pin_result(out, tok)


@query(
    "char_class_profile",
    oracle="""
    SELECT lang,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(length(text)
                    - length(regexp_replace(text, '[a-z]', '', 'g')))
                AS BIGINT) AS n_alpha,
           CAST(sum(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g')))
                AS BIGINT) AS n_digit,
           CAST(sum(length(text)
                    - length(regexp_replace(text, '[ ]', '', 'g')))
                AS BIGINT) AS n_space,
           CAST(sum(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')))
                AS BIGINT) AS n_other
    FROM documents GROUP BY lang
    """)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class census per language: lowercase-alpha / digit /
    space / other counts — the encoding sanity gate (mojibake, binary
    junk, wrong-script contamination show up as an ``n_other`` spike)
    run on every crawl snapshot before tokenization.

    Scale: pure whole-stage-codegen projections (length + regexp
    replace) feeding a lang-keyed partial agg — one vocabulary-sized
    shuffle, text never leaves the map side."""
    (d,) = load(spark, sf_dir, "documents")

    def n_of(pat: str):
        return (F.length("text")
                - F.length(F.regexp_replace("text", pat, ""))).cast("long")

    return (d.groupBy("lang")
             .agg(F.sum(F.length("text").cast("long")).alias("n_chars"),
                  F.sum(n_of("[a-z]")).alias("n_alpha"),
                  F.sum(n_of("[0-9]")).alias("n_digit"),
                  F.sum(n_of("[ ]")).alias("n_space"),
                  F.sum(F.length(F.regexp_replace("text", "[a-z0-9 ]", ""))
                        .cast("long")).alias("n_other")))


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("data", "model", "training")   # literal query terms


@query(
    "bm25_doc_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS_DUCK} AS t FROM documents WHERE length(text) > 0
    ),
    dl AS (SELECT doc_id, len(t) AS doclen FROM tok),
    n AS (SELECT count(*) AS n_docs,
                 CAST(sum(doclen) AS BIGINT) AS total_len FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM tok)
      WHERE term IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           {quantize_sql(
               "sum(ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)"
               " * (tf * (" + str(_BM25_K1) + " + 1.0))"
               " / (tf + " + str(_BM25_K1) + " * (1.0 - " + str(_BM25_B) +
               " + " + str(_BM25_B) + " * CAST(doclen AS DOUBLE)"
               " / (CAST(total_len AS DOUBLE) / CAST(n_docs AS DOUBLE)))))",
               6)} AS bm25
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n
    GROUP BY tf.doc_id
    """)
def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scores for a literal query ({', '.join(_BM25_TERMS)})
    over the corpus — the retrieval-side scorer next to the TF-IDF
    keyword extractor; the shape a data pipeline uses to mine
    task-relevant pretraining documents for a target distribution.

    FP note: the per-doc score sums <= {len(_BM25_TERMS)} term
    contributions; both engines group tiny per-doc sets, and the
    contributions differ by whole-term magnitudes, so quantize(6) is
    robust. Scale: query terms prune BEFORE any shuffle (the IN-list
    filter rides the scan); tf is (docs x matched terms) rows only; df
    and the corpus stats are broadcast scalars. The doclen join is the
    one corpus-cardinality shuffle, but it carries 16-byte
    (doc_id, doclen) rows — never text — and AQE broadcasts the tf
    side when the query is selective."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select("doc_id", F.expr(_TOKS).alias("t")))
    dl = toks.select("doc_id", F.size("t").alias("doclen"))
    n = dl.agg(F.count(F.lit(1)).alias("n_docs"),
               F.sum("doclen").alias("total_len"))
    tf = (toks.select("doc_id", F.explode("t").alias("term"))
              .filter(F.col("term").isin(*_BM25_TERMS))
              .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avg_dl = F.col("total_len").cast("double") / F.col("n_docs").cast("double")
    idf = F.log((F.col("n_docs").cast("double") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    contrib = (idf * (F.col("tf") * (_BM25_K1 + 1.0))
               / (F.col("tf") + _BM25_K1 * (1.0 - _BM25_B
                  + _BM25_B * F.col("doclen").cast("double") / avg_dl)))
    return (tf.join(F.broadcast(df), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(n))
              .groupBy("doc_id")
              .agg(quantize(F.sum(contrib), 6).alias("bm25")))


_DSIR_B = 4096          # hashed feature buckets
_DSIR_SCALE = 1_000_000  # micro-nat fixed point for log-ratios
_DSIR_TOPN = 100

# hashed unigram feature id: first 8 md5 hex digits mod B
_DSIR_FEAT = (f"CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) "
              f"% {_DSIR_B}")
_DSIR_FEAT_DUCK = (f"CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) "
                   f"% {_DSIR_B}")


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, {_DSIR_FEAT_DUCK} AS bucket,
             count(*) AS c
      FROM (SELECT doc_id, lang, unnest({_TOKS_DUCK}) AS tok
            FROM documents)
      GROUP BY doc_id, lang, bucket
    ),
    src AS (SELECT bucket, sum(c) AS n_s FROM feats GROUP BY bucket),
    tgt AS (SELECT bucket, sum(c) AS n_t FROM feats
            WHERE lang = 'en' GROUP BY bucket),
    tots AS (SELECT (SELECT sum(c) FROM feats) AS t_s,
                    (SELECT sum(c) FROM feats WHERE lang = 'en') AS t_t),
    lr AS (
      SELECT s.bucket,
             CAST(floor(ln(
                 ((coalesce(t.n_t, 0) + 1.0) / (o.t_t + {_DSIR_B}))
               / ((s.n_s + 1.0) / (o.t_s + {_DSIR_B}))
             ) * {_DSIR_SCALE}.0 + 0.5) AS BIGINT) AS lr_micro
      FROM src s LEFT JOIN tgt t ON t.bucket = s.bucket
      CROSS JOIN tots o
    ),
    w AS (
      SELECT f.doc_id, f.lang,
             CAST(sum(f.c * lr.lr_micro) AS BIGINT) AS weight_micro
      FROM feats f JOIN lr ON lr.bucket = f.bucket
      GROUP BY f.doc_id, f.lang
    )
    SELECT doc_id, lang, weight_micro,
           CAST(rk AS BIGINT) AS rk, rk <= {_DSIR_TOPN} AS selected
    FROM (SELECT *, row_number() OVER (ORDER BY weight_micro DESC,
                                       doc_id) AS rk
          FROM w)
    """)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): select raw-corpus documents that look
    like a TARGET domain (here lang='en') by importance weight under
    hashed bag-of-words models. Features are md5-hashed unigrams into
    {_DSIR_B} buckets; per-document log-weight is
    Σ_f c_f · (ln p_target(f) − ln p_raw(f)) with add-1 smoothing;
    the top-{_DSIR_TOPN} by weight are the selected examples (the
    paper resamples with Gumbel noise; rank-by-weight is the
    deterministic analog).

    FP discipline: each bucket's log-ratio is pre-quantized to an
    INTEGER micro-nat (the ``zipf_token_rank_fit`` move), so the
    per-document sum is exact BIGINT arithmetic — no summation-order
    drift between engines.

    Scale: the feature table shuffles (doc, bucket, count) triples —
    never text; both distributions are {_DSIR_B}-row (vocab-bounded)
    aggregates whose log-ratio table BROADCASTS to the per-doc join.
    This is the published 100 TB recipe: one pass to fit, one
    broadcast-join pass to score. The final global rank exists to
    expose the selection as a relation; at corpus scale the rank
    becomes the two-level prefix-sum rank of ``global_rank_by_length``
    (or a weight-threshold chosen from a quantile sketch — no total
    order needed for top-N selection)."""
    toks = (load(spark, sf_dir, "documents")[0]
            .select("doc_id", "lang",
                    F.explode(F.expr(_TOKS)).alias("tok")))
    feats = (toks.withColumn("bucket", F.expr(_DSIR_FEAT))
                 .groupBy("doc_id", "lang", "bucket")
                 .agg(F.count(F.lit(1)).alias("c")))
    feats = feats.localCheckpoint(eager=False)
    src = feats.groupBy("bucket").agg(F.sum("c").alias("n_s"))
    tgt = (feats.filter(F.col("lang") == "en")
                .groupBy("bucket").agg(F.sum("c").alias("n_t")))
    tots = (feats.agg(
        F.sum("c").alias("t_s"),
        F.sum(F.when(F.col("lang") == "en", F.col("c"))
               .otherwise(F.lit(0))).alias("t_t")))
    lr = (src.join(tgt, "bucket", "left")
             .crossJoin(F.broadcast(tots))
             .select("bucket", F.floor(F.log(
                 ((F.coalesce(F.col("n_t"), F.lit(0)) + 1.0)
                  / (F.col("t_t") + F.lit(float(_DSIR_B))))
                 / ((F.col("n_s") + 1.0)
                    / (F.col("t_s") + F.lit(float(_DSIR_B)))))
                 * _DSIR_SCALE + F.lit(0.5)).cast("long")
                 .alias("lr_micro")))
    from pyspark.sql.window import Window as W
    w = (feats.join(F.broadcast(lr), "bucket")
              .groupBy("doc_id", "lang")
              .agg(F.sum(F.col("c") * F.col("lr_micro")).cast("long")
                    .alias("weight_micro")))
    rk = F.row_number().over(
        W.orderBy(F.desc("weight_micro"), F.col("doc_id")))
    return (w.withColumn("rk", rk.cast("long"))
             .withColumn("selected", F.col("rk") <= _DSIR_TOPN))
