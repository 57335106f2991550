"""Data-mining / pipeline-diagnostics operators (round 4 widening of
the north-star LLM-pipeline set, SURVEY.md §2.9): passage-level dedup,
prefix-filtered exact similarity join, PageRank centrality, robust
(median/MAD) outlier detection, chi-square keyword extraction, join-key
skew profiling, exact EWMA smoothing, a Deequ-style data-quality audit,
ANALYZE-style column statistics, market-basket association mining,
hopping windows in batch mode, rolling exact medians, and
linear-interpolation missing-value imputation.

Cross-engine determinism discipline (driver hash gate): every formula
is either (a) pure integer arithmetic (PageRank's damping is 4/5 with
integer division; EWMA weights are powers of two; MAD works in BIGINT
cents where exact medians interpolate to exact quarters), or (b) one
identical chain of correctly-rounded IEEE double ops on both engines —
`+ - * /` and int→double casts are exact-rounded everywhere, so the
same expression tree over the same operands yields bit-equal doubles;
only libm functions (ln/exp) are banned, which is why keyword scoring
uses chi-square instead of log-likelihood.

Scale notes per query; shared theme: corpus text never shuffles —
every join/agg moves 8-byte hashes, counts, or (node, rank) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, pin_result, quantize


# ---------------------------------------------------------------------------
# passage-level exact dedup (C4-style)
# ---------------------------------------------------------------------------

_CHUNK_W = 10  # words per passage unit


@query(
    "paragraph_dedup_stats",
    oracle=f"""
    WITH d2 AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
    ),
    ch AS (
      SELECT doc_id, source,
             unnest(list_transform(range(0, len(w) // {_CHUNK_W}),
               i -> CAST(concat('0x', substring(md5(array_to_string(
                      list_slice(w, i*{_CHUNK_W}+1, i*{_CHUNK_W}+{_CHUNK_W}),
                      ' ')), 1, 15)) AS BIGINT))) AS h
      FROM d2 WHERE len(w) >= {_CHUNK_W}
    ),
    freq AS (SELECT h, count(*) AS f FROM ch GROUP BY h),
    pd AS (
      SELECT doc_id, source, count(*) AS n_chunks,
             sum(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS dup_chunks
      FROM ch JOIN freq USING (h) GROUP BY doc_id, source
    )
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
           CAST(sum(dup_chunks) AS BIGINT) AS dup_chunks,
           floor(CAST(sum(dup_chunks) AS DOUBLE) / sum(n_chunks)
                 * 10000.0 + 0.5) / 10000.0 AS dup_frac
    FROM pd GROUP BY source
    """)
def paragraph_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (the C4/RefinedWeb line-dedup recipe
    adapted to the whitespace corpus): docs split into consecutive
    10-word passages, each passage hashed, and a passage is
    "duplicated" when its hash occurs anywhere else in the corpus;
    reports per-source duplication pressure (what a crawl-cleaning run
    reads before deciding to strip repeated boilerplate passages).

    Scale: one generate (map-only split+hash, text never leaves the
    scan), one count per 8-byte passage hash (the only corpus-sized
    shuffle), one hash-join back, two cheap aggs. At 100 TB the
    passage-frequency table is the working set and it's ~2% the size
    of the text."""
    (d,) = load(spark, sf_dir, "documents")
    docs = (d.select("doc_id", "source", F.split("text", " ").alias("w"))
             .filter(F.size("w") >= _CHUNK_W))
    chunk = (f"transform(sequence(0, size(w) DIV {_CHUNK_W} - 1), "
             f"i -> CAST(conv(substring(md5(array_join("
             f"slice(w, i*{_CHUNK_W}+1, {_CHUNK_W}), ' ')), 1, 15), 16, 10) "
             f"AS BIGINT))")
    ch = docs.select("doc_id", "source", F.explode(F.expr(chunk)).alias("h"))
    freq = ch.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    pd_ = (ch.join(freq, "h")
             .groupBy("doc_id", "source")
             .agg(F.count(F.lit(1)).alias("n_chunks"),
                  F.sum((F.col("f") > 1).cast("long")).alias("dup_chunks")))
    return (pd_.groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chunks").alias("total_chunks"),
                    F.sum("dup_chunks").alias("dup_chunks"))
               .select("source", "n_docs", "total_chunks", "dup_chunks",
                       quantize(F.col("dup_chunks").cast("double")
                                / F.col("total_chunks"), 4).alias("dup_frac")))


# ---------------------------------------------------------------------------
# prefix-filtered exact-Jaccard similarity join (All-Pairs / PPJoin family)
# ---------------------------------------------------------------------------

# Char-shingle width. Deliberately WIDE (spans ~4-5 words of the
# synthetic corpus): prefix filtering is only effective when element
# frequencies are heavy-tailed-rare, and on a low-entropy corpus short
# shingles are all common — measured at sf0.1, k=8 gives Σf² ≈ 5.6·10⁸
# candidate mass (max f 3859) vs k=24's 1.6·10⁶ (max f 18), with the
# SAME J ≥ 0.5 result set. Sizing the token so its entropy exceeds the
# corpus's per-position entropy is the standard guard; on real text
# (large vocab) k=8 would already be fine.
_PP_K = 24

# Broadcast the candidate-pair list through the verify joins only while
# it is provably small. 1M rows of (2 bigint ids, 2 int sizes) ≈ 32 MB
# serialized — comfortably inside executor memory on every profile. A
# near-duplicate-heavy crawl shard can exceed this by orders of
# magnitude, and a forced broadcast hint would then OOM the driver;
# above the cap the verify joins fall back to shuffle hash joins on the
# bigint pair keys (AQE may still re-broadcast if runtime stats allow).
_PP_BCAST_MAX = 1_000_000


@query(
    "ppjoin_jaccard_pairs",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE length(text) >= {_PP_K}
    ),
    ex AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, length(text) - {_PP_K - 2}),
               i -> CAST(concat('0x', substring(md5(substring(text, i, {_PP_K})),
                                                1, 15)) AS BIGINT)))) AS h
      FROM docs
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
    freq AS (SELECT h, count(*) AS f FROM ex GROUP BY h),
    pref AS (
      SELECT doc_id, h, n FROM (
        SELECT e.doc_id, e.h, s.n,
               row_number() OVER (PARTITION BY e.doc_id
                                  ORDER BY f.f, e.h) AS rn
        FROM ex e
        JOIN freq f ON e.h = f.h
        JOIN sizes s ON s.doc_id = e.doc_id)
      WHERE rn <= n - (n + 1) // 2 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb
      FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id
      WHERE 2 * least(a.n, b.n) >= greatest(a.n, b.n)
    ),
    inter AS (
      SELECT cd.da, cd.db, any_value(cd.na) AS na, any_value(cd.nb) AS nb,
             count(*) AS c
      FROM cand cd
      JOIN ex ea ON ea.doc_id = cd.da
      JOIN ex eb ON eb.doc_id = cd.db AND eb.h = ea.h
      GROUP BY cd.da, cd.db
    )
    SELECT da AS doc_a, db AS doc_b,
           floor(CAST(c AS DOUBLE) / (na + nb - c) * 10000.0 + 0.5)
             / 10000.0 AS jaccard
    FROM inter WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.5
    """)
def ppjoin_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-threshold similarity join (Jaccard >= 0.5 over wide char
    shingle sets, see _PP_K) via prefix filtering — the
    All-Pairs/PPJoin guarantee:
    under one global element order (rarest-first), two sets with
    J >= t must share an element within their first n - ceil(t*n) + 1
    elements, so only prefix collisions become candidates. Completes
    the dedup family: MinHash-LSH (probabilistic recall), SimHash
    (Hamming), sorted-neighborhood (blocking) — this one is exact, no
    false negatives, no all-pairs.

    Scale: the prefix keeps only each doc's RAREST half of shingles,
    so bucket sizes on the candidate join are bounded by per-shingle
    rarity (common shingles never block); candidates then verify via
    a count-style intersection join that ships only (pair, 8-byte
    hash) rows. Everything shuffles hashes; t is 0.5 so the prefix
    length n - (n+1) DIV 2 + 1 is pure integer math on both engines.
    The candidate list broadcasts through the verify joins only below
    _PP_BCAST_MAX pairs (counted from the cached frame — a metadata
    -cheap job); beyond it the verify stage shuffles on the pair keys
    instead of forcing a driver-sized broadcast."""
    return _ppjoin_pairs(spark, sf_dir, _PP_BCAST_MAX)


def _ppjoin_pairs(spark: SparkSession, sf_dir: str,
                  bcast_max: int) -> DataFrame:
    """Body of ppjoin_jaccard_pairs with the broadcast cap injectable
    so plan tests can pin BOTH the broadcast and shuffle branches."""
    par = spark.sparkContext.defaultParallelism
    (d,) = load(spark, sf_dir, "documents")
    docs = d.filter(F.length("text") >= _PP_K)
    # local[] artifact: the testdata corpus is ONE small parquet file
    # (one input split), which would serialize the md5 shingle scan on
    # a single core. Spread it only in that case; at scale the input
    # has thousands of splits and the text never moves.
    if docs.rdd.getNumPartitions() < par // 2:
        docs = docs.repartition(par)
    sh = (f"array_distinct(transform(sequence(1, length(text) - {_PP_K - 1}), "
          f"i -> CAST(conv(substring(md5(substring(text, i, {_PP_K})), 1, 15), "
          f"16, 10) AS BIGINT)))")
    ex = docs.select("doc_id", F.explode(F.expr(sh)).alias("h")).cache()
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    # set size rides the same doc_id window partitioning as the prefix
    # rank — no separate sizes agg + join (one fewer shuffle)
    wdoc = W.partitionBy("doc_id")
    pref = (ex.join(freq, "h")
              .withColumn("n", F.count(F.lit(1)).over(wdoc))
              .withColumn("rn", F.row_number().over(wdoc.orderBy("f", "h")))
              .filter(F.col("rn") <= F.expr("n - (n + 1) DIV 2 + 1"))
              .select("doc_id", "h", "n"))
    a, b = pref.alias("a"), pref.alias("b")
    cand = (a.join(b, (F.col("a.h") == F.col("b.h"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
             .filter(2 * F.least("a.n", "b.n") >= F.greatest("a.n", "b.n"))
             .select(F.col("a.doc_id").alias("da"),
                     F.col("b.doc_id").alias("db"),
                     F.col("a.n").alias("na"), F.col("b.n").alias("nb"))
             .distinct())
    # When the candidate list is provably small (counted from the
    # cached frame — also materializes the cache the verify stage
    # reuses), broadcast it through the verify joins so NO corpus-sized
    # frame shuffles: ea rides a broadcast join where it sits, and eb
    # is semi-filtered to candidate docs before its shuffle (candidate
    # shingles only, not the corpus). On a near-duplicate-heavy shard
    # the count exceeds the cap and the verify joins shuffle on the
    # bigint keys instead — the semi-filter prune is kept either way.
    cand = cand.cache()
    bc = F.broadcast if cand.count() <= bcast_max else (lambda df: df)
    ea = ex.select(F.col("doc_id").alias("da"), F.col("h").alias("ha"))
    eb = (ex.select(F.col("doc_id").alias("db2"), F.col("h").alias("hb"))
            .join(bc(cand.select(F.col("db").alias("db2")).distinct()),
                  "db2", "left_semi"))
    inter = (ea.join(bc(cand), "da")
               .join(eb, (F.col("db") == F.col("db2"))
                         & (F.col("ha") == F.col("hb")))
               .groupBy("da", "db")
               .agg(F.first("na").alias("na"), F.first("nb").alias("nb"),
                    F.count(F.lit(1)).alias("c")))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    out = (inter.filter(jac >= 0.5)
                .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
                        quantize(jac, 4).alias("jaccard")))
    return pin_result(out, ex, cand)


# ---------------------------------------------------------------------------
# PageRank centrality (integer-scaled, engine-deterministic)
# ---------------------------------------------------------------------------

_PR_R0 = 1_000_000_000_000   # initial rank mass per node (scaled)
_PR_BASE = 200_000_000_000   # (1 - d) * R0 with damping d = 4/5
_PR_ITERS = 3


def _pr_oracle() -> str:
    its = []
    prev = "it0"
    for i in range(1, _PR_ITERS + 1):
        its.append(
            f"it{i} AS (SELECT e.dst AS node, "
            # CAST: DuckDB's sum(BIGINT) widens to HUGEINT, which the
            # driver's (type, value) hash can't match to Spark's BIGINT
            f"CAST({_PR_BASE} + (4 * sum(r.r // d.deg)) // 5 AS BIGINT) AS r "
            f"FROM edges e JOIN deg d ON d.src = e.src "
            f"JOIN {prev} r ON r.node = e.src GROUP BY e.dst)")
        prev = f"it{i}"
    return f"""
    WITH eraw AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM eraw
      UNION ALL SELECT s AS src, c AS dst FROM eraw
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    it0 AS (SELECT src AS node, CAST({_PR_R0} AS BIGINT) AS r FROM deg),
    {", ".join(its)}
    SELECT node // 2 AS entity_id,
           CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
           r AS score
    FROM {prev} ORDER BY r DESC, node LIMIT 20
    """


@query("pagerank_customer_supplier", oracle=_pr_oracle())
def pagerank_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 4/5) over the
    bipartite customer↔supplier trade graph (edge = customer ordered a
    part this supplier shipped) — the iterative-graph-algorithm class
    the reference cannot express at all (merge/sort/range only,
    SURVEY.md §2.1), here as pure DataFrame joins the driver can still
    hash-check because ALL arithmetic is integer: rank mass starts at
    10^12 per node, contributions are `r DIV deg`, damping applies as
    `(4·s) DIV 5` — no float ever, so both engines agree bit-for-bit
    with no tolerance games (k-means, the other iterative op, needs a
    rows-only check for exactly this reason — FP drift).

    Scale: per iteration one partitioned join rank⋈edges + one
    hash agg on dst — the textbook distributed PageRank shape; edges
    are (bigint, bigint) rows co-partitioned by src across iterations,
    dangling mass is structurally absent (bipartite edges run both
    ways, every node has out-degree)."""
    (o, l) = load(spark, sf_dir, "orders", "lineitem")
    raw = (l.join(o, l.l_orderkey == o.o_orderkey)
            .select((F.col("o_custkey") * 2).alias("c"),
                    (F.col("l_suppkey") * 2 + 1).alias("s"))
            .distinct())
    edges = (raw.select(F.col("c").alias("src"), F.col("s").alias("dst"))
                .unionAll(raw.select(F.col("s").alias("src"),
                                     F.col("c").alias("dst"))))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg) reused every iteration — pin it
    ed = edges.join(deg, "src").cache()
    r = deg.select(F.col("src").alias("node"),
                   F.lit(_PR_R0).cast("long").alias("r"))
    for _ in range(_PR_ITERS):
        # |V| ≪ |E|: the rank frame is the dim side, broadcast it so
        # each iteration is a map-side join + ONE agg shuffle on dst.
        # (When V outgrows broadcast, the fallback is co-partitioning
        # ed and r on src/node and reusing that exchange per iter.)
        r = (ed.join(F.broadcast(r), ed.src == r.node)
               .select(F.col("dst"), F.expr("r DIV deg").alias("con"))
               .groupBy("dst")
               .agg(F.expr(f"CAST({_PR_BASE} AS BIGINT) "
                           f"+ (4 * sum(con)) DIV 5").alias("r"))
               .select(F.col("dst").alias("node"), "r"))
    out = (r.orderBy(F.col("r").desc(), F.col("node"))
            .limit(20)
            .select(F.expr("node DIV 2").alias("entity_id"),
                    F.when(F.col("node") % 2 == 0, "cust")
                     .otherwise("supp").alias("kind"),
                    F.col("r").alias("score")))
    return pin_result(out, ed)


# ---------------------------------------------------------------------------
# robust outlier detection: median / MAD in exact cents
# ---------------------------------------------------------------------------

@query(
    "mad_outlier_events",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    m AS (SELECT event_type, CAST(median(cents) AS DOUBLE) AS med
          FROM c GROUP BY event_type),
    j AS (SELECT c.event_type, cents, med, abs(cents - med) AS dev
          FROM c JOIN m USING (event_type)),
    a AS (SELECT event_type, count(*) AS n, any_value(med) AS med,
                 CAST(median(dev) AS DOUBLE) AS mad
          FROM j GROUP BY event_type)
    SELECT a.event_type, any_value(a.n) AS n,
           floor(any_value(a.med) / 100.0 * 10000.0 + 0.5) / 10000.0
             AS med_value,
           floor(any_value(a.mad) / 100.0 * 10000.0 + 0.5) / 10000.0
             AS mad_value,
           CAST(sum(CASE WHEN dev > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           floor(CAST(sum(CASE WHEN dev > 3 * a.mad THEN 1 ELSE 0 END)
                      AS DOUBLE) / any_value(a.n) * 100000.0 + 0.5)
             / 100000.0 AS outlier_frac
    FROM j JOIN a USING (event_type) GROUP BY a.event_type
    """)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: exact median + MAD
    (median absolute deviation), outlier = |x - med| > 3·MAD — the
    estimator a monitoring pipeline wants because mean/stddev are
    themselves dragged by the outliers they should flag (z-score over
    the same data is ``zscore_event_values``; this is its robust twin).

    Exactness: values quantized to BIGINT cents first, so each exact
    median interpolates two integers (→ exact half) or two halves
    (→ exact quarter) — every med/mad/3·mad comparison is bit-equal
    on both engines. Two grouped exact percentiles + one broadcast
    join back; per-group state is the sorted cents distribution,
    bounded per event_type (5 types), and the scale path for wide
    groups is the two-pass partition-histogram median already in
    ``exact_median_per_segment``."""
    (e,) = load(spark, sf_dir, "events")
    c = e.select(
        "event_type",
        F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5))
         .cast("long").alias("cents"))
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med"))
    j = (c.join(F.broadcast(med), "event_type")
          .withColumn("dev", F.abs(F.col("cents") - F.col("med"))))
    stats = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.expr("percentile(dev, 0.5)").alias("mad"))
    # third pass re-derives dev from the base cents + broadcast stats
    # (NOT from j): referencing j here would embed its subtree twice
    # and run the expensive grouped exact median twice per execution
    out = (c.join(F.broadcast(stats), "event_type")
            .withColumn("dev", F.abs(F.col("cents") - F.col("med")))
            .groupBy("event_type")
            .agg(F.first("n").alias("n"), F.first("med").alias("med"),
                 F.first("mad").alias("mad"),
                 F.sum((F.col("dev") > 3 * F.col("mad")).cast("long"))
                  .alias("n_outliers")))
    return out.select(
        "event_type", "n",
        quantize(F.col("med") / 100.0, 4).alias("med_value"),
        quantize(F.col("mad") / 100.0, 4).alias("mad_value"),
        "n_outliers",
        quantize(F.col("n_outliers").cast("double") / F.col("n"), 5)
         .alias("outlier_frac"))


# ---------------------------------------------------------------------------
# chi-square keyword extraction (log-free G-test stand-in)
# ---------------------------------------------------------------------------

# One shared formula string: Spark F.expr and DuckDB parse the same
# text into the same left-associated tree of correctly-rounded double
# ops, so both engines produce bit-identical chi2 (see module doc).
_CHI2 = ("CAST(n AS DOUBLE) * "
         "(CAST(a AS DOUBLE) * (n - t_src - t_tok + a)"
         " - CAST(t_src - a AS DOUBLE) * (t_tok - a)) * "
         "(CAST(a AS DOUBLE) * (n - t_src - t_tok + a)"
         " - CAST(t_src - a AS DOUBLE) * (t_tok - a)) / "
         "((CAST(t_src AS DOUBLE) * (n - t_src)) * "
         "(CAST(t_tok AS DOUBLE) * (n - t_tok)))")


@query(
    "chisq_keywords_per_source",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    st AS (SELECT source, tok, count(*) AS a FROM tok
           WHERE tok != '' GROUP BY source, tok),
    tsrc AS (SELECT source, sum(a) AS t_src FROM st GROUP BY source),
    ttok AS (SELECT tok, sum(a) AS t_tok FROM st GROUP BY tok),
    tot AS (SELECT sum(a) AS n FROM st),
    scored AS (
      SELECT st.source, st.tok, a, {_CHI2} AS chi2
      FROM st JOIN tsrc USING (source) JOIN ttok USING (tok), tot
      WHERE a >= 5
    ),
    ranked AS (
      SELECT source, tok, a, chi2,
             row_number() OVER (PARTITION BY source
                                ORDER BY chi2 DESC, tok) AS rn
      FROM scored
    )
    SELECT source, tok AS token, a AS n_occ,
           floor(chi2 * 1000.0 + 0.5) / 1000.0 AS chi2
    FROM ranked WHERE rn <= 5
    """)
def chisq_keywords_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical keyword extraction: for every (source, token), the
    chi-square statistic of the 2×2 contingency table (token-in-source
    vs rest of corpus); top 5 distinctive tokens per source. The
    standard corpus-linguistics keyness test — chi-square instead of
    Dunning log-likelihood deliberately: `ln` is not correctly rounded
    and differs between libms, while chi-square is a pure rational
    expression (products/differences/one divide of exact integer
    counts) that both engines evaluate bit-identically.

    Scale: token counts are vocab×sources-bounded after the first
    map-side-combined agg; the marginals broadcast; the corpus text is
    read once and never shuffled."""
    (d,) = load(spark, sf_dir, "documents")
    tok = (d.select("source", F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    st = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("a")).cache()
    # marginals over the FULL contingency table; the a >= 5 support
    # filter applies only to which cells get scored (mirrors the oracle)
    tsrc = st.groupBy("source").agg(F.sum("a").alias("t_src"))
    ttok = st.groupBy("tok").agg(F.sum("a").alias("t_tok"))
    tot = st.agg(F.sum("a").alias("n"))
    scored = (st.filter(F.col("a") >= 5)
                .join(F.broadcast(tsrc), "source")
                .join(F.broadcast(ttok), "tok")
                .crossJoin(F.broadcast(tot))
                .withColumn("chi2", F.expr(_CHI2)))
    wsrc = W.partitionBy("source").orderBy(F.col("chi2").desc(), "tok")
    out = (scored.withColumn("rn", F.row_number().over(wsrc))
                 .filter(F.col("rn") <= 5)
                 .select("source", F.col("tok").alias("token"),
                         F.col("a").alias("n_occ"),
                         quantize("chi2", 3).alias("chi2")))
    return pin_result(out, st)


# ---------------------------------------------------------------------------
# join-key skew profiler
# ---------------------------------------------------------------------------

def _skew_oracle_one(col: str) -> str:
    return f"""
    SELECT '{col}' AS key_col, count(*) AS n_keys,
           max(cnt) AS max_cnt,
           floor(CAST(sum(cnt) AS DOUBLE) / count(*) * 10000.0 + 0.5)
             / 10000.0 AS avg_cnt,
           floor(CAST(quantile_cont(cnt, 0.99) AS DOUBLE) * 10000.0 + 0.5)
             / 10000.0 AS p99_cnt,
           floor(CAST(max(cnt) AS DOUBLE)
                 / (CAST(sum(cnt) AS DOUBLE) / count(*)) * 10000.0 + 0.5)
             / 10000.0 AS skew
    FROM (SELECT {col}, count(*) AS cnt FROM lineitem GROUP BY {col})
    """


@query(
    "join_skew_profile",
    oracle=" UNION ALL ".join(
        _skew_oracle_one(c) for c in ("l_orderkey", "l_partkey", "l_suppkey")))
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics over the fact table: for each
    candidate shuffle key, the per-key row-count distribution (#keys,
    max, mean, p99, skew = max/mean) — the profile you read BEFORE
    picking a 100 TB join strategy (skew ≈ 1 → plain shuffle; skew ≫ 1
    → salt that key or rely on AQE skew-join splitting; this repo's
    salted path is ``salted_agg_event_stats``). The engine's own
    planning diagnostic, exposed as a query.

    Scale: one map-side-combined count per key column; the stats agg
    runs over the (key, cnt) frame, never the fact rows. p99 uses the
    exact grouped percentile (per-column state = sorted counts) —
    quantized to absorb interpolation ulp."""
    (l,) = load(spark, sf_dir, "lineitem")
    outs = []
    for colname in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnt = l.groupBy(colname).agg(F.count(F.lit(1)).alias("cnt"))
        outs.append(cnt.agg(
            F.lit(colname).alias("key_col"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            quantize(F.expr("CAST(sum(cnt) AS DOUBLE) / count(*)"), 4)
             .alias("avg_cnt"),
            quantize(F.expr("CAST(percentile(cnt, 0.99) AS DOUBLE)"), 4)
             .alias("p99_cnt"),
            quantize(F.expr("CAST(max(cnt) AS DOUBLE) / "
                            "(CAST(sum(cnt) AS DOUBLE) / count(*))"), 4)
             .alias("skew")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# ---------------------------------------------------------------------------
# exact EWMA (binary half-life weights)
# ---------------------------------------------------------------------------

_EWMA_N = 16  # window: most recent N events per user


@query(
    "ewma_user_spend",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT user_id, cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM c
    )
    SELECT user_id, count(*) AS n_recent,
           floor(CAST(sum(cents * (CAST(1 AS BIGINT) << ({_EWMA_N} - rn)))
                      AS DOUBLE)
                 / sum(CAST(1 AS BIGINT) << ({_EWMA_N} - rn)) / 100.0
                 * 10000.0 + 0.5) / 10000.0 AS ewma_value
    FROM r WHERE rn <= {_EWMA_N} GROUP BY user_id
    """)
def ewma_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event value
    (alpha = 1/2) over the user's 16 most recent events — the
    recency-weighted feature a ranking/abuse model consumes. The usual
    EWMA recurrence is order-dependent float accumulation; this one is
    EXACT: weights are powers of two (shiftleft on BIGINT cents), the
    weighted sum and weight total are pure integer aggregates, and the
    single final division is one correctly-rounded double op — replay-
    and engine-deterministic by construction (same discipline as the
    streaming cents accumulator, ``stream_running_totals_replay``).

    Scale: one per-user window (row_number, user-bounded state), one
    hash agg; integer sums fit BIGINT by construction (cents ≤ 10^7 ·
    2^15 · 16 ≪ 2^63)."""
    (e,) = load(spark, sf_dir, "events")
    c = e.select(
        "user_id", "ts", "event_id",
        F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5))
         .cast("long").alias("cents"))
    wu = W.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                          F.col("event_id").desc())
    r = (c.withColumn("rn", F.row_number().over(wu))
          .filter(F.col("rn") <= _EWMA_N))
    return (r.groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_recent"),
                  F.sum(F.expr(f"cents * shiftleft(CAST(1 AS BIGINT), "
                               f"{_EWMA_N} - rn)")).alias("num"),
                  F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                               f"{_EWMA_N} - rn)")).alias("den"))
             .select("user_id", "n_recent",
                     quantize(F.col("num").cast("double") / F.col("den")
                              / 100.0, 4).alias("ewma_value")))


# ---------------------------------------------------------------------------
# data-quality audit (Deequ-style expectations)
# ---------------------------------------------------------------------------

def _dq_oracle() -> str:
    checks = [
        ("orders_fk_customer_orphans",
         "SELECT count(*) FROM orders o LEFT JOIN customer c "
         "ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
         "SELECT count(*) FROM orders"),
        ("lineitem_fk_orders_orphans",
         "SELECT count(*) FROM lineitem l LEFT JOIN orders o "
         "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
         "SELECT count(*) FROM lineitem"),
        ("events_value_nulls",
         "SELECT count(*) FROM events WHERE value IS NULL",
         "SELECT count(*) FROM events"),
        ("events_id_uniqueness",
         "SELECT count(*) - count(DISTINCT event_id) FROM events",
         "SELECT count(*) FROM events"),
        ("documents_nchars_consistency",
         "SELECT count(*) FROM documents WHERE n_chars != length(text)",
         "SELECT count(*) FROM documents"),
        ("orders_nonpositive_totalprice",
         "SELECT count(*) FROM orders WHERE o_totalprice <= 0",
         "SELECT count(*) FROM orders"),
    ]
    parts = [
        f"SELECT '{nm}' AS check_name, CAST(({viol}) AS BIGINT) AS n_violations, "
        f"CAST(({tot}) AS BIGINT) AS n_total, "
        f"floor(CAST(({viol}) AS DOUBLE) / ({tot}) * 1000000.0 + 0.5) "
        f"/ 1000000.0 AS violation_frac"
        for nm, viol, tot in checks]
    return " UNION ALL ".join(parts)


@query("data_quality_audit", oracle=_dq_oracle())
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectations as one audit query: FK
    orphan counts (referential integrity via anti-joins), null
    fractions, key-uniqueness violations, and derived-column
    consistency — the validation pass a production pipeline runs
    before promoting a snapshot, here over the driver tables with
    every verdict hash-checked.

    Scale: each FK check is an anti-join that broadcasts the DIM side
    key set (customer/orders keys; at 100 TB the orders-side check
    flips to a shuffled left-anti on the sorted key — same plan class
    as core.merge's anti-join path); null/consistency checks fold into
    single-pass map-side aggregates; uniqueness is one count-distinct
    expand. Output is fixed-size (one row per check)."""
    (o, c, l, e, d) = load(spark, sf_dir, "orders", "customer", "lineitem",
                           "events", "documents")

    def row(nm: str, viol, tot):
        return (viol.crossJoin(tot)
                .select(F.lit(nm).alias("check_name"),
                        F.col("v").cast("long").alias("n_violations"),
                        F.col("t").cast("long").alias("n_total"),
                        quantize(F.col("v").cast("double") / F.col("t"), 6)
                         .alias("violation_frac")))

    one = F.count(F.lit(1))
    checks = [
        row("orders_fk_customer_orphans",
            o.join(F.broadcast(c.select("c_custkey")),
                   o.o_custkey == F.col("c_custkey"), "left_anti")
             .agg(one.alias("v")),
            o.agg(one.alias("t"))),
        row("lineitem_fk_orders_orphans",
            l.join(o.select("o_orderkey"),
                   l.l_orderkey == F.col("o_orderkey"), "left_anti")
             .agg(one.alias("v")),
            l.agg(one.alias("t"))),
        row("events_value_nulls",
            e.filter(F.col("value").isNull()).agg(one.alias("v")),
            e.agg(one.alias("t"))),
        row("events_id_uniqueness",
            e.agg((one - F.countDistinct("event_id")).alias("v")),
            e.agg(one.alias("t"))),
        row("documents_nchars_consistency",
            d.filter(F.col("n_chars") != F.length("text")).agg(one.alias("v")),
            d.agg(one.alias("t"))),
        row("orders_nonpositive_totalprice",
            o.filter(F.col("o_totalprice") <= 0).agg(one.alias("v")),
            o.agg(one.alias("t"))),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out


# ---------------------------------------------------------------------------
# table statistics profile (the numbers broadcast decisions read)
# ---------------------------------------------------------------------------

@query(
    "table_stats_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name, count(*) AS n,
           count(DISTINCT o_orderkey) AS ndv,
           count(*) - count(o_orderkey) AS null_cnt,
           CAST(min(o_orderkey) AS BIGINT) AS min_v,
           CAST(max(o_orderkey) AS BIGINT) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(DISTINCT o_custkey),
           count(*) - count(o_custkey),
           CAST(min(o_custkey) AS BIGINT), CAST(max(o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents', count(*),
           count(DISTINCT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
           count(*) - count(o_totalprice),
           CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT),
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_epochday', count(*),
           count(DISTINCT CAST(o_orderdate AS DATE)),
           count(*) - count(o_orderdate),
           CAST(min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT),
           CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)
    FROM orders
    """)
def table_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (count / exact NDV / nulls /
    min / max, integer-encoded) for the orders table — the numbers a
    planner's broadcast/skew decisions and the catalog's cost hints
    read. Exact NDV here is the hash-checkable ground truth; the
    streaming-scale estimator is the HLL++ sketch already in
    ``approx_distinct_users_hll`` (mergeable partials, rows-only).

    Scale: one scan per stat family with map-side partial aggregation;
    NDV is the only expand; min/max/null ride the same pass. Output is
    one row per profiled column."""
    (o,) = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    eday = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    specs = [
        ("o_orderkey", F.col("o_orderkey")),
        ("o_custkey", F.col("o_custkey")),
        ("o_totalprice_cents", cents),
        ("o_orderdate_epochday", eday),
    ]
    outs = []
    for nm, col in specs:
        outs.append(o.select(col.alias("x")).agg(
            F.lit(nm).alias("col_name"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("x").alias("ndv"),
            (F.count(F.lit(1)) - F.count("x")).alias("null_cnt"),
            F.min("x").cast("long").alias("min_v"),
            F.max("x").cast("long").alias("max_v")))
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out


# ---------------------------------------------------------------------------
# market-basket co-occurrence (association mining, A-priori level 2)
# ---------------------------------------------------------------------------

@query(
    "frequent_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, count(*) AS support
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    ),
    ranked AS (
      SELECT part_a, part_b, support,
             row_number() OVER (ORDER BY support DESC, part_a, part_b) AS rn
      FROM pairs WHERE support >= 2
    )
    SELECT part_a, part_b, support FROM ranked WHERE rn <= 20
    """)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (A-priori level 2): the top-20
    part pairs most often bought together in one order — the
    recommendation / bundling signal. Pure integer counts, rank
    tiebroken on the pair ids, so the hash oracle is exact.

    Scale: the pair generation is the per-basket self-join — fan-out
    bounded by basket size squared (≤ 13² here, and in any real order
    system two-digit), NEVER corpus-sized; the count agg map-side
    combines on 16-byte pair keys. The top-20 is a TakeOrdered, no
    global window. A-priori's support-threshold pruning (drop items
    below min support before pairing) is the same broadcast-filter
    pattern as ``benchmark_contamination`` when baskets are wider."""
    (l,) = load(spark, sf_dir, "lineitem")
    items = l.select(F.col("l_orderkey").alias("o"),
                     F.col("l_partkey").alias("p")).distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (a.join(b, (F.col("a.o") == F.col("b.o"))
                       & (F.col("a.p") < F.col("b.p")))
              .groupBy(F.col("a.p").alias("part_a"),
                       F.col("b.p").alias("part_b"))
              .agg(F.count(F.lit(1)).alias("support"))
              .filter(F.col("support") >= 2))
    return (pairs.orderBy(F.col("support").desc(), "part_a", "part_b")
                 .limit(20)
                 .select("part_a", "part_b", "support"))


# ---------------------------------------------------------------------------
# hopping (sliding) windows in batch mode
# ---------------------------------------------------------------------------

@query(
    "hopping_window_counts",
    oracle="""
    WITH hops AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts)
               - j * INTERVAL '15 minutes' AS window_start,
             event_type,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events, unnest([0, 1, 2, 3]) AS t(j)
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           event_type, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM hops GROUP BY window_start, event_type
    """)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) event-time windows in batch mode: 1-hour
    windows advancing every 15 minutes, so each event lands in exactly
    4 overlapping windows — the smoothed-rate view dashboards want,
    complementing the tumbling/session replays in the streaming layer
    (the same ``F.window`` spec runs unchanged under readStream).
    Value folded as BIGINT cents — exact.

    Scale: Spark's window() assignment is a map-side generate (4 rows
    per event, a constant), then one partial-aggregated shuffle on
    (window, type) — cardinality = time-range/slide × types, not event
    count. The epoch-aligned window origin matches DuckDB's
    time_bucket, so both engines assign identical windows."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5)) \
             .cast("long")
    return (e.select(F.window("ts", "1 hour", "15 minutes").alias("w"),
                     "event_type", cents.alias("cents"))
             .groupBy("w", "event_type")
             .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
             .select(F.col("w.start").alias("window_start"),
                     F.col("w.end").alias("window_end"),
                     "event_type", "n", "cents"))


# ---------------------------------------------------------------------------
# rolling exact median (robust rolling statistics)
# ---------------------------------------------------------------------------

@query(
    "rolling_median_user_value",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id,
           floor(CAST(median(cents) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / 100.0 * 10000.0 + 0.5) / 10000.0 AS med5_value
    FROM c
    """)
def rolling_median_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median of each user's last 5 event values — the
    robust trend line (a rolling mean follows every spike; the rolling
    median doesn't). Pairs with ``mad_outlier_events`` (global robust
    stats) as the windowed variant.

    Exactness: BIGINT cents in, so the 5-row exact median is an
    integer or an exact half — bit-equal across engines (module doc).
    Scale: one per-user window with a constant 5-row frame — state is
    O(frame), partitioning grows with users; the percentile aggregate
    over a ROWS frame recomputes per row over 5 values, a constant."""
    (e,) = load(spark, sf_dir, "events")
    c = e.select(
        "event_id", "user_id", "ts",
        F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5))
         .cast("long").alias("cents"))
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-4, 0))
    return c.select(
        "event_id", "user_id",
        quantize(F.expr("percentile(cents, 0.5)").over(w) / 100.0, 4)
         .alias("med5_value"))


# ---------------------------------------------------------------------------
# time-series imputation: linear interpolation of missing values
# ---------------------------------------------------------------------------

@query(
    "linear_interpolation_fill",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS t,
             CASE WHEN value IS NULL THEN NULL
                  ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) END AS cents
      FROM events
    ),
    nav AS (
      SELECT event_id, user_id, t, cents,
             last_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN cents IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN cents IS NOT NULL THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM c
    )
    SELECT event_id, user_id, (cents IS NULL) AS was_null,
           floor(CASE
             WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt != pt THEN
               CAST(pv AS DOUBLE) + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                 * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
             WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE)
             ELSE CAST(nv AS DOUBLE)
           END / 100.0 * 10000.0 + 0.5) / 10000.0 AS filled_value
    FROM nav
    """)
def linear_interpolation_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation over a real gap pattern (events.value
    is genuinely null for ~several %% of rows — the audit query counts
    them): per user, a null value fills by LINEAR INTERPOLATION in
    event time between the nearest non-null neighbors, falling back to
    last/next-observation-carried at the sequence edges. The standard
    sensor/metrics repair pass.

    Exactness: neighbors and timestamps are BIGINTs (cents, epoch
    micros); the one interpolation expression is an identical chain of
    correctly-rounded double ops on both engines (module doc), then
    quantized. Scale: two navigation windows per user partition (state
    = one value+timestamp pair each direction), no joins at all."""
    (e,) = load(spark, sf_dir, "events")
    c = e.select(
        "event_id", "user_id",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("value").isNull(), F.lit(None).cast("long"))
         .otherwise(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
         .alias("cents"))
    back = (W.partitionBy("user_id").orderBy("t", "event_id")
             .rowsBetween(W.unboundedPreceding, -1))
    fwd = (W.partitionBy("user_id").orderBy("t", "event_id")
            .rowsBetween(1, W.unboundedFollowing))
    t_nn = F.when(F.col("cents").isNotNull(), F.col("t"))
    nav = c.select(
        "event_id", "user_id", "t", "cents",
        F.last("cents", ignorenulls=True).over(back).alias("pv"),
        F.last(t_nn, ignorenulls=True).over(back).alias("pt"),
        F.first("cents", ignorenulls=True).over(fwd).alias("nv"),
        F.first(t_nn, ignorenulls=True).over(fwd).alias("nt"))
    # nt != pt guard: both neighbors can share one micro-timestamp
    # (nanos-truncated ts) — 0/0 there is NULL on Spark but NaN on
    # DuckDB, so the degenerate case must fall through to LOCF
    filled = F.when(
        F.col("cents").isNotNull(), F.col("cents").cast("double")
    ).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull()
        & (F.col("nt") != F.col("pt")),
        F.col("pv").cast("double")
        + (F.col("nv").cast("double") - F.col("pv").cast("double"))
        * ((F.col("t") - F.col("pt")).cast("double")
           / (F.col("nt") - F.col("pt")).cast("double"))
    ).when(F.col("pv").isNotNull(), F.col("pv").cast("double")
    ).otherwise(F.col("nv").cast("double"))
    return nav.select(
        "event_id", "user_id",
        F.col("cents").isNull().alias("was_null"),
        quantize(filled / 100.0, 4).alias("filled_value"))


# ---------------------------------------------------------------------------
# weighted sampling via hash priorities (reservoir-style, deterministic)
# ---------------------------------------------------------------------------

@query(
    "weighted_doc_sample",
    oracle="""
    WITH pr AS (
      SELECT source, doc_id, n_chars,
             CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 15)) AS BIGINT) AS DOUBLE)
               / n_chars AS priority
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY priority, doc_id) AS rn
      FROM pr
    )
    SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 10
    """)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (10 docs per source,
    inclusion odds ∝ n_chars): each doc gets priority hash(id)/weight
    and the k smallest priorities win — the hash-priority variant of
    reservoir sampling (A-Res family) with the random draw replaced by
    a content hash, so the sample is REPRODUCIBLE across runs, engines
    and repartitionings (the property a training-data pipeline needs
    for auditable subsets). The usual u^(1/w) form needs pow — not
    correctly rounded across libms — while hash/weight is one exact
    division, identical on both engines.

    Scale: priorities are map-only; the per-stratum top-k runs as a
    rank window that WindowGroupLimit prunes map-side (each partition
    keeps ≤ k candidates before the shuffle), the same shape as
    ``stratified_sample_per_lang``."""
    (d,) = load(spark, sf_dir, "documents")
    pr = (d.filter(F.col("n_chars") > 0)
           .select("source", "doc_id", "n_chars",
                   (F.conv(F.md5(F.col("doc_id").cast("string"))
                           .substr(1, 15), 16, 10).cast("bigint")
                    .cast("double") / F.col("n_chars")).alias("priority")))
    w = W.partitionBy("source").orderBy("priority", "doc_id")
    return (pr.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= 10)
              .select("source", "doc_id", "n_chars"))


# ---------------------------------------------------------------------------
# behavioral diversity: Gini-Simpson index (log-free entropy analog)
# ---------------------------------------------------------------------------

@query(
    "simpson_diversity_users",
    oracle="""
    WITH cnt AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    agg AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
             count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS ss
      FROM cnt GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           floor((1.0 - CAST(ss AS DOUBLE) / (n_events * n_events))
                 * 1000000.0 + 0.5) / 1000000.0 AS simpson_diversity
    FROM agg
    """)
def simpson_diversity_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity as the GINI-SIMPSON index
    1 − Σpᵢ² over the user's event-type distribution — the quality/
    anomaly signal (bots repeat one action → index ≈ 0) a pipeline
    would normally reach for Shannon entropy to get; Simpson is chosen
    because it is a pure RATIONAL statistic: Σc² and n² are exact
    BIGINTs and one division + subtraction are correctly-rounded — no
    `ln`, so both engines agree bit-for-bit (module doc).

    Scale: two map-side-combined aggregations, (user, type) then user;
    state is types-bounded per user; no windows, no joins."""
    (e,) = load(spark, sf_dir, "events")
    cnt = (e.groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("c")))
    return (cnt.groupBy("user_id")
               .agg(F.sum("c").alias("n_events"),
                    F.count(F.lit(1)).alias("n_types"),
                    F.sum(F.col("c") * F.col("c")).alias("ss"))
               .select("user_id", "n_events", "n_types",
                       quantize(F.lit(1.0) - F.col("ss").cast("double")
                                / (F.col("n_events") * F.col("n_events")),
                                6).alias("simpson_diversity")))
