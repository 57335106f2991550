"""Transitive dedup clustering + corpus-statistics operators over
``documents`` — north-star LLM-pipeline set (SURVEY.md §2.9).

``minhash_lsh_candidates`` (queries/text.py) stops at candidate PAIRS;
a real dedup pipeline needs the transitive closure — near-dup is not
transitive, so A~B and B~C must land A, B, C in ONE cluster with one
canonical survivor. That closure is a connected-components computation,
the iterative-graph-algorithm class the reference cannot express at all
(its only dataflow ops are merge/sort/range, SURVEY.md §2.1).

Scale design notes live on each query; the shared theme: the corpus
text never enters the graph — nodes/edges are (bigint, bigint) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, pin_result, quantize, quantize_sql
from .text import _MH_SEEDS, _N_BANDS, _SHINGLE_K, _TOKENS, _TOKENS_DUCK

# ---------------------------------------------------------------------------
# connected-components dedup clustering
# ---------------------------------------------------------------------------

# Shared edge definition (Spark and oracle must agree exactly):
# MinHash band buckets (same signature family as minhash_lsh_candidates)
# are hyperedges; each bucket contributes STAR edges doc↔hub where
# hub = min(doc_id) in the bucket. Stars preserve connectivity while
# keeping the edge count O(bucket size) instead of the O(size²) clique.

# CTE chain up to the per-doc cluster assignment — shared verbatim by
# the dedup_cluster_components oracle and the near-dup-aware corpus
# prep oracle (pipeline.py), so both engines agree on ONE edge/closure
# definition.
_CC_CTES = f"""sh AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
           i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT)) AS hs
  FROM documents WHERE length(text) >= {_SHINGLE_K}
),
sig AS (
  SELECT doc_id, {", ".join(
      f"list_aggregate(list_transform(hs, h -> xor(h, CAST({s} AS BIGINT))), 'min') AS h{j}"
      for j, s in enumerate(_MH_SEEDS))}
  FROM sh
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_id, h{2*b} AS bx, h{2*b+1} AS by FROM sig"
      for b in range(_N_BANDS))}
),
hubs AS (
  SELECT band_id, bx, by, min(doc_id) AS hub
  FROM bands GROUP BY band_id, bx, by
),
star AS (
  SELECT DISTINCT b.doc_id AS src, h.hub AS dst
  FROM bands b JOIN hubs h USING (band_id, bx, by)
  WHERE b.doc_id != h.hub
),
edges AS (SELECT src, dst FROM star UNION SELECT dst AS src, src AS dst FROM star),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
reach AS (
  SELECT doc_id, doc_id AS comp FROM nodes
  UNION
  SELECT e.dst AS doc_id, r.comp
  FROM reach r JOIN edges e ON e.src = r.doc_id
),
assign AS (SELECT doc_id, min(comp) AS cluster_id FROM reach GROUP BY doc_id)"""

_CC_ORACLE = f"""
WITH RECURSIVE {_CC_CTES}
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM assign
"""


_CC_LABEL_CACHE: dict = {}


def minhash_band_edges_for(df: DataFrame, key_col: str = "doc_id",
                           text_col: str = "text",
                           shingle_k: int = _SHINGLE_K):
    """MinHash-LSH star edges over ANY (key, text) table — the
    generalized surface behind ``cc_cluster_labels`` and the CLI's
    ``dedup-near`` verb. Returns (sig, edges), BOTH persisted (the
    caller unpersists): sig = (doc_id, h0..h7) signatures; edges =
    bidirectional doc↔bucket-hub star edges, repartitioned by the
    per-round join key so the iterative closure never re-shuffles
    them. Same signature family and edge definition as ``_CC_CTES``."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    docs = (df.select(F.col(key_col).alias("doc_id"),
                      F.col(text_col).alias("text"))
              .filter(F.length("text") >= shingle_k).repartition(par))
    shingle_hashes = (
        f"transform(sequence(1, length(text) - {shingle_k - 1}), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {shingle_k})), "
        f"1, 15), 16, 10) AS BIGINT))")
    # persist the signatures: bands feeds BOTH the hub agg and the star
    # join, and without pinning, each subtree re-runs the
    # md5-per-shingle scan (the most expensive stage — one hash per
    # character of corpus). The signature frame is (doc_id, 8 x bigint)
    # — tiny relative to text, and exactly what a production pipeline
    # materializes anyway.
    sig = (docs.withColumn("hs", F.expr(shingle_hashes))
               .select("doc_id", *[
                   F.expr(f"array_min(transform(hs, h -> h ^ CAST({s} AS BIGINT)))")
                    .alias(f"h{j}")
                   for j, s in enumerate(_MH_SEEDS)])
               .persist())
    band_exprs = ", ".join(f"{b}, h{2*b}, h{2*b+1}" for b in range(_N_BANDS))
    bands = sig.selectExpr(
        "doc_id", f"stack({_N_BANDS}, {band_exprs}) AS (band_id, bx, by)")

    keys = ["band_id", "bx", "by"]
    hubs = bands.groupBy(*keys).agg(F.min("doc_id").alias("hub"))
    star = (bands.join(hubs, keys)
                 .filter(F.col("doc_id") != F.col("hub"))
                 .select(F.col("doc_id").alias("src"),
                         F.col("hub").alias("dst"))
                 .distinct())
    # partition the STATIC edge relation once by the per-round join key
    # (dst): every iteration then shuffles only the shrinking label
    # frame, never the edges — the graph-loop move that matters when
    # the edge set is billions of rows
    edges = (star.union(star.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(F.col("dst"))
                 .persist())
    return sig, edges


def cc_labels_from_edges(edges: DataFrame,
                         numeric_key: bool = True) -> DataFrame:
    """Iterative min-label connected components over a persisted
    bidirectional (src, dst) edge frame → (doc_id, comp) labels.
    Labels only decrease, so with a NUMERIC key the global label sum
    is a monotone convergence witness (one cheap agg per round); a
    non-numeric key (string doc ids through ``dedup-near``) falls back
    to a changed-rows check — one extra tiny join per round over the
    label frame, never the edges."""
    # seed labels with the best DIRECT neighbor (min over own id and
    # neighbor ids) — starts the propagation one round ahead
    labels = (edges.groupBy(F.col("src").alias("doc_id"))
                   .agg(F.least(F.min("dst"), F.first("src")).alias("comp"))
                   .localCheckpoint(eager=False))
    # the witness sum is DECIMAL(38,0): a bigint sum of ~1e10 labels
    # up to 2^63 wraps int64 silently (non-ANSI), and a wrapped sum
    # that happens to equal the previous round's is a FALSE fixpoint —
    # decimal keeps the monotone witness exact to ~1e38
    wsum = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(wsum).first()[0] if numeric_key else None
    prev = labels
    while True:
        nbr_min = (edges.join(labels, edges["dst"] == labels["doc_id"])
                        .groupBy("src").agg(F.min("comp").alias("nbr_comp")))
        stepped = (labels.join(nbr_min, labels["doc_id"] == nbr_min["src"],
                               "left")
                         .select(labels["doc_id"],
                                 F.least("comp", "nbr_comp").alias("comp")))
        # pointer jumping: also adopt the label OF the current label
        # (comp -> comp's comp), squaring path lengths per round —
        # hub→hub chains otherwise cost one round per hop (measured 9
        # rounds at sf0.1; ~4 with the jump). The jump join is over the
        # label frame only (graph nodes, not the corpus).
        hop = stepped.select(F.col("doc_id").alias("h_id"),
                             F.col("comp").alias("h_comp"))
        # lazy localCheckpoint: the convergence probe below is the
        # single action per round — it materializes the new labels AND
        # tests the fixpoint
        labels = (stepped.join(hop, stepped["comp"] == hop["h_id"], "left")
                         .select(stepped["doc_id"],
                                 F.least("comp", "h_comp").alias("comp"))
                         .localCheckpoint(eager=False))
        if numeric_key:
            cur_sum = labels.agg(wsum).first()[0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            changed = (labels.withColumnRenamed("comp", "nc")
                             .join(prev, "doc_id")
                             .filter(F.col("nc") != F.col("comp"))
                             .limit(1).count())
            if changed == 0:
                break
            prev = labels
    return labels


def cc_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels (doc_id, comp) over the MinHash-LSH
    candidate graph — the engine side of ``_CC_CTES``; only docs that
    appear in some band bucket with a neighbor get a row. See
    ``dedup_cluster_components`` for the design discussion.

    Session-memoized: both ``dedup_cluster_components`` and
    ``corpus_prep_near_dedup`` consume these labels, and the label
    frame is the expensive shared subplan (md5-per-shingle scan + the
    iterative closure). The cache key includes the source file's
    (mtime, size) so a changed corpus invalidates — the in-session
    analog of the engine's content-keyed memo layer (``plans/views``),
    which covers the persistent case."""
    import os

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        cache_key = (id(spark), src, st.st_mtime_ns, st.st_size)
    except OSError:
        cache_key = None
    if cache_key is not None and cache_key in _CC_LABEL_CACHE:
        return _CC_LABEL_CACHE[cache_key]
    (d,) = load(spark, sf_dir, "documents")
    sig, edges = minhash_band_edges_for(d)
    labels = cc_labels_from_edges(edges)
    edges.unpersist()
    sig.unpersist()
    if cache_key is not None:
        # labels are localCheckpoint'd (pinned RDD) — safe to share.
        # Hold a few corpora (bench warms at sf0.001 then times at the
        # target SF, so two live keys per run is the norm).
        if len(_CC_LABEL_CACHE) >= 4:
            _CC_LABEL_CACHE.clear()
        _CC_LABEL_CACHE[cache_key] = labels
    return labels


@query("dedup_cluster_components", oracle=_CC_ORACLE)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    candidate graph, cluster id = min doc_id (the canonical survivor).

    Graph: band buckets → star edges to the bucket hub (min doc) —
    O(bucket) edges, never the O(bucket²) clique. Components via
    iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels; converged when the
    global label sum stops falling (labels only decrease, so the sum
    is a monotone convergence witness — one cheap agg instead of a
    changed-rows join).

    100 TB design: per round = one shuffle-join of (bigint, bigint)
    edges against labels + a partial-aggregated min — rounds ≈ graph
    diameter (near-dup clusters are shallow; large-star/small-star
    bounds it at log n if ever needed). Labels are localCheckpoint'd
    each round so the plan/lineage stays O(1) across iterations
    instead of doubling. The oracle is a recursive-CTE reachability
    closure (DuckDB), fine at sf but quadratic-ish in cluster size —
    the iterative form IS the scale path.
    """
    labels = cc_cluster_labels(spark, sf_dir)
    wc = W.partitionBy("cluster_id")
    return (labels.select("doc_id", F.col("comp").alias("cluster_id"))
                  .withColumn("cluster_size", F.count(F.lit(1)).over(wc)))


_NUMERIC_KEYS = ("tinyint", "smallint", "int", "bigint")


def dedup_near(eng, table: str, out: str, text_col: str = "text",
               clusters_table: str | None = None,
               shingle_k: int = _SHINGLE_K) -> dict:
    """User-reachable near-dup dedup: the CLI's ``dedup-near`` body —
    the `dedup-substrings` companion for the MinHash family.

    MinHash-LSH candidates over any catalog (key, text) table → star
    edges → min-label connected components → keep the min-key SURVIVOR
    of each cluster, drop the rest. Writes ``out`` (all source
    columns, survivors only) and optionally ``clusters_table``
    (key, cluster_id, cluster_size — survivors have key ==
    cluster_id), both in ONE atomic root swap. Detector contract: same
    signature family / band scheme as ``minhash_lsh_candidates``
    (candidate recall is probabilistic by design; clustering of
    detected candidates is exact and transitive). String keys work —
    the closure falls back to the changed-rows convergence witness."""
    from ..operators.core import KeyedTable

    t = eng.load_table(table)
    if len(t.key_cols) != 1:
        raise ValueError("dedup-near needs a single-column key")
    key = t.key_cols[0]
    if text_col not in t.df.columns:
        raise ValueError(f"no column {text_col!r} in {table}")
    numeric = dict(t.df.dtypes)[key] in _NUMERIC_KEYS
    sig, edges = minhash_band_edges_for(t.df, key, text_col,
                                        int(shingle_k))
    labels = cc_labels_from_edges(edges, numeric_key=numeric)
    # every clustered non-representative is a drop; docs with no edges
    # never enter `labels` and survive untouched
    drop = (labels.filter(F.col("doc_id") != F.col("comp"))
                  .select(F.col("doc_id").alias(key)))
    stats: dict = {"ok": True, "detector": "minhash-lsh", "table": out}
    with eng.transaction():
        out_df = t.df.join(drop, key, "left_anti")
        stats["table_hash"] = eng.save_table(out, KeyedTable(out_df,
                                                             (key,)))
        if clusters_table:
            wc = W.partitionBy("cluster_id")
            cl = (labels.select(F.col("doc_id").alias(key),
                                F.col("comp").alias("cluster_id"))
                        .withColumn("cluster_size",
                                    F.count(F.lit(1)).over(wc)))
            eng.save_table(clusters_table, KeyedTable(cl, (key,)))
            stats["clusters_table"] = clusters_table
        stats["rows_in"] = t.df.count()
        stats["rows_out"] = out_df.count()
        stats["dups_removed"] = stats["rows_in"] - stats["rows_out"]
        stats["clusters"] = (labels.select("comp").distinct().count())
    edges.unpersist()
    sig.unpersist()
    return stats


# ---------------------------------------------------------------------------
# sliding-window document chunking (context-window prep)
# ---------------------------------------------------------------------------

_CHUNK = 40    # tokens per chunk
_STRIDE = 30   # tokens between chunk starts (overlap = _CHUNK - _STRIDE)


@query(
    "doc_chunking_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_DUCK} AS toks
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, CAST(s // {_STRIDE} AS BIGINT) AS chunk_id,
           least({_CHUNK}, len(toks) - s) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, s + 1, s + {_CHUNK}), ' ')) AS chunk_hash
    FROM (SELECT doc_id, toks, unnest(range(0, len(toks), {_STRIDE})) AS s FROM t)
    """)
def doc_chunking_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the training-data prep step that cuts
    long documents into overlapping {_CHUNK}-token windows (stride
    {_STRIDE}). 1→N generate: sequence() of chunk starts → explode →
    slice. Output carries the chunk hash, not the chunk text, so the
    wide string never shuffles; a real pipeline writes chunks
    partitioned by hash prefix. Map-only narrow plan — zero shuffles,
    whole-stage codegen end to end."""
    (d,) = load(spark, sf_dir, "documents")
    t = (d.filter(F.length("text") > 0)
          .select("doc_id", F.expr(_TOKENS).alias("toks"))
          .filter(F.size("toks") >= 1))
    starts = f"sequence(0, size(toks) - 1, {_STRIDE})"
    return (t.select("doc_id", "toks",
                     F.explode(F.expr(starts)).alias("s"))
             .select("doc_id",
                     (F.col("s") / _STRIDE).cast("long").alias("chunk_id"),
                     F.least(F.lit(_CHUNK), F.size("toks") - F.col("s"))
                      .cast("long").alias("n_chunk_tokens"),
                     F.md5(F.concat_ws(" ", F.expr(f"slice(toks, s + 1, {_CHUNK})"))
                            .cast("binary")).alias("chunk_hash")))


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

_TOP_TERMS = 3


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
    tok AS (SELECT doc_id, unnest({_TOKENS_DUCK}) AS term FROM d),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS dft FROM tf GROUP BY term),
    nn AS (SELECT count(*) AS n_docs FROM d)
    SELECT doc_id, term, {quantize_sql("tf * ln(CAST(n_docs AS DOUBLE) / dft)", 4)} AS tfidf, rk
    FROM (SELECT doc_id, term, tf, dft, n_docs,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / dft) DESC, term) AS rk
          FROM tf JOIN dfreq USING (term) CROSS JOIN nn)
    WHERE rk <= {_TOP_TERMS}
    """)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top {_TOP_TERMS} terms per document
    by tf·ln(N/df), term as tiebreaker. Plan: explode → two hash aggs
    (both map-side partial) → BROADCAST the document-frequency table
    back onto tf (vocabulary ≪ corpus) → per-doc WindowGroupLimit
    top-k. N is computed once driver-side (a count, deterministic)
    and embedded as a literal, so the big side joins nothing else.
    At 100 TB the only wide shuffle is (doc_id, term) partial counts —
    text itself never shuffles."""
    (d,) = load(spark, sf_dir, "documents")
    docs = d.filter(F.length("text") > 0)
    n_docs = docs.count()
    # cache: tf feeds BOTH the document-frequency agg and the final
    # join — without it the corpus-wide explode runs twice; (doc, term)
    # counts are vocabulary-sized, far smaller than the text they came
    # from, so materializing them once is the 100 TB move
    tf = (docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
              .groupBy("doc_id", "term")
              .agg(F.count(F.lit(1)).alias("tf"))
              .cache())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    tfidf = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("dft"))
    w = W.partitionBy("doc_id").orderBy(tfidf.desc(), "term")
    out = (tf.join(F.broadcast(dfreq), "term")
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= _TOP_TERMS)
             .select("doc_id", "term", quantize(tfidf, 4).alias("tfidf"), "rk"))
    return pin_result(out, tf)


# ---------------------------------------------------------------------------
# corpus heavy hitters (top bigrams)
# ---------------------------------------------------------------------------

_TOP_NGRAMS = 20


@query(
    "heavy_hitter_bigrams",
    oracle=f"""
    WITH t AS (
      SELECT {_TOKENS_DUCK} AS toks FROM documents WHERE length(text) > 0
    )
    SELECT bigram, count(*) AS n_occurrences
    FROM (SELECT unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS bigram
          FROM t)
    GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT {_TOP_NGRAMS}
    """)
def heavy_hitter_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters: top {_TOP_NGRAMS} bigrams by
    occurrence count (bigram text as tiebreaker). Plan: map-only
    bigram generate → hash agg with map-side partial combine (the
    shuffle is vocabulary-sized, not corpus-sized) → TakeOrdered
    top-k (per-partition top-k then a driver merge of {_TOP_NGRAMS}
    rows — no global sort). At 100 TB, if the vocabulary itself blew
    up, the standard fix is a count-min-sketch pre-pass to gate rare
    n-grams out of the exact agg; unnecessary at any realistic bigram
    vocabulary."""
    (d,) = load(spark, sf_dir, "documents")
    bigrams = (f"transform(sequence(1, size(toks) - 1), "
               f"i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
    return (d.filter(F.length("text") > 0)
             .select(F.expr(_TOKENS).alias("toks"))
             .filter(F.size("toks") >= 2)
             .select(F.explode(F.expr(bigrams)).alias("bigram"))
             .groupBy("bigram")
             .agg(F.count(F.lit(1)).alias("n_occurrences"))
             .orderBy(F.col("n_occurrences").desc(), "bigram")
             .limit(_TOP_NGRAMS))


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered) over the co-supply graph
# ---------------------------------------------------------------------------

@query(
    "triangle_count_cosupply",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s
      FROM lineitem WHERE l_quantity > 45
    ),
    e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
    ),
    nodes AS (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e),
    deg AS (SELECT n, count(*) AS d FROM nodes GROUP BY n),
    tri AS (
      SELECT count(*) AS t
      FROM e e1
      JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT t FROM tri) AS n_triangles,
           floor(6.0 * (SELECT t FROM tri)
                 / (SELECT sum(d * (d - 1)) FROM deg)
                 * 1000000.0 + 0.5) / 1000000.0 AS clustering_coef
    """)
def triangle_count_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    co-supply graph (suppliers sharing a high-quantity part), via the
    DEGREE-ORDERED orientation (Suri & Vassilvitskii's MR algorithm):
    each undirected edge points from its (degree, id)-smaller endpoint
    to the larger, every triangle then has exactly ONE node with two
    out-edges, and the count is |wedges of out-edges whose far ends
    are themselves an edge|.

    Scale: the naive wedge join explodes on hubs — a degree-d node
    contributes d(d-1)/2 wedges, and real co-occurrence graphs are
    power-law. Orientation caps out-degree at O(sqrt(E)) for ANY
    degree distribution, so the wedge set is O(E^1.5) worst-case
    instead of O(Σd²), all as equi-joins (never a cartesian). The
    oracle counts the same triangles with the id-ordered textbook
    3-way self-join — orientation must be invisible in the totals.
    The graph is (int, int) edges; lineitem text/price columns never
    enter the shuffle."""
    (li,) = load(spark, sf_dir, "lineitem")
    ps = (li.filter(F.col("l_quantity") > 45)
            .select(F.col("l_partkey").alias("p"),
                    F.col("l_suppkey").alias("s"))
            .distinct())
    e = (ps.alias("a").join(ps.alias("b"),
                            (F.col("a.p") == F.col("b.p"))
                            & (F.col("a.s") < F.col("b.s")))
           .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
           .distinct())
    e = e.localCheckpoint(eager=True)   # reused 4x below
    deg = (e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    # orient by (degree, id): u -> v iff (d_u, u) < (d_v, v)
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ew = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    fwd = (F.col("du") < F.col("dv")) | \
          ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    oriented = ew.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"))
    # wedges of two out-edges; close with the canonical undirected edge
    w = (oriented.alias("x").join(oriented.alias("y"),
                                  (F.col("x.src") == F.col("y.src"))
                                  & (F.col("x.dst") < F.col("y.dst")))
                 .select(F.col("x.dst").alias("u"),
                         F.col("y.dst").alias("v")))
    closed = w.join(e, ["u", "v"], "left_semi")
    n_tri = closed.count()
    n_edges = e.count()
    stats = deg.agg(F.count(F.lit(1)).alias("n_nodes"),
                    F.sum(F.col("d") * (F.col("d") - 1)).alias("dd")).first()
    coef = 0.0 if not stats["dd"] else \
        __import__("math").floor(6.0 * n_tri / stats["dd"]
                                 * 1000000.0 + 0.5) / 1000000.0
    out = spark.createDataFrame(
        [(stats["n_nodes"], n_edges, n_tri, coef)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint, "
        "clustering_coef double")
    e.unpersist()
    return out
