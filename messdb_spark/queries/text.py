"""Text-analysis + deduplication operators over ``documents`` —
north-star LLM-pipeline set (SURVEY.md §2.9). All JVM-side column
expressions (no Python UDFs): tokenization via split/filter,
hashing via md5 (bit-identical to the DuckDB oracle).

Scale notes: exact dedup = one hash-agg shuffle on the fingerprint.
N-gram Jaccard is quadratic in colliding shingles, so the exact
variant runs on a deterministic sample; the scale path is MinHash-LSH
(``minhash_lsh_candidates``), which only joins within signature-band
buckets — that is the 100 TB design, the exact-Jaccard query is its
verification oracle on the sample."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, pin_result, quantize

# tokenization shared by the text queries: whitespace split, drop empties
_TOKENS = "filter(split(text, '\\\\s+'), x -> x != '')"
_TOKENS_DUCK = "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint, count(*) AS n_copies,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, min doc_id as canonical.
    One shuffle on the 128-bit fingerprint; at 100 TB hash first,
    shuffle only (hash, id) — never the text."""
    (d,) = load(spark, sf_dir, "documents")
    return (d.groupBy(F.md5(F.col("text").cast("binary")).alias("fingerprint"))
             .agg(F.count(F.lit(1)).alias("n_copies"),
                  F.min("doc_id").alias("canonical_id")))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint: lowercase, collapse whitespace,
    md5. Narrow map-only job — no shuffle."""
    (d,) = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(norm.cast("binary")).alias("fingerprint"))


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id, length(text) AS n_chars,
           len({_TOKENS_DUCK}) AS n_tokens,
           len(list_distinct({_TOKENS_DUCK})) AS n_distinct_tokens,
           floor((list_aggregate(list_transform({_TOKENS_DUCK}, x -> CAST(length(x) AS DOUBLE)), 'sum')
                 / len({_TOKENS_DUCK})) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_token_len,
           floor((CAST(len(list_distinct({_TOKENS_DUCK})) AS DOUBLE)
                 / len({_TOKENS_DUCK})) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS ttr
    FROM documents WHERE length(text) > 0
    """)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token stats + type-token ratio per document.
    Pure column expressions — whole-stage codegen, no shuffle."""
    (d,) = load(spark, sf_dir, "documents")
    toks = F.expr(_TOKENS)
    n_toks = F.size(toks)
    return (d.filter(F.length("text") > 0)
             .select(
                 "doc_id",
                 F.length("text").alias("n_chars"),
                 n_toks.cast("long").alias("n_tokens"),
                 F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
                 quantize(F.expr(f"aggregate({_TOKENS}, CAST(0.0 AS DOUBLE), (a, x) -> a + length(x))")
                         / n_toks, 4).alias("avg_token_len"),
                 quantize(F.size(F.array_distinct(toks)).cast("double") / n_toks, 4)
                  .alias("ttr")))


@query(
    "token_stats_by_lang",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(len({_TOKENS_DUCK})) AS BIGINT) AS total_tokens,
           floor((avg(CAST(len({_TOKENS_DUCK}) AS DOUBLE))) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS avg_tokens
    FROM documents GROUP BY lang
    """)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language tag."""
    (d,) = load(spark, sf_dir, "documents")
    n_toks = F.size(F.expr(_TOKENS))
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(n_toks.cast("long")).alias("total_tokens"),
                  quantize(F.avg(n_toks.cast("double")), 4).alias("avg_tokens")))


_SW_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_SW_SPARK = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "lang_id_stopwords",
    oracle=f"""
    SELECT doc_id, lang,
           floor((CAST(len(list_intersect(list_distinct({_TOKENS_DUCK}), {_SW_SQL})) AS DOUBLE)
                 / len(list_distinct({_TOKENS_DUCK}))) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS en_score,
           CASE WHEN len(list_intersect(list_distinct({_TOKENS_DUCK}), {_SW_SQL})) >= 3
                THEN 'en_like' ELSE 'other' END AS pred
    FROM documents WHERE length(text) > 0
    """)
def lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit ratio over distinct tokens.
    (Set-intersection sizes are order-independent, so Spark's
    array_intersect and DuckDB's list_intersect agree.)"""
    (d,) = load(spark, sf_dir, "documents")
    distinct_toks = F.array_distinct(F.expr(_TOKENS))
    hits = F.size(F.array_intersect(distinct_toks, F.expr(f"array({_SW_SPARK})")))
    return (d.filter(F.length("text") > 0)
             .select("doc_id", "lang",
                     quantize(hits.cast("double") / F.size(distinct_toks), 4)
                      .alias("en_score"),
                     F.when(hits >= 3, "en_like").otherwise("other").alias("pred")))


# ---- near-duplicate detection ----------------------------------------

_SHINGLE_K = 8

@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
                 i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT))) AS s
        FROM documents
        WHERE doc_id % 10 = 0 AND length(text) >= {_SHINGLE_K})
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           floor((CAST(c AS DOUBLE) / (sa.n + sb.n - c)) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id
               JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.08
    """)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs on a 1/10 deterministic
    sample (the quadratic exact check; MinHash-LSH below is the full-
    corpus scale path). Shingle-join → pair counts → Jaccard ≥ 0.08
    (threshold tuned to the synthetic corpus so the gate checks real
    pairs). Shingles are 60-bit md5-derived ints, not strings — the
    self-join shuffles 8-byte keys; and the exploded frame is cached
    because it feeds three plan branches (sizes + both join sides)."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    sample = (d.filter((F.col("doc_id") % 10 == 0) & (F.length("text") >= _SHINGLE_K))
               .repartition(par))
    hashed = (f"array_distinct(transform(sequence(1, length(text) - {_SHINGLE_K - 1}),"
              f" i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT)))")
    sh = (sample.select("doc_id", F.explode(F.expr(hashed)).alias("s"))).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s")) &
                       (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
              .agg(F.count(F.lit(1)).alias("c")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("c").cast("double") /
           (F.col("sa.n") + F.col("sb.n") - F.col("c")))
    out = (inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
                .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
                .filter(jac >= 0.08)
                .select("doc_a", "doc_b", quantize(jac, 4).alias("jaccard")))
    return pin_result(out, sh)


_N_HASHES = 8
_N_BANDS = 4  # rows-per-band = 2

# One md5 per shingle → 60-bit int; the _N_HASHES signature functions
# are xor-seed remixes of that single hash (a standard cheap MinHash
# family: min over h ^ seed_j). Seeds are deterministic 59-bit
# constants derived from md5("seed<j>") so both engines embed the same
# literals.
import hashlib as _hl  # noqa: E402

_MH_SEEDS = [int(_hl.md5(f"seed{j}".encode()).hexdigest()[:15], 16) >> 1
             for j in range(_N_HASHES)]


@query(
    "minhash_lsh_candidates",
    oracle=f"""
    WITH sh AS (
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
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.bx = b.bx AND a.by = b.by
         AND a.doc_id < b.doc_id
    """)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding — the scale path for near-dup detection.

    Each shingle is md5'd ONCE into a 60-bit int; the 8 signature
    functions are xor-seed remixes (min over h^seed_j), so the CPU
    cost is one hash per shingle, not one per (shingle, function).
    Signatures are array_min over a transform of the shingle array — a
    map-only narrow operation, NO shuffle of the exploded shingle
    space. Candidate generation joins only within (band_id, bx, by)
    bigint buckets — no quadratic pair space, no string band-hash.
    100 TB plan: shuffle is O(docs × bands), never O(docs²) and never
    O(total shingles)."""
    (d,) = load(spark, sf_dir, "documents")
    # the signature map is CPU-bound (n_shingles md5 per doc); a
    # single local parquet file arrives as one split, so spread it
    # round-robin across cores first (at cluster scale the scan already
    # has many splits and this repartition is a cheap rebalance)
    par = spark.sparkContext.defaultParallelism
    docs = d.filter(F.length("text") >= _SHINGLE_K).repartition(par)
    shingle_hashes = (
        f"transform(sequence(1, length(text) - {_SHINGLE_K - 1}), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT))")
    sig = (docs.withColumn("hs", F.expr(shingle_hashes))
               .select("doc_id", *[
                   F.expr(f"array_min(transform(hs, h -> h ^ CAST({s} AS BIGINT)))")
                    .alias(f"h{j}")
                   for j, s in enumerate(_MH_SEEDS)]))
    band_exprs = ", ".join(
        f"{b}, h{2*b}, h{2*b+1}" for b in range(_N_BANDS))
    # cache: the band self-join would otherwise recompute the CPU-bound
    # signature map on BOTH sides; signatures are O(docs × bands) longs
    # (tiny vs the corpus), materializing them once is the 100 TB move
    bands = sig.selectExpr(
        "doc_id",
        f"stack({_N_BANDS}, {band_exprs}) AS (band_id, bx, by)").cache()
    a = bands.alias("a")
    b = bands.alias("b")
    out = (a.join(b, (F.col("a.band_id") == F.col("b.band_id")) &
                     (F.col("a.bx") == F.col("b.bx")) &
                     (F.col("a.by") == F.col("b.by")) &
                     (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    return pin_result(out, bands)


@query(
    "stratified_sample_per_lang",
    oracle="""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) t
    WHERE rk <= 20
    """)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the corpus-curation op for
    balanced training mixes: a fixed per-language quota selected by
    hash rank (md5 of the key), so the sample is reproducible across
    engines and runs, unlike TABLESAMPLE. Plan: one scan, one shuffle
    on lang; WindowGroupLimit prunes each partition to the quota
    before the final sort, so the shuffle carries only winners at
    scale."""
    (d,) = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id")
    return (d.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 20)
             .select("lang", "doc_id"))


_DECON_T = 60   # min shared 8-shingles to flag contamination


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents
                    WHERE doc_id % 97 <> 0 AND length(text) >= {_SHINGLE_K}),
    bench AS (SELECT text FROM documents
              WHERE doc_id % 97 = 0 AND length(text) >= {_SHINGLE_K}),
    csh AS (SELECT DISTINCT doc_id, s FROM (
      SELECT doc_id, unnest(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
        i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT))) AS s
      FROM corpus)),
    bsh AS (SELECT DISTINCT s FROM (
      SELECT unnest(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
        i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT))) AS s
      FROM bench))
    SELECT doc_id, count(*) AS n_shared
    FROM csh JOIN bsh USING (s)
    GROUP BY doc_id HAVING count(*) >= {_DECON_T}
    """)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination — flag training docs sharing >= {_DECON_T}
    distinct 8-gram shingles with a held-out benchmark set (here the
    doc_id % 97 == 0 slice stands in for the benchmark). Scale shape:
    the benchmark shingle set is small and DISTINCT — it broadcasts —
    so the corpus side never shuffles; shingles are 60-bit md5 ints
    (8-byte keys, never strings)."""
    (d,) = load(spark, sf_dir, "documents")
    hashed = (f"array_distinct(transform(sequence(1, length(text) - {_SHINGLE_K - 1}),"
              f" i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT)))")
    # the testdata is one small parquet file = a 1-partition scan; spread
    # the per-row md5 shingling across cores (at corpus scale the scan
    # is already parallel and this repartition would be dropped)
    par = spark.sparkContext.defaultParallelism
    eligible = d.filter(F.length("text") >= _SHINGLE_K).repartition(par)
    csh = (eligible.filter(F.col("doc_id") % 97 != 0)
                   .select("doc_id", F.explode(F.expr(hashed)).alias("s")))
    bsh = (eligible.filter(F.col("doc_id") % 97 == 0)
                   .select(F.explode(F.expr(hashed)).alias("s"))
                   .distinct())
    return (csh.join(F.broadcast(bsh), "s")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_shared"))
               .filter(F.col("n_shared") >= _DECON_T))


_PII_PAT = r"\b(key|hash|merge)\b"   # stand-in lexical PII patterns


@query(
    "pii_redaction_stats",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_PAT}')) AS n_redacted,
           md5(regexp_replace(text, '{_PII_PAT}', '[REDACTED]', 'g')) AS redacted_md5
    FROM documents
    WHERE len(regexp_extract_all(text, '{_PII_PAT}')) > 0
    """)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction pass — the PII-scrubbing shape (regex find + replace +
    audit count) over the corpus; the synthetic text has no real PII,
    so three lexical tokens stand in for the e-mail/phone patterns a
    production list would use (word-boundary regex runs identically in
    Java regex and RE2, which is what makes the md5 of the redacted
    text oracle-checkable). Pure narrow projection: no shuffle, regex
    inside whole-stage codegen."""
    (d,) = load(spark, sf_dir, "documents")
    n = F.regexp_count(F.col("text"), F.lit(_PII_PAT))
    red = F.regexp_replace(F.col("text"), _PII_PAT, "[REDACTED]")
    return (d.select("doc_id", n.alias("n_redacted"),
                     F.md5(red.cast("binary")).alias("redacted_md5"))
             .filter(F.col("n_redacted") > 0))


_FUZZY_SEGS = 3   # dist<=2 substitutions can touch <=2 of 3 segments


@query(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH segs AS (
      SELECT p_partkey AS key, p_name AS name, p_brand AS brand,
             length(p_name) AS ln, r.range AS j,
             substring(p_name,
                       CAST(r.range * floor(length(p_name) / {_FUZZY_SEGS}) AS INT) + 1,
                       CASE WHEN r.range < {_FUZZY_SEGS - 1}
                            THEN CAST(floor(length(p_name) / {_FUZZY_SEGS}) AS INT)
                            ELSE length(p_name)
                                 - {_FUZZY_SEGS - 1} * CAST(floor(length(p_name) / {_FUZZY_SEGS}) AS INT)
                       END) AS seg
      FROM part CROSS JOIN range({_FUZZY_SEGS}) r
    ),
    cands AS (
      SELECT DISTINCT a.key AS key_a, b.key AS key_b,
             a.name AS name_a, b.name AS name_b
      FROM segs a JOIN segs b
        ON a.brand = b.brand AND a.ln = b.ln AND a.j = b.j AND a.seg = b.seg
           AND a.key < b.key
    )
    SELECT key_a, key_b, levenshtein(name_a, name_b) AS dist
    FROM cands
    WHERE levenshtein(name_a, name_b) <= 2
    """)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) duplicate detection with SCALABLE
    blocking — the string-similarity dedup family's third member next
    to shingle Jaccard and MinHash.

    Two-level plan (dedupe the ATTRIBUTE, then expand the cliques):

    1. Collapse rows to distinct (brand, name) groups — real corpora
       repeat values heavily (this table: 20k rows but only ~1.6k
       groups at sf0.1), and edit distance depends only on the value.
    2. Block the distinct names by (brand, length, segment_idx,
       segment_value): each name splits into {_FUZZY_SEGS} contiguous
       segments and, by pigeonhole, any equal-length pair within <=2
       substitutions agrees exactly on >=1 segment (alignment-shifting
       edit scripts are MinHash/SimHash's job). The segment VALUE keeps
       block cardinality growing with the data so blocks stay bounded.
    3. Levenshtein once per distinct name pair, not once per row pair.
    4. Expand matches back to key pairs through group membership:
       cross-name matches become group_a x group_b key pairs
       (least/greatest orders them); same-name groups of k rows
       contribute their k-choose-2 clique at dist 0.

    Every join's build side is group-level (broadcastable); the only
    row-level shuffle is the initial groupBy. Worst case (all values
    unique) degrades to exactly the one-level plan plus one groupBy."""
    (p,) = load(spark, sf_dir, "part")
    keys = p.select(F.col("p_partkey").alias("key"),
                    F.col("p_brand").alias("brand"),
                    F.col("p_name").alias("name"))
    groups = keys.groupBy("brand", "name").agg(
        F.count(F.lit(1)).alias("n_keys"))
    ln = F.length("name")
    seg_len = F.floor(ln / _FUZZY_SEGS).cast("int")
    segs_arr = F.array(*[
        F.col("name").substr(
            (F.lit(j) * seg_len + 1).cast("int"),
            seg_len if j < _FUZZY_SEGS - 1
            else (ln - (_FUZZY_SEGS - 1) * seg_len).cast("int"))
        for j in range(_FUZZY_SEGS)])
    segs = groups.select("brand", "name", ln.alias("ln"),
                         F.posexplode(segs_arr).alias("j", "seg"))
    a, b = segs.alias("a"), segs.alias("b")
    cand = (a.join(F.broadcast(b),
                   (F.col("a.brand") == F.col("b.brand")) &
                   (F.col("a.ln") == F.col("b.ln")) &
                   (F.col("a.j") == F.col("b.j")) &
                   (F.col("a.seg") == F.col("b.seg")) &
                   (F.col("a.name") < F.col("b.name")))
             .select(F.col("a.brand").alias("brand"),
                     F.col("a.name").alias("name_a"),
                     F.col("b.name").alias("name_b"))
             .distinct())
    cross = (cand.withColumn("dist", F.levenshtein("name_a", "name_b"))
                 .filter(F.col("dist") <= 2))
    same = (groups.filter(F.col("n_keys") >= 2)
                  .select("brand", F.col("name").alias("name_a"),
                          F.col("name").alias("name_b"),
                          F.lit(0).alias("dist")))
    pairs = cross.unionByName(same)
    k1 = keys.select("brand", F.col("name").alias("name_a"),
                     F.col("key").alias("ka"))
    k2 = keys.select("brand", F.col("name").alias("name_b"),
                     F.col("key").alias("kb"))
    # pairs is group-level (broadcast); the k2 join is row-level on
    # both sides — an equi-shuffle at scale, AQE-broadcast locally
    return (k1.join(F.broadcast(pairs), ["brand", "name_a"])
              .join(k2, ["brand", "name_b"])
              .filter((F.col("name_a") != F.col("name_b"))
                      | (F.col("ka") < F.col("kb")))
              .select(F.least("ka", "kb").alias("key_a"),
                      F.greatest("ka", "kb").alias("key_b"), "dist"))


_JAC_THRESH = 0.5


@query(
    "lsh_candidates_verified",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
               i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT))) AS hset
      FROM documents WHERE length(text) >= {_SHINGLE_K}
    ),
    sig AS (
      SELECT doc_id, {", ".join(
          f"list_aggregate(list_transform(hset, h -> xor(h, CAST({s} AS BIGINT))), 'min') AS h{j}"
          for j, s in enumerate(_MH_SEEDS))}
      FROM sh
    ),
    bands AS (
      {" UNION ALL ".join(
          f"SELECT doc_id, {b} AS band_id, h{2*b} AS bx, h{2*b+1} AS by FROM sig"
          for b in range(_N_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        USING (band_id, bx, by)
      WHERE a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           floor((CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE)
                  / CAST(len(x.hset) + len(y.hset)
                         - len(list_intersect(x.hset, y.hset)) AS DOUBLE))
                 * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE)
             AS jaccard
    FROM cand c JOIN sh x ON x.doc_id = c.doc_a
                JOIN sh y ON y.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE)
          / CAST(len(x.hset) + len(y.hset)
                 - len(list_intersect(x.hset, y.hset)) AS DOUBLE)
          >= {_JAC_THRESH}
    """)
def lsh_candidates_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical two-stage near-dup pipeline in ONE query:
    MinHash-LSH candidate generation (probabilistic, band equi-join)
    followed by EXACT shingle-Jaccard verification of only the
    candidates, gated at {_JAC_THRESH} — generation bounds the pair
    space, verification removes the false positives, so the output is
    exact-above-threshold minus only LSH false negatives.

    Note the signature functions min over the DISTINCT shingle set
    (equivalent to min over the multiset — duplicates never win a
    min twice) so one shingle-set frame serves both stages.

    Scale: stage 1 is the banded equi-join (no all-pairs); stage 2
    joins candidate PAIRS (tiny) back to the shingle-set frame twice —
    the sets travel only for candidate docs, never corpus-wide.
    array_intersect on two sorted-ish arrays is per-pair CPU bounded
    by doc length."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    docs = d.filter(F.length("text") >= _SHINGLE_K).repartition(par)
    shingle_hashes = (
        f"array_distinct(transform(sequence(1, length(text) - {_SHINGLE_K - 1}), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT)))")
    sh = (docs.select("doc_id", F.expr(shingle_hashes).alias("hset"))
              .persist())
    sig = sh.select("doc_id", *[
        F.expr(f"array_min(transform(hset, h -> h ^ CAST({s} AS BIGINT)))")
         .alias(f"h{j}")
        for j, s in enumerate(_MH_SEEDS)])
    band_exprs = ", ".join(f"{b}, h{2*b}, h{2*b+1}" for b in range(_N_BANDS))
    bands = sig.selectExpr(
        "doc_id", f"stack({_N_BANDS}, {band_exprs}) AS (band_id, bx, by)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_id") == F.col("b.band_id")) &
                      (F.col("a.bx") == F.col("b.bx")) &
                      (F.col("a.by") == F.col("b.by")) &
                      (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    x = sh.select(F.col("doc_id").alias("doc_a"), F.col("hset").alias("hx"))
    y = sh.select(F.col("doc_id").alias("doc_b"), F.col("hset").alias("hy"))
    inter = F.size(F.array_intersect("hx", "hy")).cast("double")
    union = (F.size("hx") + F.size("hy")).cast("double") - inter
    jac = inter / union
    out = (cand.join(x, "doc_a").join(y, "doc_b")
               .filter(jac >= _JAC_THRESH)
               .select("doc_a", "doc_b", quantize(jac, 4).alias("jaccard")))
    return out


# ---- corpus-level statistics (entropy, Zipf fit, sketch accuracy) ----

_LN_SCALE = 1_000_000    # fixed-point micro-nats: ln values become exact
                         # integers so sums are order-insensitive on both
                         # engines (the decimal-cents discipline for logs)


@query(
    "token_entropy_per_source",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOKENS_DUCK}) AS token
      FROM documents WHERE length(text) > 0
    ),
    cnt AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
    scaled AS (
      SELECT source, c,
             CAST(floor(ln(CAST(c AS DOUBLE)) * {_LN_SCALE} + 0.5)
                  AS BIGINT) AS t
      FROM cnt
    ),
    agg AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS vocab,
             CAST(sum(c * t) AS BIGINT) AS s
      FROM scaled GROUP BY source
    )
    SELECT source, n_tokens, vocab,
           floor(((CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * {_LN_SCALE}
                              + 0.5) AS BIGINT) * n_tokens - s) / CAST(
                  n_tokens AS DOUBLE) / {_LN_SCALE}.0)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS entropy_nats
    FROM agg
    """)
def token_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per source — the
    corpus-diversity statistic of pretraining data audits (low entropy
    = templated/boilerplate source; high = diverse text). Identity
    used: H = ln N − (Σ c·ln c)/N over per-source token counts.

    FP parity: each ln is computed on an INTEGER count, scaled to
    micro-nats and floored to a BIGINT, so the big summation is exact
    integer arithmetic — order-insensitive on both engines — and only
    one final double division remains (quantized).

    Scale: one token-count shuffle (vocab-bounded partials), one
    per-source combine; nothing corpus-length-sized survives the first
    aggregation."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select("source", F.explode(F.expr(_TOKENS)).alias("token")))
    cnt = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c"))
    t = F.floor(F.log(F.col("c").cast("double")) * _LN_SCALE
                + F.lit(0.5)).cast("long")
    agg = (cnt.withColumn("t", t)
              .groupBy("source")
              .agg(F.sum("c").alias("n_tokens"),
                   F.count(F.lit(1)).alias("vocab"),
                   F.sum(F.col("c") * F.col("t")).alias("s")))
    t_n = F.floor(F.log(F.col("n_tokens").cast("double")) * _LN_SCALE
                  + F.lit(0.5)).cast("long")
    h = ((t_n * F.col("n_tokens") - F.col("s")).cast("double")
         / F.col("n_tokens").cast("double") / F.lit(float(_LN_SCALE)))
    return agg.select("source", "n_tokens", "vocab",
                      quantize(h, 4).alias("entropy_nats"))


_ZIPF_TOP = 1000


@query(
    "zipf_token_rank_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKENS_DUCK}) AS token
      FROM documents WHERE length(text) > 0
    ),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rn
      FROM cnt
    ),
    pts AS (
      SELECT CAST(floor(ln(CAST(rn AS DOUBLE)) * {_LN_SCALE} + 0.5)
                  AS BIGINT) AS x,
             CAST(floor(ln(CAST(c AS DOUBLE)) * {_LN_SCALE} + 0.5)
                  AS BIGINT) AS y
      FROM ranked WHERE rn <= {_ZIPF_TOP}
    ),
    s AS (
      SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                 * CAST(1000000.0 AS DOUBLE) + 0.5)
             / CAST(1000000.0 AS DOUBLE) AS zipf_slope,
           floor(((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) / {_LN_SCALE}.0)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS intercept_ln
    FROM s
    """)
def zipf_token_rank_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS slope of ln(freq) on
    ln(rank) for the top-{_ZIPF_TOP} tokens — the classic sanity check
    that a training corpus has natural-language frequency structure
    (slope ≈ −1; templated or synthetic text bends it). Deterministic
    ranks (freq desc, token tiebreak); each ln is computed on an
    integer and floored to micro-nats, so all five OLS sums are exact
    integers and the closed-form slope/intercept are single double
    expressions (quantized) on both engines.

    Scale: vocab-bounded count shuffle; the top-K rank is a
    WindowGroupLimit-style single ordered spill of K winners; the fit
    itself is a 5-number aggregate."""
    (d,) = load(spark, sf_dir, "documents")
    toks = (d.filter(F.length("text") > 0)
             .select(F.explode(F.expr(_TOKENS)).alias("token")))
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    ranked = cnt.withColumn(
        "rn", F.row_number().over(W.orderBy(F.desc("c"), F.col("token"))))
    ln_i = lambda col: F.floor(   # noqa: E731
        F.log(F.col(col).cast("double")) * _LN_SCALE + F.lit(0.5)) \
        .cast("long")
    pts = (ranked.filter(F.col("rn") <= _ZIPF_TOP)
                 .select(ln_i("rn").alias("x"), ln_i("c").alias("y")))
    s = pts.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
                F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"))
    nd = F.col("n").cast("double")
    slope = ((nd * F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double"))
             / (nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")))
    intercept = ((F.col("sy").cast("double") - slope
                  * F.col("sx").cast("double")) / nd
                 / F.lit(float(_LN_SCALE)))
    return s.select(F.col("n").cast("long").alias("n_terms"),
                    quantize(slope, 6).alias("zipf_slope"),
                    quantize(intercept, 4).alias("intercept_ln"))


_MH_EST_SIG_DUCK = ", ".join(
    f"list_aggregate(list_transform(hs, h -> xor(h, CAST({s} AS BIGINT))),"
    f" 'min') AS h{j}" for j, s in enumerate(_MH_SEEDS))
_MH_EST_BANDS_DUCK = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, h{2*b} AS bx, h{2*b+1} AS by FROM sig"
    for b in range(_N_BANDS))
_MH_EST_MATCH_DUCK = " + ".join(
    f"CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END"
    for j in range(_N_HASHES))


@query(
    "minhash_estimate_error",
    oracle=f"""
    WITH sh0 AS (
      SELECT doc_id,
             list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
               i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT)) AS hs
      FROM documents WHERE length(text) >= {_SHINGLE_K}
    ),
    sig AS (SELECT doc_id, {_MH_EST_SIG_DUCK} FROM sh0),
    bands AS ({_MH_EST_BANDS_DUCK}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.bx = b.bx AND a.by = b.by
           AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, unnest(hs) AS s FROM sh0),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c JOIN sh a ON a.doc_id = c.doc_a
                  JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           CAST({_MH_EST_MATCH_DUCK} AS BIGINT) AS est_match,
           floor((CAST(coalesce(i.i, 0) AS DOUBLE)
                  / (za.n + zb.n - coalesce(i.i, 0)))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS jaccard_exact,
           floor(abs(CAST(({_MH_EST_MATCH_DUCK}) AS DOUBLE) / {_N_HASHES}.0
                     - CAST(coalesce(i.i, 0) AS DOUBLE)
                       / (za.n + zb.n - coalesce(i.i, 0)))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS abs_err
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
    JOIN sizes za ON za.doc_id = c.doc_a
    JOIN sizes zb ON zb.doc_id = c.doc_b
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    """)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy evaluation: for every LSH candidate pair, the
    MinHash-ESTIMATED Jaccard (matching fraction of the {_N_HASHES}
    signature functions) against the EXACT shingle-set Jaccard, with
    the absolute estimation error — the eval that tells you whether
    the banded sketch can be trusted as the 100 TB dedup gate, run as
    a first-class query (the ``ann_recall_eval`` pattern applied to
    MinHash). All md5-derived → full value-hash oracle.

    Scale: signatures and bands are the standard map-only/band-join
    path; the exact side runs ONLY on candidate docs (semi-join-
    pruned shingle join), so the quadratic verification is
    candidate-bounded, never corpus-wide."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    docs = d.filter(F.length("text") >= _SHINGLE_K).repartition(par)
    shingle_hashes = (
        f"transform(sequence(1, length(text) - {_SHINGLE_K - 1}), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT))")
    sig = (docs.withColumn("hs", F.expr(shingle_hashes))
               .select("doc_id", "hs", *[
                   F.expr(f"array_min(transform(hs, h -> h ^ CAST({s} AS BIGINT)))")
                    .alias(f"h{j}")
                   for j, s in enumerate(_MH_SEEDS)])).cache()
    band_exprs = ", ".join(f"{b}, h{2*b}, h{2*b+1}" for b in range(_N_BANDS))
    bands = sig.selectExpr(
        "doc_id", f"stack({_N_BANDS}, {band_exprs}) AS (band_id, bx, by)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.bx") == F.col("b.bx"))
                   & (F.col("a.by") == F.col("b.by"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct()).cache()
    cand_docs = (cand.select(F.col("doc_a").alias("doc_id"))
                 .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
                 .distinct())
    sh = (sig.join(cand_docs, "doc_id", "left_semi")
             .select("doc_id",
                     F.explode(F.expr("array_distinct(hs)")).alias("s")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sha, shb = sh.alias("sa0"), sh.alias("sb0")
    inter = (cand.join(sha, F.col("doc_a") == F.col("sa0.doc_id"))
                 .join(shb, (F.col("doc_b") == F.col("sb0.doc_id"))
                       & (F.col("sa0.s") == F.col("sb0.s")))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("i")))
    siga = sig.select("doc_id", *[F.col(f"h{j}").alias(f"ha{j}")
                                  for j in range(_N_HASHES)])
    sigb = sig.select("doc_id", *[F.col(f"h{j}").alias(f"hb{j}")
                                  for j in range(_N_HASHES)])
    est_match = sum(
        (F.col(f"ha{j}") == F.col(f"hb{j}")).cast("long")
        for j in range(_N_HASHES))
    za = sizes.select(F.col("doc_id").alias("za_id"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("zb_id"), F.col("n").alias("nb"))
    ii = F.coalesce(F.col("i"), F.lit(0))
    jac = ii.cast("double") / (F.col("na") + F.col("nb") - ii)
    est_j = est_match.cast("double") / float(_N_HASHES)
    out = (cand.join(siga, cand["doc_a"] == siga["doc_id"])
               .join(sigb, cand["doc_b"] == sigb["doc_id"])
               .join(za, cand["doc_a"] == F.col("za_id"))
               .join(zb, cand["doc_b"] == F.col("zb_id"))
               .join(inter, ["doc_a", "doc_b"], "left")
               .select("doc_a", "doc_b",
                       est_match.cast("long").alias("est_match"),
                       quantize(jac, 4).alias("jaccard_exact"),
                       quantize(F.abs(est_j - jac), 4).alias("abs_err")))
    return pin_result(out, sig, cand)


_RAKE_TOP = 20
_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)


@query(
    "keyword_extraction_rake",
    oracle=f"""
    WITH tl AS (
      SELECT doc_id, {_TOKENS_DUCK} AS t
      FROM documents WHERE length(text) > 0
    ),
    tok AS (
      SELECT doc_id, lower(t[j]) AS tok, j AS pos
      FROM tl, unnest(range(1, len(t) + 1)) AS r(j)
    ),
    marked AS (
      SELECT doc_id, tok, pos,
             CASE WHEN tok IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END AS st
      FROM tok
    ),
    runs0 AS (
      -- window BEFORE the stopword filter (WHERE evaluates before
      -- window functions, which would zero every phrase boundary)
      SELECT doc_id, tok, pos, st,
             sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      FROM marked
    ),
    runs AS (
      SELECT doc_id, tok, pos, phrase_id FROM runs0 WHERE st = 0
    ),
    phrases AS (
      SELECT doc_id, phrase_id,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             count(*) AS plen
      FROM runs GROUP BY doc_id, phrase_id
    ),
    wordstats AS (
      SELECT r.tok, count(*) AS freq,
             CAST(sum(p.plen) AS BIGINT) AS deg
      FROM runs r JOIN phrases p
        ON p.doc_id = r.doc_id AND p.phrase_id = r.phrase_id
      GROUP BY r.tok
    ),
    wordscore AS (
      SELECT tok, CAST(deg * 1000000 // freq AS BIGINT) AS uscore
      FROM wordstats
    ),
    phrase_scores AS (
      SELECT p.phrase, count(*) AS n_occurrences,
             CAST(min(ps.s) AS BIGINT) AS score_micro
      FROM phrases p JOIN (
        SELECT r.doc_id, r.phrase_id, CAST(sum(w.uscore) AS BIGINT) AS s
        FROM runs r JOIN wordscore w ON w.tok = r.tok
        GROUP BY r.doc_id, r.phrase_id
      ) ps ON ps.doc_id = p.doc_id AND ps.phrase_id = p.phrase_id
      GROUP BY p.phrase
    )
    SELECT phrase, n_occurrences, score_micro, rk FROM (
      SELECT phrase, n_occurrences, score_micro,
             row_number() OVER (ORDER BY score_micro DESC, phrase) AS rk
      FROM phrase_scores) t
    WHERE rk <= {_RAKE_TOP}
    """)
def keyword_extraction_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs; each word
    scores degree/frequency (degree = total length of phrases it
    appears in), a phrase scores the sum of its word scores; top-20
    phrases by score. The corpus-level keyword surfacing step of a
    topic/quality audit pipeline.

    FP parity: word scores are EXACT integer micro-units
    (deg·1e6 div freq — integer division on both engines), so phrase
    sums are exact integers; ranks break ties lexicographically.

    Scale: phrase segmentation is a per-doc window (doc-length
    bounded); word stats are vocab-bounded aggregations; phrase
    re-scoring joins the vocab-bounded score table back to runs —
    nothing corpus-quadratic anywhere."""
    (d,) = load(spark, sf_dir, "documents")
    tok = (d.filter(F.length("text") > 0)
            .select("doc_id", F.posexplode(F.expr(_TOKENS))
                    .alias("pos0", "tok0"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                    F.lower("tok0").alias("tok")))
    st = F.when(F.col("tok").isin(*_STOPWORDS), 1).otherwise(0)
    marked = tok.withColumn("st", st)
    runs = (marked.withColumn(
                "phrase_id",
                F.sum("st").over(W.partitionBy("doc_id").orderBy("pos")))
                  .filter(F.col("st") == 0)
                  .select("doc_id", "tok", "pos", "phrase_id")).cache()
    phrases = (runs.groupBy("doc_id", "phrase_id")
               .agg(F.expr(
                    "concat_ws(' ', transform(array_sort("
                    "collect_list(struct(pos, tok)),"
                    " (x, y) -> CASE WHEN x.pos < y.pos THEN -1"
                    " WHEN x.pos > y.pos THEN 1 ELSE 0 END),"
                    " e -> e.tok))").alias("phrase"),
                    F.count(F.lit(1)).alias("plen")))
    wordstats = (runs.join(phrases, ["doc_id", "phrase_id"])
                     .groupBy("tok")
                     .agg(F.count(F.lit(1)).alias("freq"),
                          F.sum("plen").alias("deg")))
    wordscore = wordstats.select(
        "tok", F.expr("deg * 1000000 div freq").alias("uscore"))
    run_scores = (runs.join(F.broadcast(wordscore), "tok")
                      .groupBy("doc_id", "phrase_id")
                      .agg(F.sum("uscore").alias("s")))
    phrase_scores = (phrases.join(run_scores, ["doc_id", "phrase_id"])
                     .groupBy("phrase")
                     .agg(F.count(F.lit(1)).alias("n_occurrences"),
                          F.min("s").alias("score_micro")))
    w = W.orderBy(F.desc("score_micro"), F.col("phrase"))
    out = (phrase_scores.withColumn("rk", F.row_number().over(w))
                        .filter(F.col("rk") <= _RAKE_TOP)
                        .select("phrase", "n_occurrences",
                                "score_micro", "rk"))
    return pin_result(out, runs)


@query(
    "ngram_novelty_scores",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
                 i -> CAST(concat('0x', substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15)) AS BIGINT))) AS s
        FROM documents WHERE length(text) >= {_SHINGLE_K})
    ),
    first_seen AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
    per_doc AS (
      SELECT sh.doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM sh JOIN first_seen f ON f.s = sh.s
      GROUP BY sh.doc_id
    )
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(p.n_shingles) AS BIGINT) AS shingles,
           CAST(sum(p.n_novel) AS BIGINT) AS novel,
           floor((CAST(sum(p.n_novel) AS DOUBLE)
                  / CAST(sum(p.n_shingles) AS DOUBLE))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS novelty,
           CAST(sum(CASE WHEN p.n_novel * 10 < p.n_shingles * 2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stale_docs
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    """)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental novelty audit: for each document (in doc_id arrival
    order), the fraction of its distinct 8-gram hashes never seen in
    any earlier document — the dedup-rate-over-time curve a crawl
    pipeline watches to decide when a source is exhausted. Documents
    under 20% novelty count as stale (integer cross-multiplied gate,
    no float compare); rolled up per source.

    Scale: one distinct-shingle pass, one min-doc aggregation keyed by
    the 60-bit shingle hash (8-byte shuffle, text never moves), one
    join back — all linear; 'first occurrence wins' is exactly the
    arrival-ordered semantics of a streaming dedup ledger."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    hashed = (f"array_distinct(transform(sequence(1, length(text) - {_SHINGLE_K - 1}),"
              f" i -> CAST(conv(substring(md5(substring(text, i, {_SHINGLE_K})), 1, 15), 16, 10) AS BIGINT)))")
    sh = (d.filter(F.length("text") >= _SHINGLE_K).repartition(par)
           .select("doc_id", F.explode(F.expr(hashed)).alias("s"))).cache()
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (sh.join(first_seen, "s")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_shingles"),
                      F.sum((F.col("first_doc") == F.col("doc_id"))
                            .cast("long")).alias("n_novel")))
    out = (per_doc.join(d.select("doc_id", "source"), "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_shingles").alias("shingles"),
                F.sum("n_novel").alias("novel"),
                F.sum((F.col("n_novel") * 10 < F.col("n_shingles") * 2)
                      .cast("long")).alias("n_stale_docs"))
           .select("source", "n_docs", "shingles", "novel",
                   quantize(F.col("novel").cast("double")
                            / F.col("shingles").cast("double"), 4)
                    .alias("novelty"),
                   "n_stale_docs"))
    return pin_result(out, sh)
