"""Similarity search over the ``embeddings`` table (64-dim float32
vectors) — north-star ANN set (SURVEY.md §2.9).

FP parity discipline: dot products and norms are computed as an
in-order fold over the list on BOTH engines (Spark ``aggregate`` /
DuckDB ``list_aggregate('sum')``), every element cast to double first,
results rounded to 4 decimals — summation order is identical, so value
hashes match."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize, quantize_sql

_N_QUERIES = 10
_TOP_K = 5

# in-order double dot product of two float arrays (Spark SQL expr)
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _probe_read(spark: SparkSession, store, manifest: dict,
                probed_cells: list):
    """One multi-object scan for an IVF probe list (``load_many``):
    N probed cells become ONE parquet scan node instead of a
    driver-built union of N per-cell loads (VERDICT r8 #3). Cell ids
    rejoin through the object hash with a broadcast tag join — exact
    even if two cells share one content-equal object. Returns
    ``(cand_df, n_objects)``; ``cand_df`` carries a ``cid`` column."""
    pairs = [(manifest[c], int(c)) for c in probed_cells if c in manifest]
    if not pairs:
        return None, 0
    tags = spark.createDataFrame(pairs, "___h string, cid long")
    cand = (store.load_many(spark, [h for h, _ in pairs])
                 .join(F.broadcast(tags),
                       F.col("__messdb_object") == F.col("___h"))
                 .drop("__messdb_object", "___h"))
    return cand, len(dict.fromkeys(h for h, _ in pairs))


def _norm_col(arr: str) -> F.Column:
    return F.sqrt(F.expr(_DOT.format(a=arr, b=arr)))


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_aggregate(list_transform(range(1, len(q.embedding) + 1),
                    i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                    'sum') / (q.nrm * c.nrm) AS sim
      FROM n q JOIN n c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
    )
    SELECT query_id, cand_id, floor((sim) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS sim, rk
    FROM (SELECT query_id, cand_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, cand_id) AS rk
          FROM sims)
    WHERE rk <= {_TOP_K}
    """)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exactness baseline. Queries are
    broadcast (tiny side), candidates stream — one pass over the
    corpus, no shuffle of the big side; top-k via per-query window on
    the small result. 100 TB path: broadcast-nested-loop with the
    query side always the broadcast one."""
    (emb,) = load(spark, sf_dir, "embeddings")
    withn = emb.withColumn("nrm", _norm_col("embedding"))
    q = (withn.filter(F.col("vec_id") < _N_QUERIES)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("q_emb"),
                      F.col("nrm").alias("q_nrm")))
    c = withn.select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"),
                     F.col("nrm").alias("c_nrm"))
    sim = (F.expr(_DOT.format(a="q_emb", b="c_emb")) /
           (F.col("q_nrm") * F.col("c_nrm")))
    pairs = (c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
              .withColumn("sim", sim))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") <= _TOP_K)
                 .select("query_id", "cand_id", quantize("sim", 4).alias("sim"), "rk"))


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, dim,
           floor((CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
                 / count(*)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS centroid
    FROM (SELECT label, unnest(range(1, len(embedding) + 1)) AS dim,
                 unnest(embedding) AS v
          FROM embeddings)
    GROUP BY label, dim
    """)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dim): posexplode + hash
    agg. Float values go through exact decimal summation (engine-
    order-independent) then one double division. Scale: shuffle is
    O(rows × dims) of small scalars with map-side partial agg."""
    (emb,) = load(spark, sf_dir, "embeddings")
    dv = F.col("val").cast("double").cast("decimal(25,12)")
    return (emb.select("label", F.posexplode("embedding").alias("pos", "val"))
               .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim"))
               .agg(quantize(F.sum(dv).cast("double") / F.count(F.lit(1)), 6)
                     .alias("centroid")))


_N_CELLS = 16   # IVF: coarse codebook size
_N_PROBE = 2    # IVF: cells probed per query

_KM_K = 8             # clusters
_KM_ITERS = 3         # Lloyd iterations (fixed for determinism)
_KM_SCALE = 1_000_000   # fixed-point scale: 6 decimals of each coord
_KM_DIM = 64          # embedding dims (testdata contract, TESTDATA.md)

# trained-codebook balance gate (VERDICT r12 #2): the scale property a
# first-N-vectors codebook lacks — arbitrary-vector cells give skewed
# cell sizes, so probe cost and recall degrade unevenly at 100×. With
# k-means centroids the max cell must stay within a small factor of
# the mean; the gate in ``ivf_topk_search`` pins it once per
# (session, codebook identity) — keyed like _CODEBOOK_CACHE (path +
# mtime + size, ADVICE r13 #2), so a corpus regenerated at the same
# path retrains AND re-validates. The factor is overridable
# (SPARK_GRAFT_IVF_BALANCE_C), and outside the synthetic-testdata
# contract the gate degrades to a stderr warning instead of a hard
# AssertionError (ADVICE r13 #4: real clustered corpora can
# legitimately exceed 4x after k-means at k=16; a public building
# block should degrade, not hard-fail, on data-dependent skew).
_CELL_BALANCE_C = 4.0
_BALANCE_CHECKED: set = set()


def _check_cell_balance(assigned: DataFrame, bkey: tuple,
                        corpus_path: str) -> None:
    """Once-per-(session, codebook-identity) IVF cell-balance gate.
    Hard-asserts under the /root/testdata synthetic contract (or when
    SPARK_GRAFT_IVF_BALANCE=assert); warns otherwise."""
    import os
    import sys

    if bkey is not None and bkey in _BALANCE_CHECKED:
        return
    c = float(os.environ.get("SPARK_GRAFT_IVF_BALANCE_C",
                             _CELL_BALANCE_C))
    sizes = [r["n"] for r in assigned.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    mean = sum(sizes) / _N_CELLS
    if max(sizes) > c * mean:
        msg = (f"IVF cells skewed: max {max(sizes)} > {c}x mean "
               f"{mean:.1f} — codebook no longer balances the corpus")
        mode = os.environ.get("SPARK_GRAFT_IVF_BALANCE", "")
        strict = (mode == "assert"
                  or (mode != "warn"
                      and corpus_path.startswith("/root/testdata/")))
        if strict:
            raise AssertionError(msg)
        print(f"# WARN {msg}", file=sys.stderr)
    if bkey is None:
        # no file identity (os.stat failed): the codebook itself is
        # retrained every call (trained_codebook key=None), so the
        # gate must also re-run every call — caching a degraded key
        # would let a regenerated corpus skip re-validation (r14
        # review finding #2)
        return
    while len(_BALANCE_CHECKED) >= 16:
        _BALANCE_CHECKED.pop()
    _BALANCE_CHECKED.add(bkey)


def _km_chain(k: int, iters: int, scale: int, dim: int,
              pfx: str = "", src: str = "embeddings") -> tuple[str, str]:
    """Unrolled integer-Lloyd CTE chain — the exact DuckDB mirror of
    ``kmeans_fit`` (same init, tie-break and rounding), factored out of
    ``_km_oracle`` so the trained-codebook oracles (IVF/PQ/SemDeDup
    family, VERDICT r12 #2) can derive their centroids from the SAME
    bit-exact training the Spark side runs. Returns (cte_text,
    final_centroid_relation); ``pfx`` namespaces the chain so several
    (e.g. one per PQ subspace) compose in one statement; ``src`` is any
    relation exposing (vec_id, embedding)."""
    parts = [f"""
    {pfx}emb AS (
      SELECT vec_id, list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * {scale}.0 + 0.5)
                       AS BIGINT)) AS v
      FROM {src}
    ),
    {pfx}cent0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS cv
      FROM {pfx}emb ORDER BY vec_id LIMIT {k}
    )"""]
    prev = f"{pfx}cent0"
    for t in range(1, iters + 1):
        parts.append(f"""
    {pfx}a{t} AS (
      SELECT vec_id, v, cl FROM (
        SELECT e.vec_id, e.v, c.cl,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_aggregate(list_transform(range(1, {dim + 1}),
                   i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])), 'sum'),
                 c.cl) AS rn
        FROM {pfx}emb e CROSS JOIN {prev} c) t
      WHERE rn = 1
    ),
    {pfx}cent{t} AS (
      SELECT c.cl, coalesce(u.cv, c.cv) AS cv
      FROM {prev} c LEFT JOIN (
        SELECT cl, list(CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT)
                        ORDER BY i) AS cv
        FROM (SELECT cl, i, CAST(sum(v[i]) AS BIGINT) AS s,
                     count(*) AS n
              FROM {pfx}a{t}, range(1, {dim + 1}) r(i)
              GROUP BY cl, i) s{t}
        GROUP BY cl) u ON u.cl = c.cl
    )""")
        prev = f"{pfx}cent{t}"
    return ",".join(parts), prev


# codebook TRAINING SAMPLE with a sufficiency floor (r14, VERDICT r13
# stretch #7; predicate hardened r15, VERDICT r14 #4 + ADVICE #1):
# Lloyd trains on the deterministic md5-hash sample
# md5(vec_id) % MOD == 0 — but ONLY when that sample itself still
# holds at least _KM_TRAIN_PER_CENTROID vectors per centroid (the
# classic IVF training guidance; FAISS documents ~39·k as the minimum
# and 256·k as comfortable). Below the floor the full corpus trains.
# Measured rationale: unconditionally sampling halves of this repo's
# 500-2000 vector test corpora collapsed recall@5 (0.80→0.42 at
# sf0.01, 0.92→0.64 at sf0.1 — 125-1000 vectors cannot spare half for
# k=16), while a 100 TB corpus keeps millions per centroid at any
# MOD, which is where sampling pays (training scans ~1/MOD of the
# corpus per Lloyd iteration). The r14 version strided on
# ``vec_id % MOD`` — systematic striding, not hashing: on a real
# corpus with periodic id structure (sharded ingest, interleaved
# sources) a stride correlates with source and biases the codebook.
# The md5 gate (the house portable hash — dataset_fold_split, HLL,
# count-min) is id-structure-free; and the floor now counts the
# SAMPLE, not the corpus (ADVICE r14 #1: sparse/skewed ids could
# clear a corpus-count floor while the sample held far fewer rows).
# Both rules are PURE PREDICATES, so the DuckDB oracle chains express
# the identical relation (``_km_src``) and parity stays bit-exact;
# the cell-balance gate always validates the FULL corpus assignment
# either way. The sampled branch is below every test SF by design —
# it is exercised by tests/test_codebook_sampling.py on a
# purpose-built corpus.
_KM_SAMPLE_MOD = 4
_KM_TRAIN_PER_CENTROID = 256
# portable md5-derived sample gate, bit-identical across engines:
# Spark conv(hex, 16, 10) == DuckDB CAST('0x'||hex AS BIGINT); 15 hex
# chars keep the value inside a signed 64-bit int on both.
_KM_SAMPLE_PRED_SPARK = (
    "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 15), 16, 10) "
    f"AS BIGINT) % {_KM_SAMPLE_MOD} = 0")
_KM_SAMPLE_PRED_DUCK = (
    "CAST(concat('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
    f"AS BIGINT) % {_KM_SAMPLE_MOD} = 0")


def _km_src(k: int) -> str:
    """The training relation the oracle chains read: the md5-hash
    sample when IT (the sample, ADVICE r14 #1) clears the per-centroid
    floor for this ``k``, else the full corpus — one static SQL
    predicate, no branching."""
    floor_rows = _KM_TRAIN_PER_CENTROID * k
    return (f"(SELECT vec_id, embedding FROM embeddings "
            f"WHERE {_KM_SAMPLE_PRED_DUCK} "
            f"OR (SELECT count(*) FROM embeddings "
            f"    WHERE {_KM_SAMPLE_PRED_DUCK}) < {floor_rows})")


def _trained_cents_sql(k: int = _N_CELLS) -> str:
    """CTE chain ending in the TRAINED coarse codebook ``cents``
    (cid, cemb: double list, cnrm) — k-means centroids instead of the
    first-N-vectors placeholder (VERDICT r12 #2); trained on the
    deterministic ``md5(vec_id) % {_KM_SAMPLE_MOD} == 0`` sample when
    it clears the per-centroid floor, else the full corpus (r14/r15).
    cemb = cv / scale and cnrm = sqrt(in-order Σ x²) mirror
    ``trained_codebook``'s Python arithmetic term for term, so both
    engines embed identical doubles."""
    chain, final = _km_chain(k, _KM_ITERS, _KM_SCALE, _KM_DIM, pfx="km_",
                             src=_km_src(k))
    return f"""{chain},
    cents AS (
      SELECT cid, cemb,
             sqrt(list_aggregate(list_transform(cemb, x -> x * x),
                  'sum')) AS cnrm
      FROM (SELECT cl AS cid,
                   list_transform(cv, c -> CAST(c AS DOUBLE)
                                           / {_KM_SCALE}.0) AS cemb
            FROM {final})
    )"""


@query(
    "ivf_topk_search",
    oracle=f"""
    WITH {_trained_cents_sql()},
    vecs AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT v.vec_id, v.embedding, v.nrm, c.cid,
             list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                    i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                    'sum') / (v.nrm * c.cnrm) AS csim,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                                       i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                                       'sum') / (v.nrm * c.cnrm) DESC, c.cid) AS crk
      FROM vecs v CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, embedding, nrm, cid FROM scored WHERE crk = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM scored
               WHERE vec_id < {_N_QUERIES} AND crk <= {_N_PROBE}),
    qv AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
           FROM vecs WHERE vec_id < {_N_QUERIES}),
    sims AS (
      SELECT p.query_id, t.vec_id AS cand_id,
             list_aggregate(list_transform(range(1, len(q.q_emb) + 1),
                    i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)),
                    'sum') / (q.q_nrm * t.nrm) AS sim
      FROM probes p JOIN cells t ON t.cid = p.cid AND t.vec_id != p.query_id
                    JOIN qv q ON q.query_id = p.query_id
    )
    SELECT query_id, cand_id, floor((sim) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS sim, rk
    FROM (SELECT query_id, cand_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, cand_id) AS rk
          FROM sims)
    WHERE rk <= {_TOP_K}
    """)
def ivf_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN — the structured scale path beyond LSH: a K-MEANS-
    TRAINED coarse codebook (``trained_codebook``, r13 — VERDICT r12
    #2 retired the first-{_N_CELLS}-vectors placeholder) partitions
    the corpus into inverted lists; a query probes only its {_N_PROBE}
    nearest cells, cutting the scan to ~nprobe/K of the corpus. An
    in-body CELL-BALANCE assert (max cell ≤ {_CELL_BALANCE_C}× mean)
    pins the scale property training buys: balanced cells mean probe
    cost and recall degrade evenly, not per-hot-cell.

    Scale design: the codebook is trained once (integer Lloyd — one
    corpus scan + a k×d aggregate per iteration; a 100 TB run trains
    on a sample) and embedded as PLAN LITERALS, so cell assignment is
    a map-only expression over the corpus — no join, no shuffle for
    the argmax; the probe list is a small broadcast; only same-cell
    candidates are scored. At 100 TB the corpus would additionally be
    WRITTEN partitioned by cell id so a probe prunes whole files
    (partition pruning on cid)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("nrm", _norm_col("embedding"))
    csims = _cosine_csims(trained_codebook(spark, sf_dir, _N_CELLS))

    # corpus: map-only argmax over the codebook (first max wins = lowest cid)
    assigned = (vecs.withColumn("csims", csims)
                    .withColumn("cid", (F.expr("array_position(csims, array_max(csims))") - 1)
                                .cast("long"))
                    .drop("csims"))

    # trained-codebook balance gate: one ≤{_N_CELLS}-row aggregate,
    # checked ONCE per (session, codebook identity) — the codebook it
    # validates is itself session-cached, so re-asserting per call
    # would only re-time the same assignment (ann_recall_eval alone
    # calls this body twice per bench entry). The gate key mirrors
    # _CODEBOOK_CACHE's (path + mtime + size): a corpus regenerated at
    # the same path retrains the codebook AND re-runs the gate.
    import os
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        bkey = (spark.sparkContext.applicationId, src,
                st.st_mtime_ns, st.st_size)
    except OSError:
        bkey = None          # no file identity → gate re-runs per call
    _check_cell_balance(assigned, bkey, src)

    # probe list: per-query top-nprobe cells (queries are tiny — explode)
    qsims = (vecs.filter(F.col("vec_id") < _N_QUERIES)
                 .withColumn("csims", csims)
                 .select(F.col("vec_id").alias("query_id"),
                         F.posexplode("csims").alias("pos", "csim")))
    wq = W.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("pos"))
    probes = (qsims.withColumn("crk", F.row_number().over(wq))
                   .filter(F.col("crk") <= _N_PROBE)
                   .select("query_id", F.col("pos").cast("long").alias("cid")))
    qv = vecs.filter(F.col("vec_id") < _N_QUERIES) \
             .select(F.col("vec_id").alias("query_id"),
                     F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm"))
    probe_q = probes.join(qv, "query_id")

    cand = (assigned.join(F.broadcast(probe_q),
                          (assigned["cid"] == probe_q["cid"]) &
                          (assigned["vec_id"] != probe_q["query_id"]))
                    .withColumn("sim",
                                F.expr(_DOT.format(a="q_emb", b="embedding")) /
                                (F.col("q_nrm") * F.col("nrm"))))
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (cand.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= _TOP_K)
                .select("query_id", F.col("vec_id").alias("cand_id"),
                        quantize("sim", 4).alias("sim"), "rk"))


_N_PLANES = 8   # LSH: 8 hyperplane sign bits → 256 buckets

# Deterministic pseudo-random hyperplanes shared with the oracle:
# plane p, dim i has weight +1 iff the first hex nibble of
# md5('plane<p>_<i>') is < '8' (top bit clear), else -1.
_NIBBLES = "('0','1','2','3','4','5','6','7')"


def _duck_sign_bit(p: int) -> str:
    return (f"CASE WHEN list_aggregate(list_transform(range(1, len(embedding) + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * "
            f"(CASE WHEN substring(md5('plane{p}_' || i), 1, 1) IN {_NIBBLES} "
            f"THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)), 'sum') >= 0 "
            f"THEN '1' ELSE '0' END")


@query(
    "lsh_bucket_cosine_topk",
    oracle=f"""
    SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec_id
    FROM (SELECT vec_id,
                 {" || ".join(_duck_sign_bit(p) for p in range(_N_PLANES))} AS bucket
          FROM embeddings)
    GROUP BY bucket
    """)
def lsh_bucket_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketing — the ANN scale path: vectors
    hash to sign-bit buckets; search then probes only same-bucket
    candidates (O(n·k/2^bits) pairs instead of O(n²)). This query
    materializes the bucket histogram (deterministic md5-derived
    planes, identical in the oracle).

    Scale: plane weights are a tiny broadcast table; the projection is
    a map-side zip_with per vector — no shuffle until the final
    histogram agg."""
    import hashlib

    (emb,) = load(spark, sf_dir, "embeddings")
    ndims = emb.select(F.size("embedding").alias("n")).first()["n"]
    # plane weights are PLAN CONSTANTS (md5-derived ±1 per (plane, dim));
    # compute them driver-side and embed as array literals so the
    # per-row work is just a 64-wide multiply-add fold — no per-row md5.
    # hashlib.md5 == Spark md5 == DuckDB md5, so the oracle derives the
    # identical weights from SQL.
    sign_bits = []
    for p in range(_N_PLANES):
        ws = [1.0 if hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()[0] < "8"
              else -1.0 for i in range(1, ndims + 1)]
        arr = "array(" + ", ".join(f"CAST({w} AS DOUBLE)" for w in ws) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr}, "
               f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
        sign_bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    bucket = F.expr("concat(" + ", ".join(sign_bits) + ")")
    par = spark.sparkContext.defaultParallelism
    return (emb.repartition(par).select("vec_id", bucket.alias("bucket"))
               .groupBy("bucket")
               .agg(F.count(F.lit(1)).alias("n_vecs"),
                    F.min("vec_id").alias("min_vec_id")))


def kmeans_fit(vecs: DataFrame, k: int = _KM_K, iters: int = _KM_ITERS,
               scale: int = _KM_SCALE) -> tuple[list[list[int]], DataFrame]:
    """Distributed Lloyd k-means over ``(vec_id, v: array<double>)`` in
    FIXED-POINT INTEGER arithmetic (the PageRank discipline,
    ``mining.py`` ``_PR_*``): coordinates scale to BIGINT
    (floor(x·scale + 0.5)), distances are exact integer sums of
    squares, and each centroid update is ONE correctly-rounded double
    divide per (cluster, dim) — floor(double(s)/n + 0.5) — so every
    iteration is bit-equal across engines and the query carries a full
    value-hash DuckDB oracle instead of a rows-only check.

    The iterative-algorithm class (no single SQL equivalent): a
    driver-side loop where each iteration is
      1. ASSIGN — map-only: centroids are collected to the driver
         (k×d ints, tiny) and embedded as plan literals, so the
         nearest-centroid argmin is a pure projection over the corpus —
         no join, no shuffle (the IVF codebook pattern). Integer
         distance ties break to the LOWEST cluster index
         (array_position finds the first minimum) — deterministic,
         unlike FP ties;
      2. UPDATE — one partial-aggregated shuffle of (cluster, dim)
         sums (k×d rows total) to recompute means.
    Per-iteration cost at 100 TB: one corpus scan + a k×d-row shuffle;
    the corpus is never collected or replicated. Range guard: |coord|
    ≤ scale ⇒ per-vector distance ≤ d·(2·scale)² = 2.6e14, so BIGINT
    sums hold past 3e4 × 1e9 vectors (beyond that, per-dim sums go
    DECIMAL). Deterministic init: the k lowest-vec_id vectors (a
    production run would seed k-means++ from a sample). Empty clusters
    keep their previous centroid. Returns (scaled-int centroids,
    assignment df with scaled-int ``v``)."""
    import math

    iv = vecs.select(
        "vec_id",
        F.expr(f"transform(v, x -> CAST(floor(CAST(x AS DOUBLE) "
               f"* {scale}.0D + 0.5D) AS BIGINT))").alias("v"))
    # r15 (guide §2.5 input skew): the testdata corpus is ONE parquet
    # row group, so every Lloyd iteration (assign + posexplode + sum)
    # ran as a single task. Rebalance by vec_id when the scan has too
    # few splits — SAFE for parity because every per-iteration
    # aggregate here is a BIGINT sum (order-independent), unlike a
    # float mean. At scale the input has many splits and nothing moves.
    par = vecs.sparkSession.sparkContext.defaultParallelism
    if iv.rdd.getNumPartitions() < max(2, par // 2):
        iv = iv.repartition(par, "vec_id")
    init = iv.orderBy("vec_id").limit(k).select("v").collect()
    cents = [list(r["v"]) for r in init]
    assigned = None
    for _ in range(iters):
        dists = F.expr("array(" + ", ".join(
            _km_dist_expr(c) for c in cents) + ")")
        assigned = (iv.withColumn("dists", dists)
                      .withColumn("cl", (F.expr(
                          "array_position(dists, array_min(dists))") - 1)
                          .cast("long"))
                      .drop("dists"))
        sums = (assigned.select("cl", F.posexplode("v").alias("i", "x"))
                        .groupBy("cl", "i")
                        .agg(F.sum("x").alias("s"),
                             F.count(F.lit(1)).alias("n"))
                        .collect())
        by_cl: dict[int, dict[int, int]] = {}
        for r in sums:
            # float(s)/n, NOT s/n: Python's int/int is correctly-
            # rounded EXACT division, while both engines round s to
            # double first — match their rounding order
            by_cl.setdefault(r["cl"], {})[r["i"]] = \
                math.floor(float(r["s"]) / r["n"] + 0.5)
        cents = [([by_cl[ci][i] for i in range(len(cents[0]))]
                  if ci in by_cl else cents[ci])
                 for ci in range(k)]
    return cents, assigned


def _km_dist_expr(cvec: list[int]) -> str:
    arr = "array(" + ", ".join(f"{int(c)}L" for c in cvec) + ")"
    return (f"aggregate(zip_with(v, {arr}, (x, c) -> (x - c) * (x - c)), "
            f"0L, (a, d) -> a + d)")


_CODEBOOK_CACHE: dict = {}
# SAMPLE row count for the sampling-floor test (r15: the floor counts
# the sampled frame itself, ADVICE r14 #1), keyed on the same
# (appId, path, mtime_ns, size) file identity — pq_topk_search's four
# per-subspace codebooks would otherwise each recount the identical
# sample on their first (cache-miss) training (r14 review finding #4;
# the predicate is k-independent, so one count serves every k)
_SAMPLE_COUNT_CACHE: dict = {}


def trained_codebook(spark: SparkSession, sf_dir: str, k: int,
                     sub: tuple[int, int] | None = None
                     ) -> list[tuple[int, list[float], float]]:
    """K-MEANS-TRAINED codebook over the embeddings table — replaces
    the first-N-vectors placeholder across the ANN family (VERDICT r12
    next-round #2: arbitrary-vector cells skew cell sizes, so probe
    cost and recall degrade unevenly at 100×). Training is
    ``kmeans_fit``'s fixed-point integer Lloyd, so it is bit-equal to
    the oracles' ``_km_chain`` CTE; centroids come back in DOUBLE space
    (cv / scale, correctly-rounded on both engines) with their norms
    folded in-order exactly like ``list_aggregate('sum')``. Returns
    [(cid, cemb, cnrm)] sorted by cid.

    ``sub=(lo, n)``: train on the 1-based n-dim slice — the PQ
    per-subspace codebooks. Session-cached on (app id, file identity,
    k, sub) like ``_CC_LABEL_CACHE``, so the six ANN-family queries
    sharing one coarse codebook train it ONCE per corpus per session.
    Scale: training runs on the DETERMINISTIC md5-HASH SAMPLE
    ``md5(vec_id) % _KM_SAMPLE_MOD == 0`` whenever the SAMPLE ITSELF
    holds ``_KM_TRAIN_PER_CENTROID`` vectors per centroid (r14 floor,
    r15 hash gate + sample-cardinality floor — the 100 TB posture
    made real: each Lloyd iteration then scans ~1/{_KM_SAMPLE_MOD} of
    the corpus + a k×d-row aggregate; a corpus whose sample is too
    thin trains full — see the measured-rationale comment at
    ``_KM_SAMPLE_MOD``). The resulting plan-literal codebook is
    always validated against the FULL corpus by
    ``_check_cell_balance``; the oracles apply the identical
    predicate via ``_km_src``, keeping parity bit-exact."""
    import math
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        key = (spark.sparkContext.applicationId, src, st.st_mtime_ns,
               st.st_size, int(k), sub)
    except OSError:
        key = None
    if key is not None and key in _CODEBOOK_CACHE:
        book = _CODEBOOK_CACHE.pop(key)
        _CODEBOOK_CACHE[key] = book          # LRU move-to-end
        return book
    (emb,) = load(spark, sf_dir, "embeddings")
    sample = emb.filter(F.expr(_KM_SAMPLE_PRED_SPARK))
    n_key = key[:4] if key is not None else None
    if n_key is not None and n_key in _SAMPLE_COUNT_CACHE:
        n_sample = _SAMPLE_COUNT_CACHE[n_key]
    else:
        n_sample = sample.count()
        if n_key is not None:
            while len(_SAMPLE_COUNT_CACHE) >= 16:
                _SAMPLE_COUNT_CACHE.pop(next(iter(_SAMPLE_COUNT_CACHE)))
            _SAMPLE_COUNT_CACHE[n_key] = n_sample
    if n_sample >= _KM_TRAIN_PER_CENTROID * int(k):
        emb = sample
    vexpr = ("transform(embedding, x -> CAST(x AS DOUBLE))" if sub is None
             else f"transform(slice(embedding, {sub[0]}, {sub[1]}), "
                  f"x -> CAST(x AS DOUBLE))")
    cents_int, _ = kmeans_fit(emb.select("vec_id",
                                         F.expr(vexpr).alias("v")), k=k)
    book = []
    for cid, cv in enumerate(cents_int):
        cemb = [c / _KM_SCALE for c in cv]
        s = 0.0
        for x in cemb:          # in-order fold == list_aggregate('sum')
            s += x * x
        book.append((cid, cemb, math.sqrt(s)))
    if key is not None:
        while len(_CODEBOOK_CACHE) >= 16:
            _CODEBOOK_CACHE.pop(next(iter(_CODEBOOK_CACHE)))
        _CODEBOOK_CACHE[key] = book
    return book


def _cosine_csims(book: list[tuple[int, list[float], float]]):
    """Plan-literal per-centroid cosine array over (embedding, nrm)
    rows — the map-only cell-assignment expression the IVF/SemDeDup
    family shares (no join, no shuffle; index i = cid i)."""
    exprs = []
    for _cid, cemb, cnrm in book:
        arr = "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)"
                                   for x in cemb) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr}, "
               f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), "
               f"(a, v) -> a + v)")
        exprs.append(f"({dot} / (nrm * CAST({float(cnrm)!r} AS DOUBLE)))")
    return F.expr("array(" + ", ".join(exprs) + ")")


def _km_oracle(k: int, iters: int, scale: int, dim: int) -> str:
    """Unrolled Lloyd iterations in DuckDB SQL — exact integer mirror
    of ``kmeans_fit`` (same init, same tie-break, same rounding); the
    chain itself lives in ``_km_chain`` (shared with the trained-
    codebook oracles)."""
    from . import quantize_sql
    chain, prev = _km_chain(k, iters, scale, dim)
    rms = quantize_sql(
        f"sqrt(CAST(CAST(sum(dist) AS BIGINT) AS DOUBLE) / count(*)) "
        f"/ {scale}.0", 6)
    return "WITH " + chain + f"""
    SELECT cl AS cluster_id, count(*) AS n_members, {rms} AS rms_dist
    FROM (
      SELECT a.cl,
             list_aggregate(list_transform(range(1, {dim + 1}),
               i -> (a.v[i] - c.cv[i]) * (a.v[i] - c.cv[i])), 'sum') AS dist
      FROM a{iters} a JOIN cent{iters} c ON c.cl = a.cl) d
    GROUP BY cl
    """


@query("kmeans_embedding_clusters",
       oracle=_km_oracle(_KM_K, _KM_ITERS, _KM_SCALE, _KM_DIM))
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile of the embeddings corpus. Fixed-point
    integer Lloyd (``kmeans_fit``) makes every iteration bit-equal
    across engines, so the driver checks sizes AND distances by value
    hash against an unrolled-SQL oracle — the iterative-clustering
    class is no longer rows-only. Output: one row per cluster with its
    size and RMS within-cluster distance (computed from the EXACT
    integer distance sum — a single deterministic sqrt/divide, never
    an order-dependent float avg)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id",
                      F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                       .alias("v"))
    cents, assigned = kmeans_fit(vecs)
    darr = F.expr("array(" + ", ".join(
        _km_dist_expr(c) for c in cents) + ")")
    rms = (F.sqrt(F.col("sum_d").cast("double")
                  / F.col("n_members").cast("double"))
           / F.lit(float(_KM_SCALE)))
    return (assigned
            .withColumn("d", F.element_at(darr, F.col("cl").cast("int") + 1))
            .groupBy("cl")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum("d").alias("sum_d"))
            .select(F.col("cl").alias("cluster_id"), "n_members",
                    quantize(rms, 6).alias("rms_dist")))


def _rp_planes(n_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from an LCG — the same literal
    matrix is embedded in the Spark plan and the DuckDB oracle, so
    signatures agree bit-for-bit with no shared library."""
    x, planes = 42, []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            # bit 16, not bit 0: an LCG's low bit alternates with
            # period 2, which would make every plane identical
            row.append(1.0 if (x >> 16) & 1 else -1.0)
        planes.append(row)
    return planes


_RP = _rp_planes()


def _rp_sig_spark() -> str:
    """SQL expr: 16-bit signature, bit j = sign of dot(embedding, plane_j)."""
    bits = []
    for j, row in enumerate(_RP):
        arr = "array(" + ",".join(f"CAST({v} AS DOUBLE)" for v in row) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr},"
               f" (x, y) -> CAST(x AS DOUBLE) * y),"
               f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        bits.append(f"(CASE WHEN {dot} > 0.0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def _rp_sig_duck() -> str:
    bits = []
    for j, row in enumerate(_RP):
        arr = "[" + ",".join(f"CAST({v} AS DOUBLE)" for v in row) + "]"
        dot = (f"list_aggregate(list_transform(range(1, 65),"
               f" i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i]), 'sum')")
        bits.append(f"(CASE WHEN {dot} > 0.0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


@query(
    "embedding_rp_simhash",
    oracle=f"""
    WITH sig AS (SELECT vec_id, {_rp_sig_duck()} AS sig FROM embeddings)
    SELECT sig, count(*) AS n_vecs, CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM sig GROUP BY sig
    """)
def embedding_rp_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection SimHash over embeddings: 16 deterministic ±1
    hyperplanes -> 16-bit signature per vector -> bucket histogram.
    Cosine-similar vectors collide with probability (1 - θ/π)^16, so
    the signature IS an ANN bucketing key (the bit-LSH complement of
    the learned-codebook IVF path) and a near-dup blocking key for
    embeddings.

    Scale: the projection is a map-only expression over plan-literal
    hyperplanes (no codebook join, no collect), identical in spirit to
    ivf_topk_search's literal centroids; the only shuffle carries
    (16-bit sig) keys — maximally compressible. In-order double folds
    keep sign decisions bit-identical to the oracle."""
    (emb,) = load(spark, sf_dir, "embeddings")
    sig = emb.select("vec_id", F.expr(_rp_sig_spark()).alias("sig"))
    return (sig.groupBy("sig")
               .agg(F.count(F.lit(1)).alias("n_vecs"),
                    F.min("vec_id").cast("long").alias("min_vec_id")))


_PQ_M = 4        # subspaces (64 dims -> 4 x 16)
_PQ_K = 8        # centroids per subspace (k-means-trained, r13)
_PQ_SUB = 16     # dims per subspace


def _pq_cents_sql() -> str:
    """Per-subspace TRAINED PQ codebooks as one relation
    (j, cid, cemb: {_PQ_SUB}-dim double list): one ``_km_chain`` per
    subspace over the sliced corpus, composed under distinct prefixes
    (VERDICT r12 #2 applied to PQ)."""
    chains, finals = [], []
    for j in range(_PQ_M):
        # slice over the SHARED training relation (_km_src) so the
        # sample-or-floor predicate has exactly one definition (r14
        # review finding #3 — a hand-synced copy here could silently
        # diverge from the body's rule)
        src = (f"(SELECT vec_id, list_slice(embedding, "
               f"{j * _PQ_SUB + 1}, {(j + 1) * _PQ_SUB}) AS embedding "
               f"FROM {_km_src(_PQ_K)})")
        chain, final = _km_chain(_PQ_K, _KM_ITERS, _KM_SCALE, _PQ_SUB,
                                 pfx=f"km{j}_", src=src)
        chains.append(chain)
        finals.append(final)
    union = "\n      UNION ALL ".join(
        f"SELECT {j} AS j, cl AS cid, list_transform(cv, "
        f"c -> CAST(c AS DOUBLE) / {_KM_SCALE}.0) AS cemb FROM {finals[j]}"
        for j in range(_PQ_M))
    return ",".join(chains) + f""",
    pqcents AS (
      {union}
    )"""


@query(
    "pq_topk_search",
    oracle=f"""
    WITH {_pq_cents_sql()},
    subdists AS (
      SELECT v.vec_id, c.j, c.cid,
             list_aggregate(list_transform(range(1, {_PQ_SUB} + 1),
                i -> (CAST(v.embedding[c.j * {_PQ_SUB} + i] AS DOUBLE)
                      - c.cemb[i])
                   * (CAST(v.embedding[c.j * {_PQ_SUB} + i] AS DOUBLE)
                      - c.cemb[i])), 'sum') AS d
      FROM embeddings v CROSS JOIN pqcents c
    ),
    codes AS (
      SELECT vec_id, j, cid AS code
      FROM (SELECT vec_id, j, cid,
                   row_number() OVER (PARTITION BY vec_id, j
                                      ORDER BY d, cid) AS rn
            FROM subdists)
      WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, j, cid, d FROM subdists
      WHERE vec_id < {_N_QUERIES}
    ),
    scored AS (
      SELECT l.query_id, x.vec_id AS cand_id, sum(l.d) AS approx_d
      FROM codes x JOIN lut l ON l.j = x.j AND l.cid = x.code
      WHERE x.vec_id != l.query_id
      GROUP BY l.query_id, x.vec_id
    )
    SELECT query_id, cand_id,
           floor((approx_d) * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS approx_d, rk
    FROM (SELECT query_id, cand_id, approx_d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY approx_d, cand_id) AS rk
          FROM scored)
    WHERE rk <= {_TOP_K}
    """)
def pq_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the compression scale path next to
    IVF (prune cells) and LSH (prune buckets): each vector is encoded
    as {_PQ_M} one-byte codes (argmin centroid per {_PQ_SUB}-dim
    subspace), and search scans CODES, not vectors, via asymmetric
    distance computation (ADC): the query precomputes its distance to
    every centroid of every subspace ({_PQ_M}x{_PQ_K} doubles), and a
    candidate's approximate distance is {_PQ_M} table lookups + adds.

    Scale design: at 100 TB of float32 vectors, PQ codes are ~64x
    smaller (4 bytes vs 256), so the scan reads codes-only columns;
    each subspace's codebook is K-MEANS-TRAINED on the sliced corpus
    (``trained_codebook(sub=...)``, r13 — VERDICT r12 #2; a 100 TB run
    trains on a sample) and embedded as PLAN LITERALS, making encoding
    a map-only expression; the per-query LUT is a tiny broadcast; the
    only shuffle is the final per-query top-k window
    (WindowGroupLimit-pruned). The fidelity ladder is pq (cheapest)
    -> ivf/lsh -> brute-force rerank, all four implemented here."""
    (emb,) = load(spark, sf_dir, "embeddings")

    books = [trained_codebook(spark, sf_dir, _PQ_K,
                              sub=(j * _PQ_SUB + 1, _PQ_SUB))
             for j in range(_PQ_M)]

    def sub_dist(vec_col: str, cemb: list[float], j: int) -> str:
        arr = "array(" + ", ".join(
            f"CAST({float(x)!r} AS DOUBLE)" for x in cemb) + ")"
        sub = f"slice({vec_col}, {j * _PQ_SUB + 1}, {_PQ_SUB})"
        return (f"aggregate(zip_with({sub}, {arr}, "
                f"(x, w) -> (CAST(x AS DOUBLE) - w) * (CAST(x AS DOUBLE) - w)), "
                f"CAST(0.0 AS DOUBLE), (a, v) -> a + v)")

    # per-subspace distance vectors (fixed in-order arithmetic shared
    # with the oracle), then argmin -> code, first (lowest cid) wins
    dist_arrays = [
        F.expr("array(" + ", ".join(sub_dist("embedding", cemb, j)
                                    for _cid, cemb, _n in books[j]) + ")")
         .alias(f"d{j}")
        for j in range(_PQ_M)]
    with_d = emb.select("vec_id", *dist_arrays)
    codes = with_d.select(
        "vec_id",
        *[(F.expr(f"array_position(d{j}, array_min(d{j}))") - 1)
          .cast("int").alias(f"code{j}") for j in range(_PQ_M)])

    # query LUT rows: the full distance vectors, broadcast
    lut = (with_d.filter(F.col("vec_id") < _N_QUERIES)
                 .select(F.col("vec_id").alias("query_id"),
                         *[F.col(f"d{j}").alias(f"lut{j}")
                           for j in range(_PQ_M)]))

    # fixed-order ADC sum d0+d1+d2+d3 (the oracle's SUM over j sums in
    # j order too) — explicit adds keep FP order stable on both engines
    adc = (F.element_at(F.col("lut0"), F.col("code0") + 1)
           + F.element_at(F.col("lut1"), F.col("code1") + 1)
           + F.element_at(F.col("lut2"), F.col("code2") + 1)
           + F.element_at(F.col("lut3"), F.col("code3") + 1))
    scored = (codes.join(F.broadcast(lut),
                         codes["vec_id"] != lut["query_id"])
                   .select("query_id", F.col("vec_id").alias("cand_id"),
                           adc.alias("approx_d")))
    w = W.partitionBy("query_id").orderBy("approx_d", "cand_id")
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= _TOP_K)
                  .select("query_id", "cand_id",
                          quantize("approx_d", 4).alias("approx_d"), "rk"))


_SEM_THRESH = 0.9   # same-cluster cosine above this => near-duplicate


@query(
    "semantic_dedup_survivors",
    oracle=f"""
    WITH {_trained_cents_sql()},
    vecs AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT v.vec_id, v.embedding, v.nrm, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                ORDER BY list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                       i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                       'sum') / (v.nrm * c.cnrm) DESC, c.cid) AS crk
      FROM vecs v CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, embedding, nrm, cid FROM scored WHERE crk = 1),
    dropped AS (
      SELECT DISTINCT x.vec_id
      FROM cells x JOIN cells y
        ON x.cid = y.cid AND y.vec_id < x.vec_id
           AND list_aggregate(list_transform(range(1, len(x.embedding) + 1),
                  i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)),
                  'sum') / (x.nrm * y.nrm) > {_SEM_THRESH}
    )
    SELECT c.vec_id, c.cid,
           (d.vec_id IS NULL) AS kept
    FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
    """)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (SemDeDup-style): cluster the embedding
    space with a coarse codebook, then inside each cluster drop every
    vector that is near-identical (cosine > {_SEM_THRESH}) to a
    lower-id survivor — the embedding-space answer to MinHash's
    lexical near-dup, catching paraphrases and re-encodings that share
    no shingles. Deterministic survivor rule: lowest vec_id wins.

    Scale: the clustering bounds the candidate set — pairs form ONLY
    within a cluster (O(Σ cluster²), not O(n²)); the codebook is plan
    literals (map-only assignment, no shuffle); the pair join shuffles
    on cid; oversized clusters would be re-split with a finer codebook
    (the standard SemDeDup recursion). Output keeps every vector with
    its cluster and verdict, so downstream mixture accounting can
    reweight by surviving mass."""
    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("nrm", _norm_col("embedding"))
    # trained coarse codebook (r13): balanced cells keep the Σcluster²
    # pair term even — the property the SemDeDup recursion relies on
    csims = _cosine_csims(trained_codebook(spark, sf_dir, _N_CELLS))
    cells = (vecs.withColumn("csims", csims)
                 .withColumn("cid", (F.expr("array_position(csims, array_max(csims))") - 1)
                             .cast("long"))
                 .drop("csims"))

    x, y = cells.alias("x"), cells.alias("y")
    cos_xy = (F.expr(_DOT.format(a="x.embedding", b="y.embedding"))
              / (F.col("x.nrm") * F.col("y.nrm")))
    dropped = (x.join(y, (F.col("x.cid") == F.col("y.cid")) &
                         (F.col("y.vec_id") < F.col("x.vec_id")))
                .filter(cos_xy > _SEM_THRESH)
                .select(F.col("x.vec_id").alias("vec_id"))
                .distinct())
    return (cells.join(dropped.withColumn("_dropped", F.lit(True)),
                       "vec_id", "left")
                 .select("vec_id", "cid",
                         F.col("_dropped").isNull().alias("kept")))


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH dims AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      FROM embeddings
    ),
    stats AS (
      SELECT dim, min(v) AS lo, max(v) AS hi FROM dims GROUP BY dim
    ),
    packed AS (
      SELECT array_agg(lo ORDER BY dim) AS los,
             array_agg(hi ORDER BY dim) AS his
      FROM stats
    ),
    enc AS (
      SELECT e.vec_id,
             list_transform(range(1, len(e.embedding) + 1),
               i -> floor((CAST(e.embedding[i] AS DOUBLE) - los[i]) * 255.0
                          / (his[i] - los[i]) + 0.5)) AS codes,
             los, his, e.embedding
      FROM embeddings e CROSS JOIN packed
    )
    SELECT vec_id,
           CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
           CAST(list_aggregate(codes, 'max') AS BIGINT) AS max_code,
           {quantize_sql(
               "list_aggregate(list_transform(range(1, len(embedding) + 1), "
               "i -> abs(CAST(embedding[i] AS DOUBLE) "
               "- (los[i] + codes[i] * (his[i] - los[i]) / 255.0))), 'sum') "
               "/ len(embedding)", 6)} AS mae
    FROM enc
    """)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8) quantization of the embedding column — the third
    compression rung next to PQ (codes per subspace) and RP-SimHash
    (one bit per plane): per-dimension min/max over the corpus maps
    each float to an 8-bit code, 4x smaller storage with a dequantize
    that is two flops. Output per vector: integer code checksum/max
    (bit-exact on both engines) and the mean absolute reconstruction
    error (in-order fold).

    Scale: the per-dim stats are one posexplode + 64-row agg collected
    ONCE and embedded as plan literals — encoding is then a map-only
    expression over the corpus, no join, no shuffle; the stats job
    itself partial-aggregates map-side. The same literal-stats pattern
    serves any per-column normalizer (z-score, min-max) at 100 TB."""
    (emb,) = load(spark, sf_dir, "embeddings")
    stats = (emb.select(F.posexplode("embedding").alias("pos", "v"))
                .groupBy("pos")
                .agg(F.min(F.col("v").cast("double")).alias("lo"),
                     F.max(F.col("v").cast("double")).alias("hi"))
                .orderBy("pos").collect())
    lo_arr = "array(" + ", ".join(f"CAST({float(r['lo'])!r} AS DOUBLE)"
                                  for r in stats) + ")"
    hi_arr = "array(" + ", ".join(f"CAST({float(r['hi'])!r} AS DOUBLE)"
                                  for r in stats) + ")"
    ndims = len(stats)
    codes = (f"transform(sequence(1, {ndims}), i -> "
             f"floor((CAST(element_at(embedding, i) AS DOUBLE)"
             f" - element_at({lo_arr}, i)) * 255.0"
             f" / (element_at({hi_arr}, i) - element_at({lo_arr}, i))"
             f" + 0.5))")
    mae = (f"aggregate(transform(sequence(1, {ndims}), i -> "
           f"abs(CAST(element_at(embedding, i) AS DOUBLE)"
           f" - (element_at({lo_arr}, i) + element_at(codes, i)"
           f" * (element_at({hi_arr}, i) - element_at({lo_arr}, i)) / 255.0))),"
           f" CAST(0.0 AS DOUBLE), (a, v) -> a + v) / {ndims}")
    return (emb.withColumn("codes", F.expr(codes))
               .select("vec_id",
                       F.expr("aggregate(codes, 0L, (a, v) -> a + CAST(v AS BIGINT))")
                        .alias("code_sum"),
                       F.expr("CAST(array_max(codes) AS BIGINT)").alias("max_code"),
                       quantize(F.expr(mae), 6).alias("mae")))


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the IVF index vs brute force
# ---------------------------------------------------------------------------

def _ann_recall_oracle() -> str:
    """Composes the two registered pipelines' oracles as subqueries —
    the eval inherits their determinism discipline wholesale."""
    from . import QUERIES
    gt = QUERIES["cosine_topk_bruteforce"].oracle
    iv = QUERIES["ivf_topk_search"].oracle
    return f"""
    SELECT g.query_id,
           CAST(count(i.cand_id) AS BIGINT) AS n_matched,
           {quantize_sql("CAST(count(i.cand_id) AS DOUBLE) / 5.0", 4)}
             AS recall_at_5
    FROM ({gt}) g
    LEFT JOIN ({iv}) i
      ON g.query_id = i.query_id AND g.cand_id = i.cand_id
    GROUP BY g.query_id
    """


@query("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@5 of the IVF(probe-2) search
    against the brute-force ground truth, per query vector — the
    measurement that decides nprobe/cell-count BEFORE shipping an ANN
    index to a 100 TB corpus. Composes the two registered pipelines
    (and their oracles) rather than re-implementing either; the whole
    eval is hash-checked.

    r13 adjudication (trained codebooks, VERDICT r12 #2): mean recall
    moved 0.92→0.80 (sf0.01) / 0.98→0.92 (sf0.1) when the first-16-
    vectors placeholder was replaced by k-means centroids — and that
    DROP EXPOSES AN ARTIFACT, not a regression: the eval queries
    (vec_id < 10) were a SUBSET of the old codebook (vec_id < 16), so
    sim(q, q) = 1 put every query's top probe at a cell centered
    exactly on itself, inflating recall. Lloyd iterations move
    centroids to cluster means, removing the self-probe. Honest
    recall at nprobe=2/16 with balanced cells (max/mean 1.13 at sf0.1,
    asserted ≤ {_CELL_BALANCE_C} in ``ivf_topk_search``) is the 0.8-0.9
    band measured here; the collapse gate below is tightened 0.2→0.5
    accordingly.

    Scale: the eval runs over the query SAMPLE (bounded), not the
    corpus — ground truth is the only brute-force pass and at scale
    runs on a sampled query set exactly like this one."""
    from . import QUERIES
    gt = (QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir)
          .select("query_id", "cand_id"))
    iv = (QUERIES["ivf_topk_search"].fn(spark, sf_dir)
          .select(F.col("query_id").alias("iq"),
                  F.col("cand_id").alias("ic")))
    out = (gt.join(iv, (gt["query_id"] == iv["iq"])
                   & (gt["cand_id"] == iv["ic"]), "left")
             .groupBy("query_id")
             .agg(F.count("ic").alias("n_matched"))
             .select("query_id",
                     F.col("n_matched").cast("bigint").alias("n_matched"),
                     quantize(F.col("n_matched").cast("double") / 5.0, 4)
                      .alias("recall_at_5"))
             .localCheckpoint(eager=True))
    rows = out.collect()
    mean_recall = sum(r["recall_at_5"] for r in rows) / max(len(rows), 1)
    if not rows or mean_recall < 0.5:
        raise AssertionError(
            f"IVF recall collapsed: mean recall@5 = {mean_recall}")
    for r in rows:
        if not 0 <= r["n_matched"] <= 5:
            raise AssertionError(f"impossible match count: {r}")
    return out


_MATRYOSHKA_DIMS = 8


@query(
    "matryoshka_prefix_recall",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             embedding[1:{_MATRYOSHKA_DIMS}] AS pemb,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm,
             sqrt(list_aggregate(list_transform(embedding[1:{_MATRYOSHKA_DIMS}],
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS pnrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_aggregate(list_transform(range(1, len(q.embedding) + 1),
                    i -> CAST(q.embedding[i] AS DOUBLE)
                         * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (q.nrm * c.nrm) AS fsim,
             list_aggregate(list_transform(range(1, {_MATRYOSHKA_DIMS} + 1),
                    i -> CAST(q.pemb[i] AS DOUBLE)
                         * CAST(c.pemb[i] AS DOUBLE)), 'sum')
               / (q.pnrm * c.pnrm) AS psim
      FROM n q JOIN n c ON q.vec_id < {_N_QUERIES} AND c.vec_id != q.vec_id
    ),
    fr AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY fsim DESC, cand_id) AS rk
      FROM sims
    ),
    pr AS (
      SELECT query_id, cand_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY psim DESC, cand_id) AS rk
      FROM sims
    )
    SELECT f.query_id,
           CAST(count(p.cand_id) AS BIGINT) AS n_overlap,
           CAST({_TOP_K} AS BIGINT) AS k
    FROM fr f LEFT JOIN pr p
      ON p.query_id = f.query_id AND p.cand_id = f.cand_id
         AND p.rk <= {_TOP_K}
    WHERE f.rk <= {_TOP_K}
    GROUP BY f.query_id
    """)
def matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation: how much of the full-
    dimension top-{k} survives when search uses only the FIRST
    {d} of 64 dims — the retrieval-quality check behind
    truncatable-embedding deployments (store the prefix hot, the tail
    cold; search cost drops 8× if recall holds). Output: per query,
    the overlap between the full-dim and prefix-dim top-{k} sets.

    Exactness: both rankings use the in-order-fold dot product
    discipline of this module, rank on full precision with a cand_id
    tiebreak, and the overlap is an integer join-count — so the
    quality metric itself hash-checks cross-engine. Scale: the prefix
    similarity reuses the SAME broadcast-query pass as the full one
    (one corpus scan computes both scores); the overlap join runs on
    two top-{k} row sets, queries × {k} rows each."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pre = F.slice(F.col("embedding"), 1, _MATRYOSHKA_DIMS)
    withn = (emb.withColumn("pemb", pre)
                .withColumn("nrm", _norm_col("embedding"))
                .withColumn("pnrm", _norm_col("pemb")))
    q = (withn.filter(F.col("vec_id") < _N_QUERIES)
              .select(F.col("vec_id").alias("query_id"),
                      F.col("embedding").alias("q_emb"),
                      F.col("pemb").alias("q_pemb"),
                      F.col("nrm").alias("q_nrm"),
                      F.col("pnrm").alias("q_pnrm")))
    c = withn.select(F.col("vec_id").alias("cand_id"),
                     F.col("embedding").alias("c_emb"),
                     F.col("pemb").alias("c_pemb"),
                     F.col("nrm").alias("c_nrm"),
                     F.col("pnrm").alias("c_pnrm"))
    pairs = (c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
              .withColumn("fsim", F.expr(_DOT.format(a="q_emb", b="c_emb"))
                          / (F.col("q_nrm") * F.col("c_nrm")))
              .withColumn("psim", F.expr(_DOT.format(a="q_pemb", b="c_pemb"))
                          / (F.col("q_pnrm") * F.col("c_pnrm"))))
    wf = W.partitionBy("query_id").orderBy(F.col("fsim").desc(), "cand_id")
    wp = W.partitionBy("query_id").orderBy(F.col("psim").desc(), "cand_id")
    ranked = (pairs.withColumn("frk", F.row_number().over(wf))
                   .withColumn("prk", F.row_number().over(wp)))
    full_top = ranked.filter(F.col("frk") <= _TOP_K) \
                     .select("query_id", "cand_id")
    pre_top = ranked.filter(F.col("prk") <= _TOP_K) \
                    .select("query_id", F.col("cand_id").alias("p_cand"))
    return (full_top.join(pre_top,
                          (full_top.query_id == pre_top.query_id)
                          & (full_top.cand_id == pre_top.p_cand), "left")
                    .groupBy(full_top.query_id.alias("query_id"))
                    .agg(F.count("p_cand").cast("long").alias("n_overlap"),
                         F.lit(_TOP_K).cast("long").alias("k")))


matryoshka_prefix_recall.__doc__ = matryoshka_prefix_recall.__doc__.format(
    k=_TOP_K, d=_MATRYOSHKA_DIMS)


# ---- MMR diversified retrieval ---------------------------------------

_MMR_K = 5        # picks per query
_MMR_NQ = 5       # query vectors (vec_id < _MMR_NQ)
_MMR_CAND = 10    # relevance candidates fed to the MMR loop
_MMR_LAM = 0.7    # relevance weight; 1-lam penalizes redundancy


def _mmr_oracle() -> str:
    dot = ("list_aggregate(list_transform(range(1, len({a}) + 1), "
           "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')")
    parts = [f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {dot.format(a="q.embedding", b="c.embedding")}
               / (q.nrm * c.nrm) AS sim
      FROM n q JOIN n c ON q.vec_id < {_MMR_NQ} AND c.vec_id != q.vec_id
    ),
    cand AS (
      SELECT query_id, cand_id, sim FROM (
        SELECT query_id, cand_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, cand_id) AS rk
        FROM sims) t
      WHERE rk <= {_MMR_CAND}
    ),
    pair AS (
      SELECT ca.query_id, ca.cand_id AS a, cb.cand_id AS b,
             {dot.format(a="x.embedding", b="y.embedding")}
               / (x.nrm * y.nrm) AS psim
      FROM cand ca JOIN cand cb ON ca.query_id = cb.query_id
                                AND ca.cand_id != cb.cand_id
      JOIN n x ON x.vec_id = ca.cand_id
      JOIN n y ON y.vec_id = cb.cand_id
    ),
    s1 AS (
      SELECT query_id, cand_id, sim,
             {_MMR_LAM} * sim - {1 - _MMR_LAM:.1f} * 0.0 AS score,
             1 AS pick_rank
      FROM (SELECT query_id, cand_id, sim,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY {_MMR_LAM} * sim DESC, cand_id) AS rrk
            FROM cand) t WHERE rrk = 1
    )"""]
    for s in range(2, _MMR_K + 1):
        sel = " UNION ALL ".join(
            f"SELECT query_id, cand_id FROM s{j}" for j in range(1, s))
        parts.append(f""",
    pen{s} AS (
      SELECT c.query_id, c.cand_id, c.sim, max(p.psim) AS pen
      FROM cand c
      LEFT JOIN ({sel}) sl
        ON sl.query_id = c.query_id AND sl.cand_id = c.cand_id
      JOIN pair p ON p.query_id = c.query_id AND p.a = c.cand_id
      JOIN ({sel}) se ON se.query_id = p.query_id AND se.cand_id = p.b
      WHERE sl.cand_id IS NULL
      GROUP BY c.query_id, c.cand_id, c.sim
    ),
    s{s} AS (
      SELECT query_id, cand_id, sim,
             {_MMR_LAM} * sim - {1 - _MMR_LAM:.1f} * pen AS score,
             {s} AS pick_rank
      FROM (SELECT query_id, cand_id, sim, pen,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY {_MMR_LAM} * sim - {1 - _MMR_LAM:.1f} * pen
                                DESC, cand_id) AS rrk
            FROM pen{s}) t WHERE rrk = 1
    )""")
    union = " UNION ALL ".join(
        f"SELECT query_id, cand_id, CAST(pick_rank AS BIGINT) AS pick_rank, "
        f"floor(score * CAST(1000000.0 AS DOUBLE) + 0.5) "
        f"/ CAST(1000000.0 AS DOUBLE) AS score FROM s{j}"
        for j in range(1, _MMR_K + 1))
    return "".join(parts) + "\n    " + union


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-k: from each query's 10 nearest neighbors, pick 5
    greedily maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the
    diversity-aware retrieval/sampling step that keeps a training
    batch or RAG context from filling with near-duplicates of one
    result. The greedy loop is UNROLLED (k fixed) into per-step
    anti-join → penalty-max → argmax stages on both engines; sims are
    in-order-fold doubles (bit-identical cross-engine, the
    ``cosine_topk_bruteforce`` discipline), ties break on cand_id.

    Scale: candidate generation is the ANN path (here brute-force over
    broadcast queries); the MMR loop itself touches only q×10
    candidate rows and their 10×10 pair sims — driver-scale data,
    distributed plan, no collect."""
    (emb,) = load(spark, sf_dir, "embeddings")
    n = emb.withColumn("nrm", _norm_col("embedding"))
    q = (n.filter(F.col("vec_id") < _MMR_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"))
    sims = (c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
             .select("query_id", "cand_id",
                     (F.expr(_DOT.format(a="q_emb", b="c_emb"))
                      / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim")))
    wq = W.partitionBy("query_id").orderBy(F.desc("sim"), F.col("cand_id"))
    cand = (sims.withColumn("rk", F.row_number().over(wq))
                .filter(F.col("rk") <= _MMR_CAND)
                .select("query_id", "cand_id", "sim")
                .localCheckpoint(eager=True))
    pair = (cand.alias("ca")
            .join(cand.alias("cb"),
                  (F.col("ca.query_id") == F.col("cb.query_id"))
                  & (F.col("ca.cand_id") != F.col("cb.cand_id")))
            .join(n.alias("x"), F.col("ca.cand_id") == F.col("x.vec_id"))
            .join(n.alias("y"), F.col("cb.cand_id") == F.col("y.vec_id"))
            .select(F.col("ca.query_id").alias("query_id"),
                    F.col("ca.cand_id").alias("a"),
                    F.col("cb.cand_id").alias("b"),
                    (F.expr(_DOT.format(a="x.embedding", b="y.embedding"))
                     / (F.col("x.nrm") * F.col("y.nrm"))).alias("psim"))
            .localCheckpoint(eager=True))
    lam, mu = _MMR_LAM, round(1 - _MMR_LAM, 1)
    w1 = W.partitionBy("query_id").orderBy(
        F.desc(F.lit(lam) * F.col("sim")), F.col("cand_id"))
    sel = (cand.withColumn("rrk", F.row_number().over(w1))
               .filter(F.col("rrk") == 1)
               .select("query_id", "cand_id", "sim",
                       (F.lit(lam) * F.col("sim")
                        - F.lit(mu) * F.lit(0.0)).alias("score"),
                       F.lit(1).alias("pick_rank")))
    for s in range(2, _MMR_K + 1):
        chosen = sel.select("query_id", "cand_id")
        rem = cand.join(chosen, ["query_id", "cand_id"], "left_anti")
        se = chosen.select(F.col("query_id").alias("sq"),
                           F.col("cand_id").alias("sb"))
        pen = (rem.join(pair, (rem["query_id"] == pair["query_id"])
                        & (rem["cand_id"] == pair["a"]))
                  .join(se, (pair["query_id"] == F.col("sq"))
                        & (pair["b"] == F.col("sb")))
                  .groupBy(rem["query_id"].alias("query_id"),
                           rem["cand_id"].alias("cand_id"),
                           rem["sim"].alias("sim"))
                  .agg(F.max("psim").alias("pen")))
        score = F.lit(lam) * F.col("sim") - F.lit(mu) * F.col("pen")
        ws = W.partitionBy("query_id").orderBy(F.desc(score),
                                               F.col("cand_id"))
        # localCheckpoint: later iterations join `pair` against frames
        # derived from this pick — pin it (≤ n_queries rows) so Spark
        # doesn't see a self-join on the pair lineage
        pick = (pen.withColumn("rrk", F.row_number().over(ws))
                   .filter(F.col("rrk") == 1)
                   .select("query_id", "cand_id", "sim",
                           score.alias("score"),
                           F.lit(s).alias("pick_rank"))
                   .localCheckpoint(eager=True))
        sel = sel.unionByName(pick)
    return sel.select("query_id", "cand_id",
                      F.col("pick_rank").cast("long").alias("pick_rank"),
                      quantize(F.col("score"), 6).alias("score"))


_KNN_NQ = 50    # deterministic probe set: vec_id < 50


@query(
    "knn_label_agreement",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             c.label AS c_label,
             list_aggregate(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE)
                    * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (q.nrm * c.nrm) AS sim,
             c.vec_id AS cand_id
      FROM n q JOIN n c ON q.vec_id < {_KNN_NQ} AND c.vec_id != q.vec_id
    ),
    nn AS (
      SELECT query_id, q_label, c_label FROM (
        SELECT query_id, q_label, c_label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, cand_id) AS rk
        FROM sims) t
      WHERE rk = 1
    )
    SELECT CAST(q_label AS BIGINT) AS label, count(*) AS n_queries,
           CAST(sum(CASE WHEN q_label = c_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           floor((CAST(sum(CASE WHEN q_label = c_label THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*))
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS agreement
    FROM nn GROUP BY q_label
    """)
def knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality eval: 1-NN label agreement — for each probe
    vector, does its nearest neighbor (cosine, excluding itself) carry
    the same label? Aggregated per label. The standard cheap proxy for
    'are these embeddings good for this labeling' before committing to
    a training run; near-random agreement means the embedding space
    doesn't separate the classes.

    Scale: the probe set broadcasts against the streaming corpus (the
    ``cosine_topk_bruteforce`` plan); per-label aggregation is
    label-cardinality."""
    (emb,) = load(spark, sf_dir, "embeddings")
    n = emb.withColumn("nrm", _norm_col("embedding"))
    q = (n.filter(F.col("vec_id") < _KNN_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("label").alias("q_label"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("label").alias("c_label"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"))
    sims = (c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
             .select("query_id", "q_label", "c_label", "cand_id",
                     (F.expr(_DOT.format(a="q_emb", b="c_emb"))
                      / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim")))
    wq = W.partitionBy("query_id").orderBy(F.desc("sim"), F.col("cand_id"))
    nn = (sims.withColumn("rk", F.row_number().over(wq))
              .filter(F.col("rk") == 1))
    agree = F.sum((F.col("q_label") == F.col("c_label")).cast("long"))
    return (nn.groupBy(F.col("q_label").cast("long").alias("label"))
              .agg(F.count(F.lit(1)).alias("n_queries"),
                   agree.alias("n_agree"))
              .select("label", "n_queries", "n_agree",
                      quantize(F.col("n_agree").cast("double")
                               / F.col("n_queries"), 4).alias("agreement")))


_SDD_CELLS = 16      # SemDeDup: coarse cluster count
_SDD_TAU = 0.40      # similarity cutoff (calibrated to the synthetic
                     # corpus; production text embeddings use ~0.9)


@query(
    "semdedup_prune",
    oracle=f"""
    WITH {_trained_cents_sql(_SDD_CELLS)},
    vecs AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT v.vec_id, v.embedding, v.nrm, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                                       i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                                       'sum') / (v.nrm * c.cnrm) DESC, c.cid) AS crk
      FROM vecs v CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, embedding, nrm, cid FROM scored WHERE crk = 1),
    pairs AS (
      SELECT a.cid, a.vec_id AS kept_id, b.vec_id AS vec_id,
             list_aggregate(list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
                    'sum') / (a.nrm * b.nrm) AS sim
      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, kept_id,
           floor(sim * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS sim
    FROM (SELECT vec_id, cid, kept_id, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, kept_id) AS rk
          FROM pairs WHERE sim >= {_SDD_TAU})
    WHERE rk = 1
    """)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC
    dedup for training corpora: cluster the embedding space coarsely,
    then mark as prunable every vector that has a same-cluster mate
    above the cosine cutoff, keeping the lowest-id representative.
    Output: one row per pruned vector with its cluster, its keeper
    (the sub-threshold survivor it duplicates — highest sim, then
    lowest id) and the similarity — the dedup PROVENANCE relation
    (who shadows whom, at what similarity), complementing
    ``semantic_dedup_survivors`` which emits the per-vector
    keep/drop verdict for mixture accounting.

    Scale design — the paper's central trick, preserved: pairwise
    similarity is computed ONLY within clusters, never corpus-wide, so
    the quadratic term is Σ(N/K)² « N². Cluster assignment is the IVF
    literal-codebook map-only argmax (no shuffle); the within-cluster
    self-join shuffles on cid, and at 100 TB the corpus would be
    WRITTEN partitioned by cid so the join is partition-local. The
    same in-order-fold dot products as the ANN family keep the hash
    oracle exact."""
    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("nrm", _norm_col("embedding"))
    # trained coarse codebook (r13, shared session-cached training
    # with the IVF family — k = _SDD_CELLS = _N_CELLS)
    csims = _cosine_csims(trained_codebook(spark, sf_dir, _SDD_CELLS))
    cells = (vecs.withColumn("csims", csims)
                 .withColumn("cid", (F.expr("array_position(csims, array_max(csims))") - 1)
                             .cast("long"))
                 .select("vec_id", "embedding", "nrm", "cid"))
    a = cells.select(F.col("cid").alias("a_cid"),
                     F.col("vec_id").alias("kept_id"),
                     F.col("embedding").alias("a_emb"),
                     F.col("nrm").alias("a_nrm"))
    b = cells.select("cid", "vec_id",
                     F.col("embedding").alias("b_emb"),
                     F.col("nrm").alias("b_nrm"))
    pairs = (a.join(b, (F.col("a_cid") == F.col("cid"))
                    & (F.col("kept_id") < F.col("vec_id")))
              .withColumn("sim", F.expr(_DOT.format(a="a_emb", b="b_emb"))
                          / (F.col("a_nrm") * F.col("b_nrm")))
              .filter(F.col("sim") >= _SDD_TAU))
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.col("kept_id"))
    return (pairs.withColumn("rk", F.row_number().over(w))
                 .filter(F.col("rk") == 1)
                 .select("vec_id", F.col("cid").alias("cluster_id"),
                         "kept_id", quantize("sim", 4).alias("sim")))


_KG_BANDS = 2      # LSH bands over the 8 hyperplane bits (4 bits each)
_KG_BITS = 4
_KG_K = 3          # neighbors per node in the output graph

_KG_DUCK_BITS = " || ".join(_duck_sign_bit(p) for p in range(_N_PLANES))


@query(
    "knn_graph_lsh",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_KG_DUCK_BITS} AS bits FROM embeddings
    ),
    bands AS (
      SELECT vec_id, b, substring(bits, 1 + b * {_KG_BITS}, {_KG_BITS}) AS bucket
      FROM sig CROSS JOIN (SELECT unnest(range({_KG_BANDS})) AS b)
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS node_id, c.vec_id AS cand_id
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ),
    n AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT p.node_id, p.cand_id,
             list_aggregate(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (a.nrm * c.nrm) AS sim
      FROM pairs p
      JOIN n a ON a.vec_id = p.node_id
      JOIN n c ON c.vec_id = p.cand_id
    )
    SELECT node_id, rk, cand_id,
           floor(sim * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS sim
    FROM (SELECT node_id, cand_id, sim,
                 row_number() OVER (PARTITION BY node_id
                                    ORDER BY sim DESC, cand_id) AS rk
          FROM scored) t
    WHERE rk <= {_KG_K}
    """)
def knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH build — every corpus vector gets its {_KG_K} nearest
    same-bucket neighbors (cosine), with candidates generated by
    banded random-hyperplane LSH ({_KG_BANDS} bands × {_KG_BITS} sign
    bits; a pair is a candidate if it collides in ANY band — the
    minhash-band discipline applied to dense vectors). The k-NN graph
    is the substrate for graph-based dedup clustering, SemDeDup-style
    pruning, label propagation, and graph-ANN (NSW) index seeding —
    distinct from the probe-set searches (``cosine_topk_bruteforce``,
    ``ivf_topk_search``): here EVERY node is a query, which is exactly
    when brute force becomes corpus-quadratic and banding becomes
    mandatory.

    Scale: plane projections are map-only plan literals (one fused
    multiply-add pass per vector, no per-row hashing); band self-joins
    shuffle only (vec_id, band, bucket) slivers; the candidate set is
    id-DISTINCT'd BEFORE embeddings are re-attached, so full vectors
    ride only two hash joins of the deduped pair list against the
    corpus — pair generation never shuffles a vector. At 100 TB the
    corpus side is written bucketed by vec_id so both re-attach joins
    co-locate; Σ bucket² bounds candidate volume like every banded
    path in this codebase (cf. ``minhash_lsh_candidates``)."""
    import hashlib

    (emb,) = load(spark, sf_dir, "embeddings")
    ndims = emb.select(F.size("embedding").alias("n")).first()["n"]
    sign_bits = []
    for p in range(_N_PLANES):
        ws = [1.0 if hashlib.md5(f"plane{p}_{i}".encode()).hexdigest()[0] < "8"
              else -1.0 for i in range(1, ndims + 1)]
        arr = "array(" + ", ".join(f"CAST({w} AS DOUBLE)" for w in ws) + ")"
        dot = (f"aggregate(zip_with(embedding, {arr}, "
               f"(x, w) -> CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE), "
               f"(a, v) -> a + v)")
        sign_bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    bits = F.expr("concat(" + ", ".join(sign_bits) + ")")

    par = spark.sparkContext.defaultParallelism
    sig = (emb.repartition(par)
              .select("vec_id", bits.alias("bits"))
              .select("vec_id", F.posexplode(F.expr(
                  f"transform(sequence(0, {_KG_BANDS - 1}), "
                  f"b -> substring(bits, 1 + b * {_KG_BITS}, {_KG_BITS}))"))
                  .alias("b", "bucket")))
    a = sig.select(F.col("vec_id").alias("node_id"), "b", "bucket")
    c = sig.select(F.col("vec_id").alias("cand_id"), "b", "bucket")
    pairs = (a.join(c, ["b", "bucket"])
              .filter(F.col("node_id") != F.col("cand_id"))
              .select("node_id", "cand_id").distinct())

    n = emb.select("vec_id", "embedding",
                   _norm_col("embedding").alias("nrm"))
    na = n.select(F.col("vec_id").alias("node_id"),
                  F.col("embedding").alias("a_emb"),
                  F.col("nrm").alias("a_nrm"))
    nc = n.select(F.col("vec_id").alias("cand_id"),
                  F.col("embedding").alias("c_emb"),
                  F.col("nrm").alias("c_nrm"))
    scored = (pairs.join(na, "node_id").join(nc, "cand_id")
                   .withColumn("sim",
                               F.expr(_DOT.format(a="a_emb", b="c_emb"))
                               / (F.col("a_nrm") * F.col("c_nrm"))))
    w = W.partitionBy("node_id").orderBy(F.desc("sim"), F.col("cand_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= _KG_K)
                  .select("node_id", "rk", "cand_id",
                          quantize("sim", 4).alias("sim")))


_CB_NTOK = 8    # token views per vector: 64 dims = 8 tokens x 8 dims
_CB_TDIM = 8
_CB_NQ = 10     # probe queries: vec_id < 10
_CB_K = 5       # reranked results per query


@query(
    "colbert_maxsim_topk",
    oracle=f"""
    WITH tok AS (
      SELECT vec_id,
             list_transform(range(0, {_CB_NTOK}), t ->
               list_transform(list_slice(embedding,
                                         1 + t * {_CB_TDIM},
                                         {_CB_TDIM} + t * {_CB_TDIM}),
                              x -> CAST(x AS DOUBLE))) AS tk
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, tk,
             list_transform(tk, a ->
               sqrt(list_aggregate(list_transform(a, x -> x * x), 'sum')))
               AS tn
      FROM tok
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_aggregate(list_transform(range(0, {_CB_NTOK}), t ->
               list_max(list_transform(range(0, {_CB_NTOK}), u ->
                 CASE WHEN q.tn[t+1] * c.tn[u+1] = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE list_aggregate(list_transform(range(1, {_CB_TDIM} + 1),
                        i -> q.tk[t+1][i] * c.tk[u+1][i]), 'sum')
                      / (q.tn[t+1] * c.tn[u+1]) END))), 'sum') AS score
      FROM n q JOIN n c ON q.vec_id < {_CB_NQ} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, rk, cand_id,
           floor(score * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS score
    FROM (SELECT query_id, cand_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, cand_id) AS rk
          FROM scored) t
    WHERE rk <= {_CB_K}
    """)
def colbert_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim retrieval: each vector
    is viewed as {_CB_NTOK} token embeddings of {_CB_TDIM} dims (a
    deterministic reinterpretation of the testdata's flat 64-dim
    vectors — a real deployment stores per-token embeddings directly);
    score(q, d) = Σ_t max_u cos(q_t, d_u). MaxSim is the standard
    second-stage reranker between single-vector ANN recall and full
    cross-encoders: it keeps per-token granularity (term-level
    matching) while remaining embarrassingly data-parallel.

    Exactness: every cosine is an in-order 8-element fold, the max is
    exact, and the outer sum folds t = 0..{_CB_NTOK - 1} in order —
    identical expression trees on both engines, then quantized.

    Scale: the {_CB_NQ}-query token matrix broadcasts; the corpus
    streams through one whole-stage-codegen projection (no shuffle
    until the per-query top-{_CB_K} WindowGroupLimit). At 100 TB the
    candidate set comes from the ANN ladder (``ivf_topk_search`` /
    ``knn_graph_lsh``) instead of the full corpus — MaxSim then costs
    candidates × tokens², never corpus × tokens²."""
    (emb,) = load(spark, sf_dir, "embeddings")
    tok = (f"transform(sequence(0, {_CB_NTOK - 1}), t -> "
           f"transform(slice(embedding, 1 + t * {_CB_TDIM}, {_CB_TDIM}), "
           f"x -> CAST(x AS DOUBLE)))")
    tn = ("transform(tk, a -> sqrt(aggregate(a, CAST(0.0 AS DOUBLE), "
          "(acc, x) -> acc + x * x)))")
    n = (emb.select("vec_id", F.expr(tok).alias("tk"))
            .select("vec_id", "tk", F.expr(tn).alias("tn")))
    q = (n.filter(F.col("vec_id") < _CB_NQ)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("tk").alias("q_tk"), F.col("tn").alias("q_tn")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("tk").alias("c_tk"), F.col("tn").alias("c_tn"))
    cos = (f"CASE WHEN element_at(q_tn, t + 1) * element_at(c_tn, u + 1) "
           f"= CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE) "
           f"ELSE aggregate(zip_with(element_at(q_tk, t + 1), "
           f"element_at(c_tk, u + 1), (x, y) -> x * y), "
           f"CAST(0.0 AS DOUBLE), (a, v) -> a + v) "
           f"/ (element_at(q_tn, t + 1) * element_at(c_tn, u + 1)) END")
    score = (f"aggregate(transform(sequence(0, {_CB_NTOK - 1}), t -> "
             f"array_max(transform(sequence(0, {_CB_NTOK - 1}), u -> "
             f"{cos}))), CAST(0.0 AS DOUBLE), (a, v) -> a + v)")
    par = spark.sparkContext.defaultParallelism
    scored = (c.repartition(par)
               .join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
               .withColumn("score", F.expr(score)))
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.col("cand_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= _CB_K)
                  .select("query_id", "rk", "cand_id",
                          quantize("score", 4).alias("score")))


def _ivf_search_oracle() -> str:
    """The IVF probe semantics as SQL (same relation as
    ``ivf_topk_search``'s oracle — the storage variant below must
    return the identical answer; only the PHYSICAL scan differs)."""
    return f"""
    WITH {_trained_cents_sql()},
    vecs AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT v.vec_id, v.embedding, v.nrm, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                                       i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                                       'sum') / (v.nrm * c.cnrm) DESC, c.cid) AS crk
      FROM vecs v CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, embedding, nrm, cid FROM scored WHERE crk = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM scored
               WHERE vec_id < {_N_QUERIES} AND crk <= {_N_PROBE}),
    qv AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
           FROM vecs WHERE vec_id < {_N_QUERIES}),
    sims AS (
      SELECT p.query_id, t.vec_id AS cand_id,
             list_aggregate(list_transform(range(1, len(q.q_emb) + 1),
                    i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)),
                    'sum') / (q.q_nrm * t.nrm) AS sim
      FROM probes p JOIN cells t ON t.cid = p.cid AND t.vec_id != p.query_id
                    JOIN qv q ON q.query_id = p.query_id
    )
    SELECT query_id, cand_id, floor((sim) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS sim, rk
    FROM (SELECT query_id, cand_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, cand_id) AS rk
          FROM sims)
    WHERE rk <= {_TOP_K}
    """


@query("ivf_store_pruned_search", oracle=_ivf_search_oracle())
def ivf_store_pruned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN ladder composed with the STORAGE layer — the 100 TB
    claim in ``ivf_topk_search``'s docstring ('the corpus would be
    WRITTEN partitioned by cell so a probe prunes whole files') made
    real and counter-asserted: the corpus lands as one CAS object per
    IVF cell, the probe list is computed from the codebook, and the
    search opens EXACTLY the probed cells' objects (asserted against
    the store's load counter) — every other cell is never read. Same
    answer as the logical IVF search (shared oracle relation).

    Scale: the per-cell write is the index build (one pass, shuffle on
    cid); a query's IO is Σ probed-cell objects — nprobe/K of the
    corpus — decided driver-side from the manifest like every pruned
    layout here (``range_bucketed_prune``, ``zorder_box_prune``). At
    1000 executors each probed cell streams independently; the
    codebook and probe list stay broadcast-sized."""
    import os
    import shutil
    import tempfile

    from ..store import ObjectStore

    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.withColumn("nrm", _norm_col("embedding"))
    # trained coarse codebook (r13) — session-cached, shared with
    # ivf_topk_search; plan-literal map-only assignment as before
    csims = _cosine_csims(trained_codebook(spark, sf_dir, _N_CELLS))

    assigned = (vecs.withColumn("csims", csims)
                    .withColumn("cid", (F.expr(
                        "array_position(csims, array_max(csims))") - 1)
                        .cast("long"))
                    .select("vec_id", "embedding", "nrm", "cid")
                    .localCheckpoint(eager=True))

    # probe list (tiny): per-query top-nprobe cells
    qsims = (vecs.filter(F.col("vec_id") < _N_QUERIES)
                 .withColumn("csims", csims)
                 .select(F.col("vec_id").alias("query_id"),
                         F.posexplode("csims").alias("pos", "csim")))
    wq = W.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("pos"))
    probes = (qsims.withColumn("crk", F.row_number().over(wq))
                   .filter(F.col("crk") <= _N_PROBE)
                   .select("query_id", F.col("pos").cast("long").alias("cid"))
                   .localCheckpoint(eager=True))
    probed_cells = sorted({r["cid"] for r in probes.select("cid")
                           .distinct().collect()})

    tmp = tempfile.mkdtemp(prefix="messdb_ivfstore_")
    try:
        from ..plans.incremental import _BUCKET, _write_tagged_buckets

        store = ObjectStore(os.path.join(tmp, "wh"))
        # index build: ONE object per cell (cell id -> content hash) via
        # the engine's tagged-bucket writer — one partitioned write +
        # one digest agg + renames, never a Spark job per cell
        manifest = _write_tagged_buckets(
            store, assigned.withColumnRenamed("cid", _BUCKET),
            n_parts=_N_CELLS)
        loads0 = store.loads
        cand, n_objects = _probe_read(spark, store, manifest, probed_cells)
        opened = store.loads - loads0
        if opened != n_objects:
            raise AssertionError(
                f"opened {opened} objects for {len(probed_cells)} probed "
                f"cells — probe IO must equal the probe list")
        if opened >= len(manifest):
            raise AssertionError(
                f"probe opened every cell ({opened}/{len(manifest)}) — "
                f"no pruning")
        qv = (vecs.filter(F.col("vec_id") < _N_QUERIES)
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("embedding").alias("q_emb"),
                          F.col("nrm").alias("q_nrm")))
        probe_q = probes.join(qv, "query_id")
        sims = (cand.join(F.broadcast(probe_q),
                          (cand["cid"] == probe_q["cid"]) &
                          (cand["vec_id"] != probe_q["query_id"]))
                    .withColumn("sim",
                                F.expr(_DOT.format(a="q_emb", b="embedding")) /
                                (F.col("q_nrm") * F.col("nrm"))))
        w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                              F.col("vec_id"))
        out = (sims.withColumn("rk", F.row_number().over(w))
                   .filter(F.col("rk") <= _TOP_K)
                   .select("query_id", F.col("vec_id").alias("cand_id"),
                           quantize("sim", 4).alias("sim"), "rk")
                   .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# incremental IVF maintenance: one re-embed micro-batch. A FIXED-COUNT
# delta (8 vectors, ids just past the codebook block) rather than a
# corpus fraction: a fractional delta at bench SF scatters its members'
# OLD cells across the whole 16-cell codebook (any ≥50 random vectors
# touch every cell), leaving no untouched cells to prune — the
# cell-pruning contract is only observable when the delta is small
# relative to the cell count, which is exactly the per-cycle shape
# (real IVF also scales cells ~√N, keeping deltas cell-sparse).
_IVF_DRIFT_LO = 16
_IVF_DRIFT_HI = 24


def _ivf_refresh_oracle() -> str:
    """``_ivf_search_oracle``'s relation over the POST-DRIFT corpus
    (vec_ids [16, 24) re-embedded as -x, the codebook frozen on the
    undrifted base) — the full-rebuild answer the incremental refresh
    must reproduce exactly."""
    return f"""
    WITH {_trained_cents_sql()},
    corpus AS (
      SELECT vec_id,
             CASE WHEN vec_id >= {_IVF_DRIFT_LO} AND vec_id < {_IVF_DRIFT_HI}
                  THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS embedding
      FROM embeddings
    ),
    vecs AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
      FROM corpus
    ),
    scored AS (
      SELECT v.vec_id, v.embedding, v.nrm, c.cid,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY list_aggregate(list_transform(range(1, len(v.embedding) + 1),
                                       i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE)),
                                       'sum') / (v.nrm * c.cnrm) DESC, c.cid) AS crk
      FROM vecs v CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, embedding, nrm, cid FROM scored WHERE crk = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM scored
               WHERE vec_id < {_N_QUERIES} AND crk <= {_N_PROBE}),
    qv AS (SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
           FROM vecs WHERE vec_id < {_N_QUERIES}),
    sims AS (
      SELECT p.query_id, t.vec_id AS cand_id,
             list_aggregate(list_transform(range(1, len(q.q_emb) + 1),
                    i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)),
                    'sum') / (q.q_nrm * t.nrm) AS sim
      FROM probes p JOIN cells t ON t.cid = p.cid AND t.vec_id != p.query_id
                    JOIN qv q ON q.query_id = p.query_id
    )
    SELECT query_id, cand_id, floor((sim) * CAST(10000.0 AS DOUBLE) + 0.5) / CAST(10000.0 AS DOUBLE) AS sim, rk
    FROM (SELECT query_id, cand_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, cand_id) AS rk
          FROM sims)
    WHERE rk <= {_TOP_K}
    """


@query("incremental_ivf_refresh", oracle=_ivf_refresh_oracle())
def incremental_ivf_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE under churn (VERDICT r7 #7): a re-embed
    micro-batch (vec_ids [_IVF_DRIFT_LO, _IVF_DRIFT_HI), sign-flip
    drift — exact in float on both engines) arrives, and the cell-partitioned CAS store from
    ``ivf_store_pruned_search`` refreshes by rewriting ONLY the cells
    the delta touches — a drifted vector's OLD cell (it leaves) and
    NEW cell (it arrives; sign-flip guarantees movement). In-body
    asserts pin the contract: (a) refreshed cells ≤ touched cells > 0
    and < all cells, (b) every untouched cell keeps its v1 content
    hash with zero new writes, (c) the refreshed manifest is
    CELL-FOR-CELL HASH-EQUAL to a from-scratch rebuild of the
    post-drift corpus (computed as one digest aggregation — no second
    write), and (d) the probe reads exactly the probed cells' objects.
    The probe's top-k then hash-checks against DuckDB's full-rebuild
    relation.

    Scale: refresh cost ∝ rows in touched cells (re-embed rate ×
    cluster size), never the corpus; this is the operational loop of
    a 100 TB vector store under continuous re-embedding — the
    reference's delta-proportional refresh (``Trie.hs:346-348``)
    carried to ANN serving infrastructure."""
    import os
    import shutil
    import tempfile

    from ..hashing import bucket_content_hashes
    from ..plans.incremental import _BUCKET, _write_tagged_buckets
    from ..store import ObjectStore

    (emb,) = load(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    vecs1 = base.withColumn("nrm", _norm_col("embedding"))
    # frozen TRAINED codebook from the UNDRIFTED base (r13;
    # re-clustering is a separate, rarer maintenance op) — plan
    # literals, map-only assign, session-cached with the IVF family
    csims = _cosine_csims(trained_codebook(spark, sf_dir, _N_CELLS))

    def assign(df: DataFrame) -> DataFrame:
        return (df.withColumn("csims", csims)
                  .withColumn("cid", (F.expr(
                      "array_position(csims, array_max(csims))") - 1)
                      .cast("long"))
                  .select("vec_id", "embedding", "nrm", "cid"))

    is_drift = ((F.col("vec_id") >= _IVF_DRIFT_LO)
                & (F.col("vec_id") < _IVF_DRIFT_HI))
    a1 = assign(vecs1).localCheckpoint(eager=True)

    tmp = tempfile.mkdtemp(prefix="messdb_ivfrefresh_")
    try:
        store = ObjectStore(os.path.join(tmp, "wh"))
        man1 = _write_tagged_buckets(store,
                                     a1.withColumnRenamed("cid", _BUCKET),
                                     n_parts=_N_CELLS)

        # the delta: drifted vectors, reassigned under the same codebook
        drifted = (base.filter(is_drift)
                       .withColumn("embedding",
                                   F.expr("transform(embedding, x -> -x)"))
                       .withColumn("nrm", _norm_col("embedding")))
        d2 = assign(drifted).localCheckpoint(eager=True)
        old_cids = {r["cid"] for r in
                    a1.filter(is_drift).select("cid").distinct().collect()}
        new_cids = {r["cid"] for r in d2.select("cid").distinct().collect()}
        touched = sorted(old_cids | new_cids)
        if not 0 < len(touched) < _N_CELLS:
            raise AssertionError(
                f"drift touched {len(touched)}/{_N_CELLS} cells — no "
                f"incrementality to demonstrate")

        # refresh: rewrite ONLY touched cells with their post-drift rows
        saves0 = store.saves + store.save_skips
        v2_touched = (a1.filter(~is_drift).filter(F.col("cid").isin(touched))
                        .unionByName(d2))
        man_delta = _write_tagged_buckets(
            store, v2_touched.withColumnRenamed("cid", _BUCKET),
            n_parts=len(touched), tag_domain=touched)
        refreshed = (store.saves + store.save_skips) - saves0
        if refreshed > len(touched):
            raise AssertionError(
                f"refresh wrote {refreshed} cells for {len(touched)} touched")
        man2 = {c: h for c, h in man1.items() if c not in set(touched)}
        man2.update(man_delta)   # a drained touched cell simply drops out

        # (c) hash-equal to a from-scratch rebuild (digest-only, no write)
        v2_full = a1.filter(~is_drift).unionByName(d2)
        man_full = bucket_content_hashes(
            v2_full.withColumnRenamed("cid", _BUCKET), _BUCKET)
        if man2 != man_full:
            diff = {c for c in set(man2) | set(man_full)
                    if man2.get(c) != man_full.get(c)}
            raise AssertionError(
                f"incremental refresh != full rebuild at cells {sorted(diff)}")

        # probe the refreshed store: per-query top-nprobe cells
        qsims = (v2_full.filter(F.col("vec_id") < _N_QUERIES)
                        .withColumn("csims", csims)
                        .select(F.col("vec_id").alias("query_id"),
                                F.posexplode("csims").alias("pos", "csim")))
        wq = W.partitionBy("query_id").orderBy(F.col("csim").desc(),
                                               F.col("pos"))
        probes = (qsims.withColumn("crk", F.row_number().over(wq))
                       .filter(F.col("crk") <= _N_PROBE)
                       .select("query_id",
                               F.col("pos").cast("long").alias("cid"))
                       .localCheckpoint(eager=True))
        probed_cells = sorted({r["cid"] for r in probes.select("cid")
                               .distinct().collect()})
        loads0 = store.loads
        cand, n_objects = _probe_read(spark, store, man2, probed_cells)
        opened = store.loads - loads0
        if opened != n_objects:
            raise AssertionError(
                f"opened {opened} objects for {len(probed_cells)} probed "
                f"cells — probe IO must equal the probe list")

        qv = (v2_full.filter(F.col("vec_id") < _N_QUERIES)
                     .select(F.col("vec_id").alias("query_id"),
                             F.col("embedding").alias("q_emb"),
                             F.col("nrm").alias("q_nrm")))
        probe_q = probes.join(qv, "query_id")
        sims = (cand.join(F.broadcast(probe_q),
                          (cand["cid"] == probe_q["cid"]) &
                          (cand["vec_id"] != probe_q["query_id"]))
                    .withColumn("sim",
                                F.expr(_DOT.format(a="q_emb", b="embedding")) /
                                (F.col("q_nrm") * F.col("nrm"))))
        w = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                              F.col("vec_id"))
        out = (sims.withColumn("rk", F.row_number().over(w))
                   .filter(F.col("rk") <= _TOP_K)
                   .select("query_id", F.col("vec_id").alias("cand_id"),
                           quantize("sim", 4).alias("sim"), "rk")
                   .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_HN_K = 3    # hard negatives per anchor


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             list_aggregate(list_transform(range(1, len(q.embedding) + 1),
               i -> CAST(q.embedding[i] AS DOUBLE)
                    * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (q.nrm * c.nrm) AS sim
      FROM n q JOIN n c
        ON q.vec_id < {_N_QUERIES} AND c.label != q.label
    )
    SELECT anchor_id, rk, neg_id,
           CAST(neg_label AS BIGINT) AS neg_label,
           floor(sim * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS sim
    FROM (SELECT anchor_id, neg_id, neg_label, sim,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY sim DESC, neg_id) AS rk
          FROM sims) t
    WHERE rk <= {_HN_K}
    """)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR /
    sentence-transformers batch-construction step): for each anchor,
    the top-{_HN_K} most-similar vectors carrying a DIFFERENT label —
    the negatives that actually move a contrastive loss (random
    negatives are trivially separated; hardest-confusable ones define
    the decision boundary). Same broadcast-probe discipline as
    ``knn_label_agreement`` with the label-mismatch predicate fused
    into the join.

    Scale: anchors broadcast, corpus streams once, WindowGroupLimit
    caps per-anchor state at k; at 100 TB the candidate pool comes
    from the ANN ladder and this ranks candidates × anchors, never
    corpus × anchors."""
    (emb,) = load(spark, sf_dir, "embeddings")
    n = emb.withColumn("nrm", _norm_col("embedding"))
    q = (n.filter(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("anchor_id"),
                  F.col("label").alias("anchor_label"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm")))
    c = n.select(F.col("vec_id").alias("neg_id"),
                 F.col("label").alias("neg_label"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"))
    par = spark.sparkContext.defaultParallelism
    sims = (c.repartition(par)
             .join(F.broadcast(q),
                   F.col("neg_label") != F.col("anchor_label"))
             .withColumn("sim",
                         F.expr(_DOT.format(a="q_emb", b="c_emb"))
                         / (F.col("q_nrm") * F.col("c_nrm"))))
    w = W.partitionBy("anchor_id").orderBy(F.desc("sim"), F.col("neg_id"))
    return (sims.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= _HN_K)
                .select("anchor_id", "rk", "neg_id",
                        F.col("neg_label").cast("long").alias("neg_label"),
                        quantize("sim", 4).alias("sim")))


@query(
    "pooling_recall_eval",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm,
             list_transform(range(1, {_CB_TDIM} + 1), d ->
               list_aggregate(list_transform(range(0, {_CB_NTOK}),
                 t -> CAST(embedding[d + t * {_CB_TDIM}] AS DOUBLE)),
                 'sum') / {_CB_NTOK}) AS pooled
      FROM embeddings
    ),
    np AS (
      SELECT vec_id, embedding, nrm, pooled,
             sqrt(list_aggregate(list_transform(pooled, v -> v * v),
                                 'sum')) AS pnrm
      FROM n
    ),
    full_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_aggregate(list_transform(range(1, len(q.embedding) + 1),
                 i -> CAST(q.embedding[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
      FROM np q JOIN np c
        ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    ),
    pooled_rank AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_aggregate(list_transform(range(1, {_CB_TDIM} + 1),
                 i -> q.pooled[i] * c.pooled[i]), 'sum')
               / (q.pnrm * c.pnrm) DESC, c.vec_id) AS rk
      FROM np q JOIN np c
        ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT f.query_id,
           CAST(count(p.cand_id) AS BIGINT) AS n_overlap,
           floor((CAST(count(p.cand_id) AS DOUBLE) / {_TOP_K})
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS recall_at_{_TOP_K}
    FROM (SELECT * FROM full_rank WHERE rk <= {_TOP_K}) f
    LEFT JOIN (SELECT * FROM pooled_rank WHERE rk <= {_TOP_K}) p
      ON p.query_id = f.query_id AND p.cand_id = f.cand_id
    GROUP BY f.query_id
    """)
def pooling_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooling-fidelity eval: does MEAN-POOLING the {_CB_NTOK} token
    views (64 dims → {_CB_TDIM}) preserve the nearest-neighbor
    structure? For each probe, recall@{_TOP_K} of the pooled-vector
    ranking against the full-vector ranking — the measurement that
    decides whether an 8× smaller index (cheaper ANN, cheaper
    storage) is acceptable, the same decision ``matryoshka_prefix_
    recall`` makes for prefix truncation and
    ``embedding_quantize_int8`` for scalar quantization. Closes the
    compression-eval triad: truncate / quantize / pool.

    Exactness: pooled dims are in-order 8-element folds divided by a
    constant; both rankings tie-break on cand_id, so the overlap count
    is an exact integer on both engines.

    Scale: probes broadcast; the corpus streams once per ranking (the
    pooled pass reads {_CB_TDIM}-dim vectors — at scale it runs over
    the materialized pooled index, not the full corpus)."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pooled = (f"transform(sequence(1, {_CB_TDIM}), d -> "
              f"aggregate(transform(sequence(0, {_CB_NTOK - 1}), "
              f"t -> CAST(element_at(embedding, d + t * {_CB_TDIM}) "
              f"AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v) "
              f"/ {_CB_NTOK}.0D)")
    n = (emb.select("vec_id", "embedding",
                    _norm_col("embedding").alias("nrm"),
                    F.expr(pooled).alias("pooled"))
            .withColumn("pnrm", F.sqrt(F.expr(
                _DOT.format(a="pooled", b="pooled")))))
    q = (n.filter(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm"),
                  F.col("pooled").alias("q_pool"),
                  F.col("pnrm").alias("q_pnrm")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"),
                 F.col("pooled").alias("c_pool"),
                 F.col("pnrm").alias("c_pnrm"))
    par = spark.sparkContext.defaultParallelism
    pairs = (c.repartition(par)
              .join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
              .withColumn("full_sim",
                          F.expr(_DOT.format(a="q_emb", b="c_emb"))
                          / (F.col("q_nrm") * F.col("c_nrm")))
              .withColumn("pool_sim",
                          F.expr(_DOT.format(a="q_pool", b="c_pool"))
                          / (F.col("q_pnrm") * F.col("c_pnrm"))))
    wf = W.partitionBy("query_id").orderBy(F.desc("full_sim"),
                                           F.col("cand_id"))
    wp = W.partitionBy("query_id").orderBy(F.desc("pool_sim"),
                                           F.col("cand_id"))
    ranked = (pairs.withColumn("frk", F.row_number().over(wf))
                   .withColumn("prk", F.row_number().over(wp)))
    fsel = (ranked.filter(F.col("frk") <= _TOP_K)
                  .select("query_id", "cand_id"))
    psel = (ranked.filter(F.col("prk") <= _TOP_K)
                  .select(F.col("query_id").alias("p_qid"),
                          F.col("cand_id").alias("p_cid"),
                          F.lit(1).alias("hit")))
    j = fsel.join(psel, (fsel["query_id"] == psel["p_qid"])
                  & (fsel["cand_id"] == psel["p_cid"]), "left")
    return (j.groupBy("query_id")
             .agg(F.count("hit").cast("long").alias("n_overlap"),
                  quantize(F.count("hit").cast("double") / _TOP_K, 4)
                    .alias(f"recall_at_{_TOP_K}")))


_RRF_K = 60     # RRF damping constant (the standard k=60)


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_aggregate(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum'))
               AS nrm,
             list_transform(range(1, {_CB_TDIM} + 1), d ->
               list_aggregate(list_transform(range(0, {_CB_NTOK}),
                 t -> CAST(embedding[d + t * {_CB_TDIM}] AS DOUBLE)),
                 'sum') / {_CB_NTOK}) AS pooled
      FROM embeddings
    ),
    np AS (
      SELECT vec_id, embedding, nrm, pooled,
             sqrt(list_aggregate(list_transform(pooled, v -> v * v),
                                 'sum')) AS pnrm
      FROM n
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_aggregate(list_transform(range(1, len(q.embedding) + 1),
                 i -> CAST(q.embedding[i] AS DOUBLE)
                      * CAST(c.embedding[i] AS DOUBLE)), 'sum')
               / (q.nrm * c.nrm) DESC, c.vec_id) AS frk,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY
               list_aggregate(list_transform(range(1, {_CB_TDIM} + 1),
                 i -> q.pooled[i] * c.pooled[i]), 'sum')
               / (q.pnrm * c.pnrm) DESC, c.vec_id) AS prk
      FROM np q JOIN np c
        ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, rk, cand_id, frk, prk,
           floor((1.0 / ({_RRF_K} + frk) + 1.0 / ({_RRF_K} + prk))
                 * CAST(1000000.0 AS DOUBLE) + 0.5)
             / CAST(1000000.0 AS DOUBLE) AS rrf_score
    FROM (SELECT query_id, cand_id, frk, prk,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   1.0 / ({_RRF_K} + frk) + 1.0 / ({_RRF_K} + prk) DESC,
                   cand_id) AS rk
          FROM pairs) t
    WHERE rk <= {_TOP_K}
    """)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    2009, k = {_RRF_K}): two rankers — full-vector cosine and the 8×-
    compressed mean-pooled cosine — fuse by Σ 1/(k + rank) per
    candidate, the score-free combination that powers production
    hybrid search (dense + sparse, multi-index, multi-model) because
    it needs NO score calibration between rankers, only ranks.

    Exactness: ranks are deterministic integers (cand_id tie-breaks),
    each RRF term is one exact-integer division, and the score is a
    two-term sum in fixed order — bit-identical across engines.

    Scale: both rankings come from the same broadcast-probe corpus
    pass (two window ranks over one joined relation — no second
    scan); fusing R rankers is R rank columns on that relation, never
    R scans."""
    (emb,) = load(spark, sf_dir, "embeddings")
    pooled = (f"transform(sequence(1, {_CB_TDIM}), d -> "
              f"aggregate(transform(sequence(0, {_CB_NTOK - 1}), "
              f"t -> CAST(element_at(embedding, d + t * {_CB_TDIM}) "
              f"AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v) "
              f"/ {_CB_NTOK}.0D)")
    n = (emb.select("vec_id", "embedding",
                    _norm_col("embedding").alias("nrm"),
                    F.expr(pooled).alias("pooled"))
            .withColumn("pnrm", F.sqrt(F.expr(
                _DOT.format(a="pooled", b="pooled")))))
    q = (n.filter(F.col("vec_id") < _N_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("q_emb"),
                  F.col("nrm").alias("q_nrm"),
                  F.col("pooled").alias("q_pool"),
                  F.col("pnrm").alias("q_pnrm")))
    c = n.select(F.col("vec_id").alias("cand_id"),
                 F.col("embedding").alias("c_emb"),
                 F.col("nrm").alias("c_nrm"),
                 F.col("pooled").alias("c_pool"),
                 F.col("pnrm").alias("c_pnrm"))
    par = spark.sparkContext.defaultParallelism
    pairs = (c.repartition(par)
              .join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
              .withColumn("full_sim",
                          F.expr(_DOT.format(a="q_emb", b="c_emb"))
                          / (F.col("q_nrm") * F.col("c_nrm")))
              .withColumn("pool_sim",
                          F.expr(_DOT.format(a="q_pool", b="c_pool"))
                          / (F.col("q_pnrm") * F.col("c_pnrm"))))
    wf = W.partitionBy("query_id").orderBy(F.desc("full_sim"),
                                           F.col("cand_id"))
    wp = W.partitionBy("query_id").orderBy(F.desc("pool_sim"),
                                           F.col("cand_id"))
    ranked = (pairs.withColumn("frk", F.row_number().over(wf))
                   .withColumn("prk", F.row_number().over(wp)))
    rrf = (1.0 / (_RRF_K + F.col("frk"))
           + 1.0 / (_RRF_K + F.col("prk")))
    wr = W.partitionBy("query_id").orderBy(F.desc(rrf), F.col("cand_id"))
    return (ranked.withColumn("rk", F.row_number().over(wr))
                  .filter(F.col("rk") <= _TOP_K)
                  .select("query_id", "rk", "cand_id", "frk", "prk",
                          quantize(rrf, 6).alias("rrf_score")))
