"""The codebook-training sample floor (r14 stretch #7; r15 hash gate).

``trained_codebook`` trains on the deterministic md5-hash sample
``md5(vec_id) % _KM_SAMPLE_MOD == 0`` ONLY when the SAMPLE ITSELF holds
at least ``_KM_TRAIN_PER_CENTROID`` vectors per centroid (r15, ADVICE
r14 #1 — the r14 floor counted the corpus and strided on raw vec_id,
which biases on id-structured corpora and can starve the sample on
sparse ids); thinner samples train full (the measured-rationale comment
at ``_KM_SAMPLE_MOD`` records the recall collapse that unconditional
sampling caused on the 500-2000 vector test corpora). Every test SF
sits below the floor by design, so this file exercises the SAMPLED
branch on a purpose-built corpus — including the DuckDB mirror of the
one-predicate rule (``_km_src``), proving the sampled training stays
bit-exact across engines exactly like the full-corpus parity suite
does for the test SFs.
"""
import hashlib
import math

import duckdb
import pytest

from pyspark.sql import functions as F

from messdb_spark.queries.similarity import (_KM_ITERS, _KM_SAMPLE_MOD,
                                             _KM_SAMPLE_PRED_SPARK,
                                             _KM_SCALE,
                                             _KM_TRAIN_PER_CENTROID,
                                             _km_chain, _km_src,
                                             kmeans_fit, trained_codebook)

_K = 2
_FLOOR = _KM_TRAIN_PER_CENTROID * _K     # SAMPLE rows needed (512)
_DIM = 4


def _in_sample(i: int) -> bool:
    # the Python mirror of _KM_SAMPLE_PRED_SPARK/_DUCK: md5 of the
    # decimal id string, first 15 hex chars as int, mod _KM_SAMPLE_MOD
    h = hashlib.md5(str(i).encode()).hexdigest()[:15]
    return int(h, 16) % _KM_SAMPLE_MOD == 0


def _corpus_size_for(n_sampled: int) -> int:
    """Smallest corpus [0, n) whose md5-sample holds exactly
    ``n_sampled`` rows."""
    seen, i = 0, 0
    while seen < n_sampled:
        if _in_sample(i):
            seen += 1
        i += 1
    return i


def _vec(i: int) -> list[float]:
    # deterministic, irregular (no blob structure): full-corpus and
    # sample-trained centroids must genuinely differ
    return [((i * 2654435761 + j * 40503) % 997) / 997.0
            for j in range(_DIM)]


def _write_embeddings(spark, path: str, n: int) -> None:
    rows = [(i, _vec(i)) for i in range(n)]
    (spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
          .coalesce(1).write.mode("overwrite").parquet(path))


def _ints_of(book: list[tuple[int, list[float], float]]) -> list[list[int]]:
    # cemb = cv / _KM_SCALE exactly (one correctly-rounded divide per
    # coord), so scaling back recovers the integer centroids bit-exactly
    return [[round(x * _KM_SCALE) for x in cemb] for _cid, cemb, _n in book]


def _fit_ints(df, k: int) -> list[list[int]]:
    cents, _ = kmeans_fit(
        df.select("vec_id",
                  F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                   .alias("v")), k=k)
    return cents


def _oracle_ints(parquet_path: str) -> list[list[int]]:
    chain, final = _km_chain(_K, _KM_ITERS, _KM_SCALE, _DIM,
                             pfx="t_", src=_km_src(_K))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT vec_id, embedding "
                f"FROM read_parquet('{parquet_path}/*.parquet')")
    got = con.execute(
        f"WITH {chain} SELECT cl, cv FROM {final} ORDER BY cl").fetchall()
    return [list(cv) for _cl, cv in got]


@pytest.fixture()
def big_corpus(spark, tmp_path):
    p = str(tmp_path / "embeddings.parquet")
    # clears the sample floor by 32 sampled rows
    _write_embeddings(spark, p, _corpus_size_for(_FLOOR + 32))
    return str(tmp_path), p


def test_python_mirror_matches_spark_predicate(spark):
    """`_in_sample` (this file's hashlib mirror) is the same set as the
    engine predicate — the boundary constructions below depend on it."""
    ids = spark.range(0, 4096).select(F.col("id").alias("vec_id"))
    got = {r["vec_id"]
           for r in ids.filter(F.expr(_KM_SAMPLE_PRED_SPARK)).collect()}
    want = {i for i in range(4096) if _in_sample(i)}
    assert got == want


def test_sampled_branch_trains_on_the_hash_sample(spark, big_corpus):
    sf_dir, p = big_corpus
    book = trained_codebook(spark, sf_dir, _K)
    df = spark.read.parquet(p)
    sampled = _fit_ints(df.filter(F.expr(_KM_SAMPLE_PRED_SPARK)), _K)
    full = _fit_ints(df, _K)
    assert _ints_of(book) == sampled, \
        "above the floor, training must run on the md5-hash sample"
    assert sampled != full, \
        "test corpus degenerate: sample and full training coincide, " \
        "so the branch is not witnessed — change _vec()"
    for _cid, cemb, cnrm in book:
        s = 0.0
        for x in cemb:
            s += x * x
        assert cnrm == math.sqrt(s)


def test_small_corpus_trains_full(spark, tmp_path):
    p = str(tmp_path / "embeddings.parquet")
    _write_embeddings(spark, p, 200)              # sample far below floor
    book = trained_codebook(spark, str(tmp_path), _K)
    df = spark.read.parquet(p)
    assert _ints_of(book) == _fit_ints(df, _K), \
        "below the floor, the full corpus must train the codebook"


def test_exact_floor_boundary_samples(spark, tmp_path):
    """SAMPLE cardinality EXACTLY at the floor: Spark's
    ``n_sample >= floor`` and the oracle's ``sample_count < floor ⇒
    full`` must agree that the SAMPLE trains — an off-by-one here would
    silently fork the two engines' training relations at one corpus
    size. The floor is on the sampled frame itself (ADVICE r14 #1),
    so the corpus is sized to put exactly _FLOOR rows IN the sample."""
    p = str(tmp_path / "embeddings.parquet")
    n = _corpus_size_for(_FLOOR)
    _write_embeddings(spark, p, n)
    df = spark.read.parquet(p)
    assert df.filter(F.expr(_KM_SAMPLE_PRED_SPARK)).count() == _FLOOR
    book = trained_codebook(spark, str(tmp_path), _K)
    assert _ints_of(book) == _fit_ints(
        df.filter(F.expr(_KM_SAMPLE_PRED_SPARK)), _K)
    assert _oracle_ints(p) == _ints_of(book)


def test_one_below_floor_trains_full(spark, tmp_path):
    """One fewer SAMPLED row (same-magnitude corpus — the r14
    corpus-count floor could not distinguish these): both engines must
    fall back to full-corpus training."""
    p = str(tmp_path / "embeddings.parquet")
    n = _corpus_size_for(_FLOOR) - 1     # drops exactly the last
    assert _in_sample(n)                 # sampled id off the end
    _write_embeddings(spark, p, n)
    df = spark.read.parquet(p)
    assert df.filter(F.expr(_KM_SAMPLE_PRED_SPARK)).count() == _FLOOR - 1
    book = trained_codebook(spark, str(tmp_path), _K)
    assert _ints_of(book) == _fit_ints(df, _K)
    assert _oracle_ints(p) == _ints_of(book)


def test_balance_gate_warn_and_assert_modes(spark, monkeypatch):
    """ADVICE r13 #4: outside the synthetic-testdata contract the
    cell-balance gate warns instead of hard-failing on data-dependent
    skew; SPARK_GRAFT_IVF_BALANCE=assert restores the hard gate, and
    a missing file identity (bkey=None) never caches — the gate
    re-runs every call."""
    from messdb_spark.queries.similarity import (_BALANCE_CHECKED,
                                                 _check_cell_balance)

    # all rows in one cell of 16 → max ≫ 4× mean
    skewed = spark.createDataFrame([(i, 0) for i in range(32)],
                                   "vec_id bigint, cid bigint")
    monkeypatch.delenv("SPARK_GRAFT_IVF_BALANCE", raising=False)
    before = set(_BALANCE_CHECKED)
    # non-testdata corpus path → warn only, and bkey=None → no caching
    _check_cell_balance(skewed, None, "/data/prod/embeddings.parquet")
    assert set(_BALANCE_CHECKED) == before
    # the synthetic-testdata contract keeps the hard assert
    with pytest.raises(AssertionError, match="skewed"):
        _check_cell_balance(skewed, None,
                            "/root/testdata/sf9/embeddings.parquet")
    # explicit assert mode hard-fails anywhere
    monkeypatch.setenv("SPARK_GRAFT_IVF_BALANCE", "assert")
    with pytest.raises(AssertionError, match="skewed"):
        _check_cell_balance(skewed, None, "/data/prod/embeddings.parquet")
    # explicit warn mode downgrades even under /root/testdata
    monkeypatch.setenv("SPARK_GRAFT_IVF_BALANCE", "warn")
    _check_cell_balance(skewed, None,
                        "/root/testdata/sf9/embeddings.parquet")
    # a real file-identity key IS cached (once per codebook identity)
    monkeypatch.delenv("SPARK_GRAFT_IVF_BALANCE", raising=False)
    balanced = spark.createDataFrame(
        [(i, i % 16) for i in range(64)], "vec_id bigint, cid bigint")
    key = ("test-app", "/x/embeddings.parquet", 1, 2)
    _BALANCE_CHECKED.discard(key)
    _check_cell_balance(balanced, key, "/x/embeddings.parquet")
    assert key in _BALANCE_CHECKED
    _BALANCE_CHECKED.discard(key)


def test_duckdb_mirror_of_the_sampling_predicate(spark, big_corpus):
    """The oracle-side training relation (``_km_src``) applies the
    identical sample-or-full predicate, so the unrolled Lloyd chain
    lands on the same integer centroids as ``trained_codebook``."""
    sf_dir, p = big_corpus
    book = trained_codebook(spark, sf_dir, _K)
    assert _oracle_ints(p) == _ints_of(book)
