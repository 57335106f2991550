"""Deterministic cross-engine sketches — mergeable approximations whose
every bit is a pure function of the data, so they carry FULL value-hash
oracles (unlike the engine-native HLL++/GK sketches in approx.py, whose
encodings are legitimately Spark-specific and stay rows-only).

The trick is the count-min discipline (approx.py): build the hash family
from md5 — the one hash both engines evaluate identically — and keep all
arithmetic integer (shifts, div, mod) until a final IEEE-exact divide.

Reference provenance: the reference ships no sketches at all (SURVEY.md
§2.7 — zero built-in functions); these are north-star additions (§2.9)
for the 100 TB regime where exact distinct counts / quantiles would
shuffle unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize, quantize_sql
from ..functions.portable import (md5_int60_duck, md5_int60_spark,
                                  seeded_key_duck, seeded_key_spark)

# ---------------------------------------------------------------------------
# Deterministic HyperLogLog (md5 hash family, m = 256 buckets)
#
# H = 60-bit integer from the first 15 hex chars of md5(key-as-string);
# bucket = top 8 bits (H div 2^52), remainder = low 52 bits;
# rho = leading-zero count of the 52-bit remainder + 1 = 53 - floor_log2,
# computed portably as 53 - length(bin(rem)) (bin() is unpadded binary on
# both engines). Register table M[bucket] = max(rho) is mergeable by MAX
# — shards/days/partitions combine losslessly, the property that matters
# at 100 TB. Raw estimate alpha*m^2 / sum(2^-M) is evaluated with the
# 2^-M sum scaled to integers (sum of 1<<(53-M), max 256*2^53 = 2^61)
# and ONE double divide at the end: bit-equal on both engines.
# ---------------------------------------------------------------------------

_HLL_M = 256                       # buckets (rsd = 1.04/sqrt(m) = 6.5%)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
_HLL_C = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << 53)   # alpha*m^2*2^53
_POW52 = 1 << 52


@query(
    "hll_md5_distinct_orders",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             {md5_int60_duck("CAST(l_orderkey AS VARCHAR)")} AS hv
      FROM lineitem
    ),
    reg AS (
      SELECT l_returnflag, hv // {_POW52} AS bucket,
             max(CASE WHEN hv % {_POW52} = 0 THEN 53
                 ELSE 53 - length(bin(hv % {_POW52})) END) AS rho
      FROM h GROUP BY l_returnflag, hv // {_POW52}
    ),
    agg AS (
      SELECT l_returnflag,
             count(*) AS n_buckets_hit,
             max(rho) AS max_rho,
             sum(CAST(1 AS BIGINT) << (53 - rho)) AS s_obs
      FROM reg GROUP BY l_returnflag
    ),
    ex AS (
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT a.l_returnflag, a.n_buckets_hit,
           CAST(a.max_rho AS BIGINT) AS max_rho,
           CAST(floor({_HLL_C!r} / (CAST(a.s_obs AS DOUBLE)
             + CAST(({_HLL_M} - a.n_buckets_hit) AS DOUBLE)
               * {float(1 << 53)!r})) AS BIGINT) AS raw_est,
           ex.exact_distinct,
           {quantize_sql(
               f"100.0 * (CAST(floor({_HLL_C!r} / (CAST(a.s_obs AS DOUBLE)"
               f" + CAST(({_HLL_M} - a.n_buckets_hit) AS DOUBLE)"
               f" * {float(1 << 53)!r})) AS BIGINT) - ex.exact_distinct)"
               " / ex.exact_distinct", 3)} AS err_pct
    FROM agg a JOIN ex USING (l_returnflag)
    """)
def hll_md5_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HLL distinct-orderkey count per returnflag.

    The register table (bucket -> max rho) is what a 1000-executor run
    would actually ship: 256 rows per group regardless of cardinality,
    combinable by MAX at every level (partial agg does this for free via
    groupBy().agg(max)). The exact countDistinct runs alongside only to
    (a) feed the oracle's parity columns and (b) power the in-body error
    assertion — at 100 TB you would drop it and trust the rsd bound.

    SELF-CHECKING: raw estimate asserted within 4*rsd of exact."""
    (li,) = load(spark, sf_dir, "lineitem")
    hv = F.expr(md5_int60_spark("CAST(l_orderkey AS STRING)"))
    h = li.select("l_returnflag", hv.alias("hv"))
    rem = F.col("hv") % F.lit(_POW52)
    rho = F.when(rem == 0, F.lit(53)) \
           .otherwise(F.lit(53) - F.length(F.bin(rem)))
    reg = (h.select("l_returnflag",
                    F.expr(f"hv div {_POW52}").alias("bucket"),
                    rho.alias("rho"))
            .groupBy("l_returnflag", "bucket")
            .agg(F.max("rho").alias("rho")))
    agg = (reg.groupBy("l_returnflag")
              .agg(F.count(F.lit(1)).alias("n_buckets_hit"),
                   F.max("rho").cast("bigint").alias("max_rho"),
                   F.sum(F.expr(
                       "shiftleft(CAST(1 AS BIGINT), 53 - rho)"))
                    .alias("s_obs")))
    denom = (F.col("s_obs").cast("double")
             + (F.lit(_HLL_M) - F.col("n_buckets_hit")).cast("double")
             * F.lit(float(1 << 53)))
    est = F.floor(F.lit(_HLL_C) / denom).cast("bigint")
    ex = (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("exact_distinct")))
    out = (agg.join(ex, "l_returnflag")
              .select("l_returnflag", "n_buckets_hit", "max_rho",
                      est.alias("raw_est"), "exact_distinct",
                      quantize(100.0 * (est - F.col("exact_distinct"))
                               / F.col("exact_distinct"), 3)
                      .alias("err_pct"))
              .localCheckpoint(eager=True))
    for r in out.collect():
        tol = 4 * 1.04 / (_HLL_M ** 0.5)   # 4*rsd = 26%
        if abs(r["raw_est"] - r["exact_distinct"]) > tol * r["exact_distinct"]:
            raise AssertionError(
                f"HLL-md5 estimate out of bounds for {r['l_returnflag']}: "
                f"est={r['raw_est']} exact={r['exact_distinct']}")
    # mergeability proof (the property that matters at 100 TB): the
    # register tables of two disjoint shards, combined by MAX, must be
    # bit-identical to the single-pass register table.
    sharded = (li.select("l_returnflag",
                         (F.col("l_orderkey") % 2).alias("shard"),
                         hv.alias("hv"))
                 .select("l_returnflag", "shard",
                         F.expr(f"hv div {_POW52}").alias("bucket"),
                         rho.alias("rho"))
                 .groupBy("l_returnflag", "shard", "bucket")
                 .agg(F.max("rho").alias("rho")))
    merged = (sharded.groupBy("l_returnflag", "bucket")
                     .agg(F.max("rho").alias("rho")))
    if merged.exceptAll(reg).count() != 0 or merged.count() != reg.count():
        raise AssertionError("sharded HLL registers do not merge to the "
                             "single-pass register table")
    return out


# ---------------------------------------------------------------------------
# Deterministic log-histogram quantile sketch (DDSketch-flavoured)
#
# Values -> integer cents -> power-of-two bucket with 4 sub-bits:
# sub_raw = cents >> (floor_log2(cents) - 4) is in [16, 31]; bucket id
# k*32 + sub_raw is unique and ORDER-PRESERVING; the bucket's lower
# bound sub_raw << (k-4) is the reported quantile value. Guaranteed
# relative error <= 1/16 (bucket width / lower bound), memory bounded by
# #buckets (~32 per power of two), mergeable by adding counts.
# ---------------------------------------------------------------------------

_DDS_PS = (0.5, 0.9, 0.99)


@query(
    "ddsketch_price_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM orders
    ),
    bkt AS (
      SELECT o_orderpriority,
             CASE WHEN c < 32 THEN c
                  ELSE c >> (length(bin(c)) - 5) END AS sub_raw,
             CASE WHEN c < 32 THEN 0
                  ELSE length(bin(c)) - 5 END AS shift
      FROM cents
    ),
    hist AS (
      SELECT o_orderpriority, shift, sub_raw,
             sub_raw << shift AS lb, count(*) AS cnt
      FROM bkt GROUP BY o_orderpriority, shift, sub_raw
    ),
    cum AS (
      SELECT o_orderpriority, lb, cnt,
             sum(cnt) OVER (PARTITION BY o_orderpriority
                            ORDER BY shift, sub_raw) AS cum,
             sum(cnt) OVER (PARTITION BY o_orderpriority) AS n
      FROM hist
    ),
    hit AS (
      SELECT c.o_orderpriority, p.p, c.lb, c.cum, c.cnt, c.n,
             CAST(ceil(p.p * CAST(c.n AS DOUBLE)) AS BIGINT) AS rk
      FROM cum c, (SELECT unnest([{", ".join(
          f"CAST({p} AS DOUBLE)" for p in _DDS_PS)}]) AS p) p
    )
    SELECT o_orderpriority, p,
           {quantize_sql("CAST(lb AS DOUBLE) / 100.0", 2)} AS approx_value,
           CAST(n AS BIGINT) AS n_rows
    FROM hit
    WHERE cum >= rk AND cum - cnt < rk
    """)
def ddsketch_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of o_totalprice per priority from a deterministic
    log-histogram: ~32 buckets per power of two, counts mergeable by
    addition (partial agg combines shards for free), answer = bucket
    lower bound => guaranteed <= 6.25% relative error with NO float in
    the bucketing path — so, unlike GK/KLL, both engines build the
    byte-identical sketch and the driver hash-checks every estimate.

    Scale: the histogram is vocab-bounded (#priorities x ~600 buckets)
    regardless of row count; the window runs over that tiny table.

    SELF-CHECKING: each estimate asserted against the exact rank
    bracket [q * 16/17, q] (lower-bound reporting bias included)."""
    (o,) = load(spark, sf_dir, "orders")
    c = F.col("c")
    cents = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
         .alias("c"))
    shift = F.when(c < 32, F.lit(0)) \
             .otherwise(F.length(F.bin(c)) - 5).cast("int")
    sub_raw = F.when(c < 32, c).otherwise(
        F.expr("shiftright(c, length(bin(c)) - 5)"))
    hist = (cents.select("o_orderpriority", shift.alias("shift"),
                         sub_raw.alias("sub_raw"))
                 .groupBy("o_orderpriority", "shift", "sub_raw")
                 .agg(F.count(F.lit(1)).alias("cnt"))
                 .withColumn("lb", F.expr("shiftleft(sub_raw, shift)")))
    wcum = (W.partitionBy("o_orderpriority")
             .orderBy("shift", "sub_raw")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    wn = W.partitionBy("o_orderpriority")
    cum = (hist.withColumn("cum", F.sum("cnt").over(wcum))
               .withColumn("n", F.sum("cnt").over(wn)))
    ps = spark.createDataFrame([(p,) for p in _DDS_PS], "p double")
    hit = cum.crossJoin(F.broadcast(ps)).withColumn(
        "rk", F.ceil(F.col("p") * F.col("n").cast("double")).cast("bigint"))
    out = (hit.filter((F.col("cum") >= F.col("rk"))
                      & (F.col("cum") - F.col("cnt") < F.col("rk")))
              .select("o_orderpriority", "p",
                      quantize(F.col("lb").cast("double") / 100.0, 2)
                      .alias("approx_value"),
                      F.col("n").alias("n_rows"))
              .localCheckpoint(eager=True))
    exact_df = o.groupBy("o_orderpriority").agg(*[
        F.expr(f"percentile_disc({p}) WITHIN GROUP "
               "(ORDER BY o_totalprice)").alias(f"q{i}")
        for i, p in enumerate(_DDS_PS)])
    exact = {}
    for r in exact_df.collect():
        for i, p in enumerate(_DDS_PS):
            exact[(r["o_orderpriority"], p)] = r[f"q{i}"]
    for r in out.collect():
        q = exact[(r["o_orderpriority"], r["p"])]
        est = r["approx_value"]
        if not (q * 16.0 / 17.0 - 0.02 <= est <= q + 0.02):
            raise AssertionError(
                f"ddsketch estimate out of bracket for "
                f"{r['o_orderpriority']} p={r['p']}: est={est} exact={q}")
    return out


# ---------------------------------------------------------------------------
# Bloom-filter prefilter join (explicit runtime filter)
#
# Spark's own bloom runtime filters (bloom_filter_agg/might_contain) are
# not registered for SQL use in this build, and their bit layout would
# be engine-specific anyway. This is the same idea as a first-class,
# fully deterministic operator: the build side's keys hash (md5 family,
# k seeds) into an m-bit filter packed 32 bits per BIGINT word — a
# vocab-bounded table of m/32 rows that broadcast-joins against the
# probe side. At 100 TB this is THE pattern for joining a huge fact
# table against a selective dim subset without shuffling the fact:
# ship ~KBs of filter, drop non-matching fact rows at the scan.
# ---------------------------------------------------------------------------

_BF_M = 1 << 16    # minimum filter bits (floor for tiny build sides)
_BF_K = 4          # hash functions
_BF_BITS_PER_KEY = 16   # m >= 16n => FPR ~ (1-e^-k/16)^k ~ 0.24% at k=4

# The filter SIZES ITSELF from the build-side cardinality: m = the next
# power of two >= 16 * n_build (computed identically in the oracle via
# 1 << length(bin(16n-1))). A fixed m is a scale bug — at 10x the build
# keys a 64 Kbit filter saturates to ~40% FPR, which the in-body FPR
# assert caught at sf0.1.


def _bf_m(n_build: int) -> int:
    return max(_BF_M, 1 << (_BF_BITS_PER_KEY * n_build - 1).bit_length())


def _bf_pos_spark(key_expr: str, seed: str, m: int = _BF_M) -> str:
    return (md5_int60_spark(seeded_key_spark(seed, key_expr))
            + f" % {m}")


def _bf_pos_duck(key_expr: str, seed: str) -> str:
    return (md5_int60_duck(seeded_key_duck(seed, key_expr))
            + " % (SELECT m FROM msel)")


@query(
    "bloom_prefilter_join",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    msel AS (
      SELECT greatest({_BF_M}, 1 << length(bin(
        {_BF_BITS_PER_KEY} * count(*) - 1))) AS m FROM build
    ),
    probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    seeds AS (SELECT unnest([{", ".join(str(s) for s in range(_BF_K))}])
              AS s),
    bpos AS (
      SELECT DISTINCT {_bf_pos_duck('b.k', 's.s')} AS pos
      FROM build b, seeds s
    ),
    words AS (
      SELECT pos >> 5 AS word,
             CAST(bit_or(CAST(1 AS BIGINT) << (pos & 31)) AS BIGINT) AS wv
      FROM bpos GROUP BY pos >> 5
    ),
    ppos AS (
      SELECT p.k, {_bf_pos_duck('p.k', 's.s')} AS pos
      FROM probe p, seeds s
    ),
    hits AS (
      SELECT pp.k,
             min(CASE WHEN w.wv IS NOT NULL
                      AND ((w.wv >> (pp.pos & 31)) & 1) = 1
                 THEN 1 ELSE 0 END) AS all_hit
      FROM ppos pp LEFT JOIN words w ON (pp.pos >> 5) = w.word
      GROUP BY pp.k
    ),
    cand AS (SELECT k FROM hits WHERE all_hit = 1),
    stats AS (
      SELECT (SELECT count(*) FROM probe) AS n_probe,
             (SELECT count(*) FROM cand) AS n_candidates,
             (SELECT count(*) FROM cand JOIN build USING (k)) AS n_matched,
             (SELECT count(*) FROM lineitem
              WHERE l_orderkey IN (SELECT k FROM build))
               AS n_fact_rows_matched
    )
    SELECT CAST(n_probe AS BIGINT) AS n_probe,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(n_candidates - n_matched AS BIGINT) AS n_false_pos,
           {quantize_sql(
               "100.0 * (n_candidates - n_matched) "
               "/ greatest(n_probe - n_matched, 1)", 4)} AS fp_rate_pct,
           CAST(n_fact_rows_matched AS BIGINT) AS n_fact_rows_matched
    FROM stats
    """)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom runtime filter: urgent orders' keys build a
    4-hash md5-family filter SIZED FROM THE BUILD CARDINALITY (next
    power of two >= 16 bits/key, so the FPR stays ~0.24% at any scale
    factor — a fixed m saturates at 10x the keys); distinct lineitem
    orderkeys probe it through ONE broadcast left join (all k positions
    union into the same join), and candidates verify exactly.

    Deterministic end to end, so the driver hash-checks the filter's
    exact false-positive count — and the in-body assert pins the no-
    false-negative guarantee (every true match must pass the filter).

    Scale: filter build shuffles only distinct build keys; the word
    table is ≤ 2048 rows broadcast everywhere; the fact table never
    shuffles for the prefilter (map-side join + local agg)."""
    o, li = load(spark, sf_dir, "orders", "lineitem")
    build = (o.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_orderkey").alias("k")).distinct()
              .localCheckpoint(eager=True))   # scanned 3x below
    probe = li.select(F.col("l_orderkey").alias("k")).distinct()
    m = _bf_m(build.count())   # self-sized: bounded driver scalar

    def positions(df):
        parts = [df.select("k", F.expr(_bf_pos_spark("k", str(s), m))
                           .alias("pos")) for s in range(_BF_K)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    words = (positions(build).select("pos").distinct()
             .groupBy(F.expr("shiftright(pos, 5)").alias("word"))
             .agg(F.expr(
                 "bit_or(shiftleft(CAST(1 AS BIGINT), "
                 "CAST(pos % 32 AS INT)))").alias("wv")))
    hits = (positions(probe)
            .join(F.broadcast(words),
                  F.expr("shiftright(pos, 5)") == F.col("word"), "left")
            .groupBy("k")
            .agg(F.min(F.when(
                F.col("wv").isNotNull()
                & (F.expr("(shiftright(wv, CAST(pos % 32 AS INT)) & 1)")
                   == 1), 1).otherwise(0)).alias("all_hit")))
    # one agg computes every stat: each probe key carries its bloom
    # verdict (all_hit) and its exact membership (in_build), so
    # candidates / matches / true-matches come from a single job
    # instead of four separate count() actions.
    flags = (hits.join(build.withColumn("in_build", F.lit(1)), "k", "left")
                 .agg(F.count(F.lit(1)).alias("n_probe"),
                      F.sum("all_hit").alias("n_candidates"),
                      F.sum(F.when((F.col("all_hit") == 1)
                                   & F.col("in_build").isNotNull(), 1)
                             .otherwise(0)).alias("n_matched"),
                      F.sum(F.coalesce("in_build", F.lit(0)))
                       .alias("n_true")).collect()[0])
    n_probe, n_candidates = flags["n_probe"], flags["n_candidates"]
    n_matched, n_true = flags["n_matched"], flags["n_true"]
    n_fact = li.join(build, li["l_orderkey"] == build["k"], "semi").count()
    if n_matched != n_true:
        raise AssertionError(
            f"bloom false negative: matched {n_matched} != true {n_true}")
    fp = n_candidates - n_matched
    if fp > 0.01 * max(n_probe - n_matched, 1) + 10:
        raise AssertionError(f"bloom FPR blowout: {fp}/{n_probe}")
    return spark.createDataFrame(
        [(n_probe, n_candidates, n_matched, fp,
          float(n_fact))], ["n_probe", "n_candidates", "n_matched",
                            "n_false_pos", "n_fact_rows_matched_raw"]) \
        .select("n_probe", "n_candidates", "n_matched", "n_false_pos",
                quantize(100.0 * F.col("n_false_pos")
                         / F.greatest(F.col("n_probe") - F.col("n_matched"),
                                      F.lit(1)), 4).alias("fp_rate_pct"),
                F.col("n_fact_rows_matched_raw").cast("bigint")
                 .alias("n_fact_rows_matched"))


def _hll_est_duck(agg_alias: str) -> str:
    """DuckDB estimate expression over an (n_buckets_hit, s_obs) agg."""
    return (f"CAST(floor({_HLL_C!r} / (CAST({agg_alias}.s_obs AS DOUBLE)"
            f" + CAST(({_HLL_M} - {agg_alias}.n_buckets_hit) AS DOUBLE)"
            f" * {float(1 << 53)!r})) AS BIGINT)")


@query(
    "hll_set_ops_orders",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             CASE WHEN l_quantity > 25 THEN 'a' ELSE 'b' END AS side,
             {md5_int60_duck("CAST(l_orderkey AS VARCHAR)")} AS hv,
             l_orderkey
      FROM lineitem WHERE l_quantity > 25 OR l_discount > 0.05
    ),
    reg AS (
      SELECT side, hv // {_POW52} AS bucket,
             max(CASE WHEN hv % {_POW52} = 0 THEN 53
                 ELSE 53 - length(bin(hv % {_POW52})) END) AS rho
      FROM h GROUP BY side, hv // {_POW52}
    ),
    rega AS (SELECT bucket, rho FROM reg WHERE side = 'a'),
    regb AS (SELECT bucket, rho FROM reg WHERE side = 'b'),
    regu AS (
      SELECT bucket, max(rho) AS rho
      FROM (SELECT * FROM rega UNION ALL SELECT * FROM regb)
      GROUP BY bucket
    ),
    aa AS (SELECT count(*) AS n_buckets_hit,
                  sum(CAST(1 AS BIGINT) << (53 - rho)) AS s_obs FROM rega),
    ab AS (SELECT count(*) AS n_buckets_hit,
                  sum(CAST(1 AS BIGINT) << (53 - rho)) AS s_obs FROM regb),
    au AS (SELECT count(*) AS n_buckets_hit,
                  sum(CAST(1 AS BIGINT) << (53 - rho)) AS s_obs FROM regu),
    ex AS (
      SELECT CAST(count(DISTINCT CASE WHEN side = 'a'
                                      THEN l_orderkey END) AS BIGINT)
               AS exact_a,
             CAST(count(DISTINCT CASE WHEN side = 'b'
                                      THEN l_orderkey END) AS BIGINT)
               AS exact_b,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_union
      FROM h
    )
    SELECT {_hll_est_duck('aa')} AS est_a,
           {_hll_est_duck('ab')} AS est_b,
           {_hll_est_duck('au')} AS est_union,
           CAST({_hll_est_duck('aa')} + {_hll_est_duck('ab')}
                - {_hll_est_duck('au')} AS BIGINT) AS est_intersection,
           ex.exact_a, ex.exact_b, ex.exact_union,
           CAST(ex.exact_a + ex.exact_b - ex.exact_union AS BIGINT)
             AS exact_intersection
    FROM aa, ab, au, ex
    """)
def hll_set_ops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA on the deterministic md5 registers: two order
    cohorts (a = any line with quantity > 25; b = the rest of the
    orders with discount > 0.05), estimate |a|, |b|, |a∪b| (max-merged
    registers — the only exact operation in HLL algebra) and |a∩b| by
    inclusion–exclusion — the audience-overlap computation systems run
    on sketches precisely because the raw ID sets are too big to
    intersect. Every register bit and every estimate is a pure
    function of the data (md5 family + integer shifts + one IEEE
    divide), so the driver hash-checks the whole algebra, exact
    counterparts alongside.

    100 TB: per-cohort register tables are 256 rows each forever; the
    union is a 512-row max-merge; the exact columns exist only for the
    oracle's parity and the in-body sanity bound (union estimate
    within 4·rsd of exact). Inclusion–exclusion inherits ~√2·rsd of
    the larger set — intersections much smaller than either side drown
    in sketch noise, the textbook caveat (documented, not asserted).
    Cardinalities here sit above the 2.5·m linear-counting knee, the
    regime where the raw estimator is valid; below it a production
    implementation switches to linear counting, whose ln() is NOT
    cross-engine bit-stable — which is exactly why this query pins the
    raw-regime algebra instead."""
    (li,) = load(spark, sf_dir, "lineitem")
    h = (li.filter((F.col("l_quantity") > 25) | (F.col("l_discount") > 0.05))
           .select(F.when(F.col("l_quantity") > 25, "a").otherwise("b")
                    .alias("side"),
                   F.expr(md5_int60_spark("CAST(l_orderkey AS STRING)"))
                    .alias("hv"), "l_orderkey")
           .distinct())
    rem = F.col("hv") % F.lit(_POW52)
    rho = F.when(rem == 0, F.lit(53)) \
           .otherwise(F.lit(53) - F.length(F.bin(rem)))
    reg = (h.select("side", F.expr(f"hv div {_POW52}").alias("bucket"),
                    rho.alias("rho"))
            .groupBy("side", "bucket")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True))

    def est_of(reg_df):
        a = reg_df.agg(
            F.count(F.lit(1)).alias("n_buckets_hit"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)"))
             .alias("s_obs")).first()
        denom = (float(a["s_obs"])
                 + (_HLL_M - a["n_buckets_hit"]) * float(1 << 53))
        import math
        return int(math.floor(_HLL_C / denom))

    rega = reg.filter(F.col("side") == "a").select("bucket", "rho")
    regb = reg.filter(F.col("side") == "b").select("bucket", "rho")
    regu = (rega.unionAll(regb).groupBy("bucket")
                .agg(F.max("rho").alias("rho")))
    est_a, est_b, est_u = est_of(rega), est_of(regb), est_of(regu)
    ex = h.agg(
        F.countDistinct(F.when(F.col("side") == "a", F.col("l_orderkey")))
         .alias("exact_a"),
        F.countDistinct(F.when(F.col("side") == "b", F.col("l_orderkey")))
         .alias("exact_b"),
        F.countDistinct("l_orderkey").alias("exact_union")).first()
    tol = 4 * 1.04 / (_HLL_M ** 0.5)
    if abs(est_u - ex["exact_union"]) > tol * ex["exact_union"]:
        raise AssertionError(
            f"HLL union estimate out of bounds: est={est_u} "
            f"exact={ex['exact_union']}")
    return spark.createDataFrame(
        [(est_a, est_b, est_u, est_a + est_b - est_u,
          ex["exact_a"], ex["exact_b"], ex["exact_union"],
          ex["exact_a"] + ex["exact_b"] - ex["exact_union"])],
        "est_a long, est_b long, est_union long, est_intersection long, "
        "exact_a long, exact_b long, exact_union long, "
        "exact_intersection long")
