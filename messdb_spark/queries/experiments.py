"""Experimentation analytics (A/B testing) — the analysis layer every
event pipeline ultimately feeds. Deterministic assignment (user_id
parity plays the hashed-assignment role), exact integer moments, and
shared final-expression templates so Spark and DuckDB evaluate the
SAME double arithmetic over the SAME exact integers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, query, quantize

_AB_SPLIT = "2024-01-16"   # pre-period / experiment-period boundary

# final scalar expressions over the wide one-row moments relation
# (identical text on both engines; {BIG} = the >64-bit integer type)
_AB_EXPRS = {
    # pooled CUPED theta = cov(pre, post) / var(pre), as an exact
    # integer ratio: (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
    "theta": ("CAST(CAST(n_all AS {BIG}) * s_xy_all "
              "- CAST(s_pre_all AS {BIG}) * s_post_all AS DOUBLE) "
              "/ CAST(CAST(n_all AS {BIG}) * s_pre2_all "
              "- CAST(s_pre_all AS {BIG}) * s_pre_all AS DOUBLE)"),
    "mu_pre": "CAST(s_pre_all AS DOUBLE) / n_all",
    "mean_post_a": "CAST(s_post_a AS DOUBLE) / n_a",
    "mean_post_b": "CAST(s_post_b AS DOUBLE) / n_b",
    "mean_pre_a": "CAST(s_pre_a AS DOUBLE) / n_a",
    "mean_pre_b": "CAST(s_pre_b AS DOUBLE) / n_b",
    "p_a": "CAST(conv_a AS DOUBLE) / n_a",
    "p_b": "CAST(conv_b AS DOUBLE) / n_b",
    "p_pool": "CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)",
    # pooled variances (biased /n form — consistent on both sides)
    "var_post": ("CAST(CAST(n_all AS {BIG}) * s_post2_all "
                 "- CAST(s_post_all AS {BIG}) * s_post_all AS DOUBLE) "
                 "/ (CAST(n_all AS DOUBLE) * n_all)"),
    "var_pre": ("CAST(CAST(n_all AS {BIG}) * s_pre2_all "
                "- CAST(s_pre_all AS {BIG}) * s_pre_all AS DOUBLE) "
                "/ (CAST(n_all AS DOUBLE) * n_all)"),
    "cov": ("CAST(CAST(n_all AS {BIG}) * s_xy_all "
            "- CAST(s_pre_all AS {BIG}) * s_post_all AS DOUBLE) "
            "/ (CAST(n_all AS DOUBLE) * n_all)"),
}


def _ab_final(BIG: str) -> dict[str, str]:
    e = {k: v.format(BIG=BIG) for k, v in _AB_EXPRS.items()}
    theta, mu = e["theta"], e["mu_pre"]
    ate_naive = f"({e['mean_post_a']}) - ({e['mean_post_b']})"
    adj_a = f"({e['mean_post_a']}) - ({theta}) * (({e['mean_pre_a']}) - ({mu}))"
    adj_b = f"({e['mean_post_b']}) - ({theta}) * (({e['mean_pre_b']}) - ({mu}))"
    var_adj = (f"({e['var_post']}) - 2.0 * ({theta}) * ({e['cov']}) "
               f"+ ({theta}) * ({theta}) * ({e['var_pre']})")
    se = (f"sqrt(({e['p_pool']}) * (1.0 - ({e['p_pool']})) "
          f"* (1.0 / n_a + 1.0 / n_b))")
    z = (f"CASE WHEN ({se}) = 0.0 THEN 0.0 "
         f"ELSE (({e['p_a']}) - ({e['p_b']})) / ({se}) END")
    q6 = "floor(({x}) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)"
    return {
        "n_a": "CAST(n_a AS BIGINT)",
        "n_b": "CAST(n_b AS BIGINT)",
        "ate_naive_cents": q6.format(x=ate_naive),
        "theta": q6.format(x=theta),
        "ate_cuped_cents": q6.format(x=f"({adj_a}) - ({adj_b})"),
        "var_reduction": q6.format(
            x=f"({var_adj}) / ({e['var_post']})"),
        "z_conversion": q6.format(x=z),
    }


_AB_MOMENTS_DUCK = f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts < TIMESTAMP '{_AB_SPLIT}'
                      THEN CAST(floor(coalesce(value, 0) * 100 + 0.5)
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
             CAST(sum(CASE WHEN event_type = 'purchase'
                       AND ts >= TIMESTAMP '{_AB_SPLIT}'
                      THEN CAST(floor(coalesce(value, 0) * 100 + 0.5)
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS post,
             max(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '{_AB_SPLIT}'
                  AND coalesce(value, 0) >= 100 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    wide AS (
      SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN arm = 0 THEN post ELSE 0 END) AS BIGINT) AS s_post_a,
        CAST(sum(CASE WHEN arm = 1 THEN post ELSE 0 END) AS BIGINT) AS s_post_b,
        CAST(sum(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS BIGINT) AS s_pre_a,
        CAST(sum(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS BIGINT) AS s_pre_b,
        CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b,
        count(*) AS n_all,
        CAST(sum(pre) AS BIGINT) AS s_pre_all,
        CAST(sum(post) AS BIGINT) AS s_post_all,
        CAST(sum(CAST(pre AS HUGEINT) * pre) AS HUGEINT) AS s_pre2_all,
        CAST(sum(CAST(post AS HUGEINT) * post) AS HUGEINT) AS s_post2_all,
        CAST(sum(CAST(pre AS HUGEINT) * post) AS HUGEINT) AS s_xy_all
      FROM u
    )
"""


@query(
    "abtest_cuped_analysis",
    oracle=_AB_MOMENTS_DUCK + "\n    SELECT "
    + ", ".join(f"{expr} AS {name}"
                for name, expr in _ab_final("HUGEINT").items())
    + "\n    FROM wide")
def abtest_cuped_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng et
    al. 2013): users split by deterministic assignment (id parity),
    pre-period spend as the covariate, experiment-period spend as the
    metric. Reports the naive ATE, the pooled CUPED theta and adjusted
    ATE, the achieved variance-reduction ratio, and a two-proportion
    z statistic on conversion — the complete experimentation readout.

    FP parity: every moment is an exact integer (cents, cents²,
    cross-products in >64-bit integers); the final scalar expressions
    are generated from ONE template for both engines, so the double
    arithmetic trees match operation-for-operation.

    Scale: one per-user reduction, one global moment row — the readout
    is O(1) after a single pass, which is why CUPED is standard at any
    traffic volume."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.floor(F.coalesce("value", F.lit(0.0)) * 100
                    + F.lit(0.5)).cast("long")
    is_pre = F.col("ts") < F.lit(_AB_SPLIT).cast("timestamp")
    is_purchase = F.col("event_type") == "purchase"
    u = (e.groupBy("user_id")
          .agg(F.sum(F.when(is_purchase & is_pre, cents).otherwise(0))
                .alias("pre"),
               F.sum(F.when(is_purchase & ~is_pre, cents).otherwise(0))
                .alias("post"),
               F.max(F.when(is_purchase & ~is_pre
                         & (F.coalesce("value", F.lit(0.0)) >= 100),
                         1).otherwise(0))
                .alias("conv"))
          .withColumn("arm", F.col("user_id") % 2))
    dec = "decimal(38,0)"
    wide = u.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("post")).otherwise(0))
         .alias("s_post_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("post")).otherwise(0))
         .alias("s_post_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("pre")).otherwise(0))
         .alias("s_pre_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("pre")).otherwise(0))
         .alias("s_pre_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
         .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
         .alias("conv_b"),
        F.count(F.lit(1)).alias("n_all"),
        F.sum("pre").alias("s_pre_all"),
        F.sum("post").alias("s_post_all"),
        F.sum((F.col("pre").cast(dec) * F.col("pre")).cast(dec))
         .alias("s_pre2_all"),
        F.sum((F.col("post").cast(dec) * F.col("post")).cast(dec))
         .alias("s_post2_all"),
        F.sum((F.col("pre").cast(dec) * F.col("post")).cast(dec))
         .alias("s_xy_all"))
    final = _ab_final("DECIMAL(38,0)")
    return wide.selectExpr(*[f"{expr} AS {name}"
                             for name, expr in final.items()])


_BOOT_B = 200          # bootstrap resamples
_BOOT_KLO = 5          # ceil(0.025 * B): 2.5th-percentile order stat
_BOOT_KHI = 196        # B - KLO + 1: 97.5th-percentile order stat

# Poisson(1) CDF thresholds (shortest-round-trip double literals —
# identical parses on both engines); the deterministic resample weight
# is the count of thresholds <= u
_POIS_CDF = ("0.36787944117144233", "0.7357588823428847",
             "0.9196986029286058", "0.9810118431238463",
             "0.9963401531726563", "0.9994058151824183",
             "0.999916758850712", "0.9999897508033253",
             "0.999998874797402")

# u in [0,1): a 52-bit value (double-exact) / 2^52
_BOOT_U = ("CAST({h} AS DOUBLE) / 4503599627370496.0")

# per-resample 52-bit remix constants (md5("boot_<b>")[:13]) — plan
# literals shared by both engines; one md5 per ROW, xor-remixed per
# resample (the minhash-seed discipline: hash once, remix cheaply)
import hashlib as _hashlib

_BOOT_KS = tuple(
    int(_hashlib.md5(f"boot_{b}".encode()).hexdigest()[:13], 16)
    for b in range(1, _BOOT_B + 1))


def _pois_w(u_expr: str) -> str:
    """Poisson(1) inverse CDF as a sum of comparisons (engine-shared
    text): w = |{{k : cdf_k <= u}}|."""
    return "(" + " + ".join(
        f"CASE WHEN {u_expr} >= {c} THEN 1 ELSE 0 END"
        for c in _POIS_CDF) + ")"


_BOOT_KS_DUCK = "[" + ", ".join(str(k) for k in _BOOT_KS) + "]"


@query(
    "bootstrap_ci_segment_spend",
    oracle=f"""
    WITH base AS (
      SELECT c.c_mktsegment AS segment,
             CAST(concat('0x', substring(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 13)) AS BIGINT) AS h0,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    reps AS (
      SELECT b, {_BOOT_KS_DUCK}[b] AS kb
      FROM (SELECT unnest(range(1, {_BOOT_B} + 1)) AS b)
    ),
    rep AS (
      SELECT segment, cents, b,
             {_pois_w(_BOOT_U.format(h="xor(h0, kb)"))} AS w
      FROM base CROSS JOIN reps
    ),
    boot AS (
      SELECT segment, b,
             CAST(sum(w * cents) AS DOUBLE) / sum(w) AS mean_b
      FROM rep GROUP BY segment, b HAVING sum(w) > 0
    ),
    ranked AS (
      SELECT segment, mean_b,
             row_number() OVER (PARTITION BY segment
                                ORDER BY mean_b, b) AS rn
      FROM boot
    ),
    pt AS (
      SELECT segment, count(*) AS n_orders,
             CAST(sum(cents) AS DOUBLE) / count(*) AS point
      FROM base GROUP BY segment
    )
    SELECT p.segment, p.n_orders,
           floor(p.point * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS point_mean_cents,
           floor(lo.mean_b * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS ci_lo_cents,
           floor(hi.mean_b * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS ci_hi_cents
    FROM pt p
    JOIN ranked lo ON lo.segment = p.segment AND lo.rn = {_BOOT_KLO}
    JOIN ranked hi ON hi.segment = p.segment AND hi.rn = {_BOOT_KHI}
    """)
def bootstrap_ci_segment_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap 95% CI for mean order value per market
    segment — the bootstrap that actually runs at scale (Chamandy et
    al., Google 2012, "Estimating Uncertainty for Massive Data
    Streams"): instead of materializing B resamples, each row draws an
    independent Poisson(1) replication count per resample, so the
    whole thing is ONE streaming pass with a (segment × B)-sized
    partial aggregation — no per-resample shuffles of the data.

    Determinism: the Poisson draw inverts the exact CDF at
    u = xor(h0, kb) / 2^52 where h0 = md5(orderkey)[:13 hex] is hashed
    ONCE per row and kb = md5("boot_b")[:13 hex] are the {_BOOT_B}
    plan-literal remix keys (`_BOOT_KS`) — the minhash-seed discipline
    (hash once, remix cheaply), so each resample costs one 64-bit xor
    instead of a fresh cryptographic hash. Both engines compute the
    identical 52-bit rational; resample means are exact BIGINT cent
    sums divided once. CI = order statistics {_BOOT_KLO} and
    {_BOOT_KHI} of the {_BOOT_B} resample means (percentile
    bootstrap), selected deterministically by (mean, b) rank.

    Scale: the replicated relation is B× the base rows but every
    replica is integer-only work (xor + 9 compares) inside one
    whole-stage-codegen pipeline, and it map-side combines into
    ≤ segments × B partials before any shuffle; at 100 TB you fold
    the weight draw into the first aggregation (no explode
    materialized) and the reduce side stays (groups × B)."""
    (o, c) = load(spark, sf_dir, "orders", "customer")
    base = (o.join(c, o["o_custkey"] == c["c_custkey"])
             .select(F.col("c_mktsegment").alias("segment"),
                     F.expr("CAST(conv(substring(md5(CAST(o_orderkey AS "
                            "STRING)), 1, 13), 16, 10) AS BIGINT)")
                      .alias("h0"),
                     F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                      .cast("long").alias("cents")))
    ks = F.lit(list(_BOOT_KS))   # one array Literal, not per-row CreateArray
    par = spark.sparkContext.defaultParallelism
    rep = (base.repartition(par)   # small-testdata artifact: the single
                                   # parquet row-group would pin the 200x
                                   # explode+agg pipeline to ONE task
               .select("segment", "cents", "h0",
                       F.posexplode(ks).alias("p", "kb"))
               .select("segment", "cents",
                       (F.col("p") + 1).alias("b"),
                       F.expr(_BOOT_U.format(h="h0 ^ kb")).alias("u")))
    rep = rep.withColumn("w", F.expr(_pois_w("u")))
    boot = (rep.groupBy("segment", "b")
               .agg(F.sum(F.col("w") * F.col("cents")).alias("sw"),
                    F.sum("w").alias("n"))
               .filter(F.col("n") > 0)
               .select("segment", "b",
                       (F.col("sw").cast("double") / F.col("n"))
                       .alias("mean_b")))
    from pyspark.sql.window import Window as W
    rn = F.row_number().over(
        W.partitionBy("segment").orderBy("mean_b", "b"))
    ranked = boot.withColumn("rn", rn)
    pt = (base.groupBy("segment")
              .agg(F.count(F.lit(1)).alias("n_orders"),
                   (F.sum("cents").cast("double")
                    / F.count(F.lit(1))).alias("point")))
    # both order statistics from ONE pass over the ranked resamples —
    # two separate rn filters would make Catalyst duplicate the whole
    # explode+aggregate subtree (2× the scan and hash work)
    ci = (ranked.filter(F.col("rn").isin(_BOOT_KLO, _BOOT_KHI))
                .groupBy("segment")
                .agg(F.max(F.when(F.col("rn") == _BOOT_KLO,
                                  F.col("mean_b"))).alias("lo"),
                     F.max(F.when(F.col("rn") == _BOOT_KHI,
                                  F.col("mean_b"))).alias("hi")))
    return (pt.join(ci, "segment")
              .select("segment", "n_orders",
                      quantize("point", 2).alias("point_mean_cents"),
                      quantize("lo", 2).alias("ci_lo_cents"),
                      quantize("hi", 2).alias("ci_hi_cents")))


@query(
    "propensity_strata_ate",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS arm,
             count(*) AS n_events,
             CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(coalesce(value, 0) * 100 + 0.5)
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS spend
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT *, ntile(5) OVER (ORDER BY n_events, user_id) AS stratum
      FROM u
    ),
    strata AS (
      SELECT stratum,
             count(*) AS n,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN arm = 0 THEN spend ELSE 0 END) AS BIGINT)
               AS s_a,
             CAST(sum(CASE WHEN arm = 1 THEN spend ELSE 0 END) AS BIGINT)
               AS s_b
      FROM ranked GROUP BY stratum
    )
    SELECT CAST(stratum AS BIGINT) AS stratum, n, n_a, n_b,
           floor((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS strata_ate_cents,
           floor(((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                  * n / (SELECT sum(n) FROM strata))
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS weighted_contribution_cents
    FROM strata
    """)
def propensity_strata_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified treatment-effect estimation (propensity-score
    subclassification, Rosenbaum & Rubin 1984): users are stratified
    into activity quintiles (the deterministic stand-in for a fitted
    propensity score — swap in model scores and nothing else changes),
    and the per-stratum arm contrast plus its size-weighted
    contribution estimate the ATE with confounding-by-activity
    removed — the observational complement to the randomized
    ``abtest_cuped_analysis``. Quintile assignment uses ntile with a
    total (n_events, user_id) order, so stratum boundaries are
    deterministic on both engines.

    Scale: one per-user reduction, one 5-row strata aggregate; the
    quintile window sorts the USER relation (1/events of the corpus) —
    at 100 TB you'd bucket on precomputed score deciles instead of a
    global ntile, the documented trade."""
    from pyspark.sql.window import Window as W

    (e,) = load(spark, sf_dir, "events")
    cents = F.floor(F.coalesce("value", F.lit(0.0)) * 100
                    + F.lit(0.5)).cast("long")
    u = (e.groupBy("user_id")
          .agg(F.count(F.lit(1)).alias("n_events"),
               F.sum(F.when(F.col("event_type") == "purchase", cents)
                      .otherwise(0)).cast("long").alias("spend"))
          .withColumn("arm", F.col("user_id") % 2))
    ranked = u.withColumn(
        "stratum", F.ntile(5).over(W.orderBy("n_events", "user_id")))
    strata = (ranked.groupBy("stratum")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
                   F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
                   F.sum(F.when(F.col("arm") == 0, F.col("spend"))
                          .otherwise(0)).cast("long").alias("s_a"),
                   F.sum(F.when(F.col("arm") == 1, F.col("spend"))
                          .otherwise(0)).cast("long").alias("s_b")))
    total_n = strata.agg(F.sum("n").alias("tn"))
    j = strata.crossJoin(F.broadcast(total_n))
    ate = (F.col("s_a").cast("double") / F.col("n_a")
           - F.col("s_b").cast("double") / F.col("n_b"))
    return j.select(
        F.col("stratum").cast("long").alias("stratum"), "n", "n_a", "n_b",
        quantize(ate, 2).alias("strata_ate_cents"),
        quantize(ate * F.col("n") / F.col("tn"), 2)
          .alias("weighted_contribution_cents"))
