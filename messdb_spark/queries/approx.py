"""Approximate-sketch surface: HyperLogLog++ distinct counts,
KLL/GK quantile sketches, and a count-min heavy-hitter table — the
100 TB substitutes for exact countDistinct / percentile / unbounded-
vocab counting (mergeable, partial-aggregable, bounded memory).

Oracle discipline: count-min carries a FULL value-hash oracle (its
md5-derived hash family is computable on both engines). HLL++ and
approx_percentile stay rows-only — their encodings are legitimately
Spark-specific — but each run SELF-CHECKS: the query body compares the
sketch against the exact answer and raises if any estimate leaves its
error bound, so even the driver's rows-only row carries teeth (the
``incremental_rollup_refresh`` in-body-assert pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load


def check_hll_bounds(rows, rel_tol: float) -> None:
    """Each row: (name, estimate, exact). Raises if any estimate sits
    outside rel_tol of exact — the bound check the driver's rows-only
    row would otherwise never exercise. rel_tol is generous vs the
    configured rsd (HLL++ rsd is a standard deviation, not a max)."""
    for name, est, exact in rows:
        if exact == 0:
            ok = est == 0
        else:
            ok = abs(est - exact) <= rel_tol * exact
        if not ok:
            raise AssertionError(
                f"HLL estimate out of bounds for {name}: "
                f"est={est} exact={exact} rel_tol={rel_tol}")


def check_quantile_bounds(rows) -> None:
    """Each row: (name, p, approx_value, lo, hi) where [lo, hi] are the
    exact quantiles at p∓rank_eps. A rank-error sketch must land its
    estimate inside that value bracket."""
    for name, p, approx, lo, hi in rows:
        if not (lo <= approx <= hi):
            raise AssertionError(
                f"quantile estimate out of bounds for {name} p={p}: "
                f"approx={approx} allowed=[{lo}, {hi}]")


@query(
    "approx_distinct_users_hll",
    oracle="""
    SELECT event_type, 'users' AS metric,
           count(DISTINCT user_id) AS exact_count,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    UNION ALL
    SELECT event_type, 'events' AS metric,
           count(DISTINCT event_id) AS exact_count,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    """)
def approx_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct user/event counts per event type (rsd 2%),
    reported as a DETERMINISTIC VERDICT RELATION so the nondeterministic
    sketch still gets a full value-hash oracle (verdict r5): each row is
    ``(event_type, metric, exact_count, within_bounds)`` where
    ``exact_count`` is the exact countDistinct (DuckDB-reproducible)
    and ``within_bounds`` asserts the HLL++ estimate within 5·rsd of
    it. The oracle expects ``TRUE`` on every row — an out-of-bounds
    estimate flips the boolean and fails the hash match, without
    pretending the sketch encoding itself is portable.

    Scale: the sketch is the 100 TB path (mergeable registers, no
    distinct shuffle); the exact side is the verdict's witness — at
    100 TB you'd compute it on a sample or skip it."""
    (e,) = load(spark, sf_dir, "events")
    sk = (e.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                F.approx_count_distinct("event_id", rsd=0.02)
                 .alias("approx_events")))
    exact = (e.groupBy("event_type")
              .agg(F.countDistinct("user_id").alias("u"),
                   F.countDistinct("event_id").alias("n")))
    j = sk.join(exact, "event_type")

    def bounds(est, ex):
        return F.when(F.col(ex) == 0, F.col(est) == 0) \
                .otherwise(F.abs(F.col(est) - F.col(ex))
                           <= 0.10 * F.col(ex))       # 5 × rsd

    users = j.select("event_type", F.lit("users").alias("metric"),
                     F.col("u").alias("exact_count"),
                     bounds("approx_users", "u").alias("within_bounds"))
    events = j.select("event_type", F.lit("events").alias("metric"),
                      F.col("n").alias("exact_count"),
                      bounds("approx_events", "n").alias("within_bounds"))
    return users.unionByName(events)


_APQ_PS = (50, 90, 99)     # percents; verdict bracket at ±1 percent rank


@query(
    "approx_price_quantiles",
    oracle=f"""
    WITH c AS (
      SELECT c_mktsegment AS seg,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    n AS (SELECT seg, count(*) AS n_rows FROM c GROUP BY seg),
    ranked AS (
      SELECT seg, cents,
             row_number() OVER (PARTITION BY seg ORDER BY cents) AS rn
      FROM c
    ),
    ps AS (SELECT unnest([{", ".join(map(str, _APQ_PS))}]) AS p),
    spec AS (
      SELECT n.seg, ps.p,
             n.n_rows * (ps.p - 1) // 100 + 1 AS lo_k,
             least(n.n_rows, n.n_rows * (ps.p + 1) // 100 + 1) AS hi_k
      FROM n, ps
    )
    SELECT spec.seg AS c_mktsegment, CAST(spec.p AS BIGINT) AS p,
           rl.cents AS lo_cents, rh.cents AS hi_cents,
           TRUE AS within_bounds
    FROM spec
    JOIN ranked rl ON rl.seg = spec.seg AND rl.rn = spec.lo_k
    JOIN ranked rh ON rh.seg = spec.seg AND rh.rn = spec.hi_k
    """)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per segment (accuracy 10000 ≈ 1e-4 rank
    error), reported as a DETERMINISTIC VERDICT RELATION (verdict r5):
    ``(c_mktsegment, p, lo_cents, hi_cents, within_bounds)`` where
    [lo, hi] is the EXACT integer-cents value bracket at ranks
    p∓1 percent (order statistics — portable, no interpolation) and
    ``within_bounds`` asserts the sketch estimate landed inside it
    (the rank-error contract of GK-family sketches). The oracle
    recomputes the exact brackets and expects TRUE everywhere, giving
    the nondeterministic sketch a full value-hash oracle without faking
    determinism of its encoding.

    Scale: the sketch is the bounded-memory 100 TB path. The exact
    bracket witness here uses a per-segment ranking window (few
    segments, verdict-only); at 100 TB the two-pass histogram of
    ``exact_percentile_grid`` computes the same order statistics with
    two scans and no full sort."""
    c, o = load(spark, sf_dir, "customer", "orders")
    j = (o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
          .select(F.col("c_mktsegment").alias("seg"),
                  F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("long").alias("cents")))
    nseg = j.groupBy("seg").agg(F.count(F.lit(1)).alias("n_rows"))
    ranked = j.withColumn("rn", F.row_number().over(
        W.partitionBy("seg").orderBy("cents")))
    ps = spark.createDataFrame([(p,) for p in _APQ_PS], "p long")
    spec = (nseg.crossJoin(F.broadcast(ps))
                .select("seg", "p",
                        (F.expr("n_rows * (p - 1) div 100") + 1)
                        .alias("lo_k"),
                        F.least(F.col("n_rows"),
                                F.expr("n_rows * (p + 1) div 100") + 1)
                        .alias("hi_k")))
    lo = (ranked.alias("r1")
                .join(F.broadcast(spec.alias("s1")),
                      (F.col("r1.seg") == F.col("s1.seg"))
                      & (F.col("r1.rn") == F.col("s1.lo_k")))
                .select(F.col("s1.seg").alias("seg"),
                        F.col("s1.p").alias("p"),
                        F.col("r1.cents").alias("lo_cents")))
    hi = (ranked.alias("r2")
                .join(F.broadcast(spec.alias("s2")),
                      (F.col("r2.seg") == F.col("s2.seg"))
                      & (F.col("r2.rn") == F.col("s2.hi_k")))
                .select(F.col("s2.seg").alias("seg2"),
                        F.col("s2.p").alias("p2"),
                        F.col("r2.cents").alias("hi_cents")))
    brackets = lo.join(hi, (lo["seg"] == hi["seg2"]) & (lo["p"] == hi["p2"]))
    ps_sql = ", ".join(f"{p / 100.0}D" for p in _APQ_PS)
    sk = (j.groupBy("seg")
           .agg(F.expr(f"approx_percentile(cents, array({ps_sql}), 10000)")
                 .alias("qs"))
           .select(F.col("seg").alias("seg_sk"),
                   F.posexplode("qs").alias("pos", "approx_cents"))
           .select("seg_sk",
                   F.element_at(F.array(*[F.lit(p) for p in _APQ_PS]),
                                F.col("pos") + 1).cast("long").alias("p_sk"),
                   "approx_cents"))
    return (brackets.join(sk, (brackets["seg"] == sk["seg_sk"])
                          & (brackets["p"] == sk["p_sk"]))
                    .select(F.col("seg").alias("c_mktsegment"), "p",
                            "lo_cents", "hi_cents",
                            ((F.col("lo_cents") <= F.col("approx_cents"))
                             & (F.col("approx_cents") <= F.col("hi_cents")))
                            .alias("within_bounds")))


@query(
    "salted_agg_event_stats",
    oracle=f"""
    SELECT event_type, count(*) AS n,
           floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total_value,
           max(value) AS max_value
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """)
def salted_agg_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage salted aggregation (operators/skew.py) as a
    first-class query: event_type is a classic hot-key column (a few
    types dominate). The salt spreads each hot key over n_salts
    reducers in stage 1; stage 2 combines <= n_salts partials per key.
    The oracle is the PLAIN group-by — salting must be semantically
    invisible. Decimal partials keep the re-aggregation exact, so the
    two-stage sum equals the one-stage sum bit-for-bit."""
    from ..operators.skew import salted_agg
    from . import quantize

    (e,) = load(spark, sf_dir, "events")
    e = e.filter(F.col("value").isNotNull())
    out = salted_agg(e, ["event_type"], {
        "n": ("sum", F.count(F.lit(1))),
        "total_dec": ("sum", F.sum(F.col("value").cast("decimal(18,2)"))),
        "max_value": ("max", F.max("value")),
    }, n_salts=8)
    return out.select("event_type", "n",
                      quantize(F.col("total_dec").cast("double"), 2)
                       .alias("total_value"),
                      "max_value")


@query(
    "skew_salted_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           floor((CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(18,2)))
                  AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe SALTED JOIN (operators/skew.py) as a first-class
    query: events.user_id is power-law-hot (~70 events per user here,
    arbitrarily worse at 100 TB), and the query joins it to customer
    with broadcast DISABLED in-body — the regime where a plain shuffle
    join puts every hot key on one reducer and AQE's skew split may
    not engage (it only splits partitions past a size threshold).
    ``salted_join`` spreads each hot key over 8 reducers by salting
    the big side and replicating the small side 8x. The oracle is the
    PLAIN join + group-by: salting must be semantically invisible —
    a lost or double-matched row breaks count, distinct AND sum.

    Scale: replicated-small-side shuffle volume is 8·|customer| rows —
    the knob trades that against per-reducer hot-key width; decimal
    sums keep the re-aggregation order-insensitive."""
    from ..operators.skew import salted_join
    from . import quantize

    (e, c) = load(spark, sf_dir, "events", "customer")
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        j = salted_join(
            e.select("event_id", "user_id", "value"),
            c.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
            keys=["user_id"], n_salts=8)
        out = (j.groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_events"),
                     F.countDistinct("user_id").alias("n_users"),
                     F.sum(F.coalesce(F.col("value"), F.lit(0.0))
                            .cast("decimal(18,2)")).alias("total_dec"))
                .select("c_mktsegment", "n_events", "n_users",
                        quantize(F.col("total_dec").cast("double"), 2)
                         .alias("total_value"))
                .localCheckpoint(eager=True))
    finally:
        spark.conf.set(key, prev)
    return out


_CM_W = 1024   # counters per hash row
_CM_D = 4      # hash rows

# The d-row hash family is md5-derived — the ONLY hash both engines
# evaluate identically — so the counter table (and therefore every
# estimate) is a pure deterministic function of the data, giving the
# sketch a FULL value-hash oracle instead of a rows-only check. Seed
# mixing is by prefixing: h_s(t) = int(md5("s:" || t)[0:15 hex]) mod w.


def _cm_bucket_spark(seed: int, w: int) -> F.Column:
    from ..functions.portable import md5_int60_spark
    return F.expr(md5_int60_spark(f"concat('{seed}:', token)") + f" % {w}")


def _cm_oracle(tokens_duck: str, w: int, d: int, k: int) -> str:
    from ..functions.portable import md5_int60_duck
    md5_duck = md5_int60_duck("concat(CAST(s.seed AS VARCHAR), ':', token)")
    seeds = ", ".join(str(s) for s in range(d))
    return f"""
    WITH toks AS (
      SELECT unnest({tokens_duck}) AS token
      FROM documents WHERE length(text) > 0
    ),
    hx AS (
      SELECT s.seed, token,
             {md5_duck} % {w} AS bucket
      FROM toks, (SELECT unnest([{seeds}]) AS seed) s
    ),
    counters AS (
      SELECT seed, bucket, count(*) AS counter FROM hx
      GROUP BY seed, bucket
    ),
    est AS (
      SELECT token, min(counter) AS est_count
      FROM (SELECT DISTINCT seed, token, bucket FROM hx) dt
      JOIN counters USING (seed, bucket)
      GROUP BY token
    )
    SELECT token, est_count, rk FROM (
      SELECT token, est_count,
             row_number() OVER (ORDER BY est_count DESC, token) AS rk
      FROM est) t
    WHERE rk <= {k}
    """


def countmin_counters(tokens, w: int = _CM_W, d: int = _CM_D):
    """Count-min sketch as a DataFrame: (seed, bucket) -> counter.
    d hash rows of w counters; mergeable by simple addition (counter
    tables from shards/partitions/days just union + re-sum), bounded
    memory d*w regardless of vocabulary — the sketch property that
    matters when the true vocab would blow the heavy-hitter agg.
    tokens: DataFrame with a ``token`` column."""
    rows = None
    for s in range(d):
        r = tokens.select(F.lit(s).alias("seed"),
                          _cm_bucket_spark(s, w).alias("bucket"))
        rows = r if rows is None else rows.unionByName(r)
    return rows.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("counter"))


from .text import _TOKENS_DUCK  # noqa: E402  (no cycle: text -> . only)


@query("countmin_heavy_hitters",
       oracle=_cm_oracle(_TOKENS_DUCK, _CM_W, _CM_D, 20))
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min estimate: build the d x w counter
    table over corpus tokens, then score each DISTINCT token by its
    sketch estimate (min over its d counters) — the bounded-memory
    path when exact token counting would shuffle an unbounded vocab.
    Overestimates only (collisions add, never subtract); pytest bounds
    the estimates against exact counts, and — because the hash family
    is md5-derived, computable on both engines — the driver checks the
    full counter-derived estimates by value hash.

    Scale: counters are d x w rows TOTAL (constant); the estimate join
    broadcasts them; distinct tokens stream through map-side."""
    from .text import _TOKENS

    (doc,) = load(spark, sf_dir, "documents")
    tokens = (doc.filter(F.length("text") > 0)
                 .select(F.explode(F.expr(_TOKENS)).alias("token")))
    counters = countmin_counters(tokens)
    distinct = tokens.distinct()
    est = None
    for s in range(_CM_D):
        side = (counters.filter(F.col("seed") == s)
                        .select("bucket",
                                F.col("counter").alias(f"c{s}")))
        keyed = distinct.select(
            "token", _cm_bucket_spark(s, _CM_W).alias("bucket"))
        j = keyed.join(F.broadcast(side), "bucket").select("token", f"c{s}")
        est = j if est is None else est.join(j, "token")
    out = est.select("token",
                     F.least(*[F.col(f"c{s}") for s in range(_CM_D)])
                      .alias("est_count"))
    w = W.orderBy(F.col("est_count").desc(), F.col("token"))
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= 20)
               .select("token", "est_count", "rk"))
