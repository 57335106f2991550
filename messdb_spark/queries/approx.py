"""Approximate-sketch surface: HyperLogLog++ distinct counts and
KLL/GK quantile sketches — the 100 TB substitutes for exact
countDistinct / percentile (mergeable, partial-aggregable, bounded
memory).

No ``oracle_sql`` on purpose: sketch outputs are algorithm-specific
(Spark HLL++ vs DuckDB's approx_count_distinct differ by design), so
the driver records the weaker rows-only check. The exact counterparts
(``distinct_stats_per_segment``, ``percentiles_by_segment``) are the
hash-checked versions of the same questions; pytest asserts the
sketches land within rel-error bounds of those exact answers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load


@query("approx_distinct_users_hll", oracle=None)
def approx_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct user/order counts per event type (rsd 2%)."""
    (e,) = load(spark, sf_dir, "events")
    return (e.groupBy("event_type")
             .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
                  F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events")))


@query("approx_price_quantiles", oracle=None)
def approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per segment (accuracy 10000 ≈ 0.01%).

    The sketch emits one ARRAY per group; posexplode flattens it to
    scalar ``(c_mktsegment, p, approx_value)`` rows so downstream
    consumers (and the driver's canonicalizer) see hashable columns."""
    c, o = load(spark, sf_dir, "customer", "orders")
    j = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    sk = (j.groupBy("c_mktsegment")
           .agg(F.expr("approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)")
                 .alias("qs")))
    return (sk.select("c_mktsegment",
                      F.posexplode("qs").alias("pos", "approx_value"))
              .select("c_mktsegment",
                      F.element_at(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
                                   F.col("pos") + 1).alias("p"),
                      "approx_value"))


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


_CM_W = 1024   # counters per hash row
_CM_D = 4      # hash rows


def countmin_counters(tokens, w: int = _CM_W, d: int = _CM_D):
    """Count-min sketch as a DataFrame: (seed, bucket) -> counter.
    d hash rows of w counters; mergeable by simple addition (counter
    tables from shards/partitions/days just union + re-sum), bounded
    memory d*w regardless of vocabulary — the sketch property that
    matters when the true vocab would blow the heavy-hitter agg.
    tokens: DataFrame with a ``token`` column."""
    rows = None
    for s in range(d):
        r = (tokens.select(F.lit(s).alias("seed"),
                           F.pmod(F.xxhash64("token", F.lit(s)), F.lit(w))
                            .alias("bucket")))
        rows = r if rows is None else rows.unionByName(r)
    return rows.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("counter"))


@query("countmin_heavy_hitters", oracle=None)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min estimate: build the d x w counter
    table over corpus tokens, then score each DISTINCT token by its
    sketch estimate (min over its d counters) — the bounded-memory
    path when exact token counting would shuffle an unbounded vocab.
    Overestimates only (collisions add, never subtract); pytest bounds
    the estimates against exact counts. No oracle by design: the
    estimate values depend on the hash family (rows-only check).

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
            "token",
            F.pmod(F.xxhash64("token", F.lit(s)), F.lit(_CM_W))
             .alias("bucket"))
        j = keyed.join(F.broadcast(side), "bucket").select("token", f"c{s}")
        est = j if est is None else est.join(j, "token")
    out = est.select("token",
                     F.least(*[F.col(f"c{s}") for s in range(_CM_D)])
                      .alias("est_count"))
    w = W.orderBy(F.col("est_count").desc(), F.col("token"))
    return (out.withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") <= 20)
               .select("token", "est_count", "rk"))
