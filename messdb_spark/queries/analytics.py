"""Analytics parity set (SURVEY.md §2.8): joins, aggregations, windows,
set ops, top-k — absent in the reference, provided as built-in Spark
capability per the north star. All DataFrame-API (Catalyst plans:
broadcast joins for dims, partial aggregation, pushed filters).

FP-parity discipline: the testdata money columns are exact 2-decimal
values stored as double, so money aggregates go through DECIMAL
arithmetic (exact, engine-independent) and cast to double at the end;
averages are computed as exact-sum / count so both engines perform one
identical double division. See tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize

D = "DECIMAL(18,2)"


def _dec(col: str) -> F.Column:
    return F.col(col).cast(D)


def _dsum(expr: F.Column, alias: str, nd: int = 2) -> F.Column:
    """Exact decimal sum → double → quantize: identical in Spark/DuckDB."""
    return quantize(F.sum(expr).cast("double"), nd).alias(alias)


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           floor((CAST(sum(CAST(l_quantity AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS sum_qty,
           floor((CAST(sum(CAST(l_extendedprice AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS sum_base_price,
           floor((CAST(sum(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D}))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS sum_disc_price,
           floor((CAST(sum(CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D})) * (1 + CAST(l_tax AS {D}))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS sum_charge,
           floor((CAST(sum(CAST(l_quantity AS {D})) AS DOUBLE) / count(*)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS avg_qty,
           floor((CAST(sum(CAST(l_extendedprice AS {D})) AS DOUBLE) / count(*)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS avg_price,
           floor((CAST(sum(CAST(l_discount AS {D})) AS DOUBLE) / count(*)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single scan + hash agg; filter + the needed
    columns push to the parquet scan; partial agg before the (tiny,
    6-group) shuffle — the canonical 100 TB-safe plan."""
    (li,) = load(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    n = F.count(F.lit(1))
    return (li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(_dsum(_dec("l_quantity"), "sum_qty"),
                   _dsum(_dec("l_extendedprice"), "sum_base_price"),
                   _dsum(disc_price, "sum_disc_price"),
                   _dsum(disc_price * (1 + _dec("l_tax")), "sum_charge"),
                   quantize(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
                   quantize(F.sum(_dec("l_extendedprice")).cast("double") / n, 6).alias("avg_price"),
                   quantize(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
                   n.alias("count_order")))


_REV = f"CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D}))"


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, floor((CAST(sum({_REV}) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue, o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY sum({_REV}) DESC, l_orderkey
    LIMIT 10
    """)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim-filtered customer broadcast into orders,
    join to lineitem on the fact key, agg, top-10 (exact decimal rank
    key + unique orderkey tiebreaker → deterministic selection;
    TakeOrderedAndProject — no global sort materialized)."""
    c, o, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    cust = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    j = (o.filter(F.col("o_orderdate") < cutoff)
          .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
          .join(li.filter(F.col("l_shipdate") > cutoff),
                F.col("o_orderkey") == F.col("l_orderkey")))
    rev = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (j.groupBy("l_orderkey", "o_orderdate")
             .agg(rev.alias("_rev"))
             .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
             .limit(10)
             .select("l_orderkey", quantize(F.col("_rev").cast("double"), 2).alias("revenue"),
                     "o_orderdate"))


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, floor((CAST(sum({_REV}) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — every dim (customer/supplier/nation/
    region) broadcast against the lineitem fact; one agg shuffle on
    n_name."""
    c, o, li, s, n, r = load(spark, sf_dir, "customer", "orders", "lineitem",
                             "supplier", "nation", "region")
    j = (li.join(o.filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) &
                          (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey")) &
                                 (F.col("c_nationkey") == F.col("s_nationkey")))
           .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    return (j.groupBy("n_name")
             .agg(_dsum(_dec("l_extendedprice") * (1 - _dec("l_discount")), "revenue")))


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT floor((CAST(sum(CAST(l_extendedprice AS {D}) * CAST(l_discount AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount >= 0.02 AND l_discount <= 0.09
      AND l_quantity < 24
    """)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg; every predicate
    pushes to parquet row-group stats. Single pass, 1-row result."""
    (li,) = load(spark, sf_dir, "lineitem")
    f = li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                  (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")) &
                  (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.09) &
                  (F.col("l_quantity") < 24))
    return f.agg(_dsum(_dec("l_extendedprice") * _dec("l_discount"), "revenue"),
                 F.count(F.lit(1)).alias("n_items"))


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, floor((CAST(sum({_REV}) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY sum({_REV}) DESC, c_custkey
    LIMIT 20
    """)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c, o, li, n = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    j = (li.filter(F.col("l_returnflag") == "R")
           .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")))
    rev = F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
    return (j.groupBy("c_custkey", "c_name", "n_name")
             .agg(rev.alias("_rev"))
             .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
             .limit(20)
             .select("c_custkey", "c_name",
                     quantize(F.col("_rev").cast("double"), 2).alias("revenue"), "n_name"))


@query(
    "topk_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, floor((o_totalprice) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS o_totalprice, rk
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rk <= 3
    """)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the window row_number pattern; Spark pushes a
    per-partition rank limit before the shuffle (WindowGroupLimit)."""
    c, o = load(spark, sf_dir, "customer", "orders")
    j = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (j.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 3)
             .select("c_mktsegment", "o_orderkey",
                     quantize("o_totalprice", 2).alias("o_totalprice"), "rk"))


@query(
    "window_running_spend",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           floor((CAST(sum(CAST(o_totalprice AS {D}))
                        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS running_spend,
           lag(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    """)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running (exact decimal) sum + lag per customer
    over a deterministic (orderdate, orderkey) total order."""
    (o,) = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        quantize(F.sum(_dec("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, 0))
                 .cast("double"), 2).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"))


@query(
    "rollup_lineitem_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           floor((CAST(sum(CAST(l_quantity AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP — partial agg + expand, one shuffle."""
    (li,) = load(spark, sf_dir, "lineitem")
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(_dsum(_dec("l_quantity"), "sum_qty"),
                   F.count(F.lit(1)).alias("n")))


@query(
    "cube_orders_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           floor((CAST(sum(CAST(o_totalprice AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """)
def cube_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = load(spark, sf_dir, "orders")
    return (o.cube("o_orderstatus", "o_orderpriority")
             .agg(F.count(F.lit(1)).alias("n"),
                  _dsum(_dec("o_totalprice"), "total")))


@query(
    "distinct_stats_per_segment",
    oracle=f"""
    SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
           count(*) AS n_customers,
           floor((CAST(sum(CAST(c_acctbal AS {D})) AS DOUBLE) / count(*)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS avg_bal
    FROM customer GROUP BY c_mktsegment
    """)
def distinct_stats_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    (c,) = load(spark, sf_dir, "customer")
    return (c.groupBy("c_mktsegment")
             .agg(F.countDistinct("c_nationkey").alias("n_nations"),
                  F.count(F.lit(1)).alias("n_customers"),
                  quantize(F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1)), 6)
                   .alias("avg_bal")))


@query(
    "set_ops_repeat_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """)
def set_ops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: INTERSECT (distinct semantics) of two epoch cohorts."""
    (o,) = load(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersect(late)


@query(
    "anti_join_quiet_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """)
def anti_join_quiet_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no recent orders (NOT EXISTS)."""
    c, o = load(spark, sf_dir, "customer", "orders")
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


@query(
    "semi_join_active_parts",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part
    WHERE p_size > 40 AND EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """)
def semi_join_active_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS) + agg."""
    p, li = load(spark, sf_dir, "part", "lineitem")
    return (p.filter(F.col("p_size") > 40)
             .join(li, p.p_partkey == li.l_partkey, "left_semi")
             .groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_parts")))


@query(
    "weekly_revenue_wow",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    )
    SELECT week,
           CAST(CAST(cents AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
           floor((CAST(cents - lag(cents) OVER (ORDER BY week) AS DOUBLE)
                  / CAST(lag(cents) OVER (ORDER BY week) AS DOUBLE))
                 * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)
             AS wow_change
    FROM weekly
    """)
def weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: the reporting shape every revenue
    dashboard draws — periodic rollup, then lag on the AGGREGATED
    series. Exact integer cents through the rollup; the percent change
    is one double division on exact numerators.

    Scale: the lag window is over the weekly series (|weeks| rows —
    driver-scale after aggregation), so the single-partition window is
    bounded by calendar length, never data volume; the corpus-wide
    work is one hash agg with map-side partials."""
    (o,) = load(spark, sf_dir, "orders")
    weekly = (o.groupBy(F.date_trunc("week", "o_orderdate").cast("date")
                         .alias("week"))
               .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                           .cast("long")).alias("cents")))
    w = W.orderBy("week")
    prev = F.lag("cents").over(w)
    return weekly.select(
        "week",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        quantize((F.col("cents") - prev).cast("double")
                 / prev.cast("double"), 6).alias("wow_change"))


# ---- RFM segmentation + time-series autocorrelation ------------------


@query(
    "rfm_customer_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey
    ),
    n AS (SELECT count(*) AS n_cust FROM per_cust),
    scored AS (
      SELECT monetary_cents,
             1 + (row_number() OVER (ORDER BY recency_days, o_custkey) - 1)
                 * 5 // n.n_cust AS r_score,
             1 + (row_number() OVER (ORDER BY frequency DESC, o_custkey) - 1)
                 * 5 // n.n_cust AS f_score,
             1 + (row_number() OVER (ORDER BY monetary_cents DESC, o_custkey)
                  - 1) * 5 // n.n_cust AS m_score
      FROM per_cust, n
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           count(*) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS total_cents
    FROM scored GROUP BY 1, 2, 3
    """)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles) —
    the classic customer-value cube. Scores are DETERMINISTIC
    quintiles: rank by (metric, custkey tiebreak), bucket by
    1 + (rank-1)*5 div n — identical on both engines, unlike ntile
    over ties. Recency counts days from each customer's last order to
    the corpus max date; monetary is exact integer cents.

    Scale: one groupBy(custkey) pass; three rank windows over the
    per-customer aggregate (customer-cardinality, ≪ orders); the
    output cube is ≤125 rows."""
    (o,) = load(spark, sf_dir, "orders")
    snap = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("snap"))
    per_cust = (o.groupBy("o_custkey")
                 .agg(F.max(F.col("o_orderdate").cast("date")).alias("last"),
                      F.count(F.lit(1)).alias("frequency"),
                      F.sum(F.floor(F.col("o_totalprice") * 100
                                    + F.lit(0.5)).cast("long"))
                       .alias("monetary_cents"))
                 .crossJoin(F.broadcast(snap))
                 .select("o_custkey",
                         F.datediff(F.col("snap"), F.col("last"))
                          .alias("recency_days"),
                         "frequency", "monetary_cents"))
    n_cust = per_cust.count()

    def score(order_cols):
        return 1 + (F.row_number().over(W.orderBy(*order_cols)) - 1) \
            * 5 / F.lit(n_cust)

    scored = per_cust.select(
        "monetary_cents",
        F.floor(score([F.col("recency_days"), F.col("o_custkey")]))
         .cast("long").alias("r_score"),
        F.floor(score([F.desc("frequency"), F.col("o_custkey")]))
         .cast("long").alias("f_score"),
        F.floor(score([F.desc("monetary_cents"), F.col("o_custkey")]))
         .cast("long").alias("m_score"))
    return (scored.groupBy("r_score", "f_score", "m_score")
                  .agg(F.count(F.lit(1)).alias("n_customers"),
                       F.sum("monetary_cents").alias("total_cents")))


_ACF_MAX_LAG = 7


@query(
    "autocorrelation_daily_revenue",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS HUGEINT) AS sxx
      FROM daily
    ),
    ks AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS k),
    pairs AS (
      SELECT ks.k, count(*) AS n_pairs,
             CAST(sum(CAST(a.x AS HUGEINT) * b.x) AS HUGEINT) AS sxy,
             CAST(sum(a.x) AS BIGINT) AS sh, CAST(sum(b.x) AS BIGINT) AS st
      FROM ks JOIN daily a ON TRUE
              JOIN daily b ON b.d = a.d + to_days(CAST(ks.k AS INT))
      GROUP BY ks.k
    )
    SELECT CAST(p.k AS BIGINT) AS k, CAST(p.n_pairs AS BIGINT) AS n_pairs,
           floor(((CAST(p.sxy AS DOUBLE)
                   - (CAST(s.sx AS DOUBLE) / s.n) * (p.sh + p.st)
                   + p.n_pairs * (CAST(s.sx AS DOUBLE) / s.n)
                     * (CAST(s.sx AS DOUBLE) / s.n))
                  / (CAST(s.sxx AS DOUBLE)
                     - s.n * (CAST(s.sx AS DOUBLE) / s.n)
                       * (CAST(s.sx AS DOUBLE) / s.n)))
                 * CAST(1000000.0 AS DOUBLE) + 0.5)
             / CAST(1000000.0 AS DOUBLE) AS acf
    FROM pairs p, stats s
    """)
def autocorrelation_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..{lag} —
    the seasonality detector (weekly cycles show as a lag-7 peak).
    Textbook estimator r_k = Σ(x_t−μ)(x_t+k−μ) / Σ(x_t−μ)², expanded
    into EXACT integer sums (cents, cents², lagged cross-products via
    a calendar self-join) so both engines perform the identical final
    double expression (quantized to 1e-6).

    Scale: the daily series is date-cardinality (tiny after the first
    aggregation); the lag join is over that series × 7 lags, a
    broadcast-scale operation regardless of order volume."""
    (o,) = load(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
              .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                          .cast("long")).alias("x")))
    n, sx, sxx = daily.agg(
        F.count(F.lit(1)),
        F.sum("x"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))).first()
    ks = spark.createDataFrame([(k,) for k in range(1, _ACF_MAX_LAG + 1)],
                               "k long")
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (F.broadcast(ks)
             .join(a, F.lit(True))
             .join(b, F.col("b.d") == F.expr("date_add(a.d, CAST(k AS INT))"))
             .groupBy("k")
             .agg(F.count(F.lit(1)).alias("n_pairs"),
                  F.sum((F.col("a.x").cast("decimal(38,0)")
                         * F.col("b.x"))).alias("sxy"),
                  F.sum(F.col("a.x")).alias("sh"),
                  F.sum(F.col("b.x")).alias("st")))
    mu = float(sx) / float(n)
    den = float(sxx) - float(n) * mu * mu
    acf = ((F.col("sxy").cast("double")
            - F.lit(mu) * (F.col("sh") + F.col("st"))
            + F.col("n_pairs") * F.lit(mu) * F.lit(mu)) / F.lit(den))
    return (pairs.select(F.col("k").cast("long").alias("k"),
                         F.col("n_pairs").cast("long").alias("n_pairs"),
                         quantize(acf, 6).alias("acf")))


@query(
    "cohort_ltv_curves",
    oracle="""
    WITH o2 AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS ym,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    cohort AS (
      SELECT o_custkey, min(ym) AS cohort_ym FROM o2 GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort_ym, count(*) AS cohort_size
      FROM cohort GROUP BY cohort_ym
    ),
    monthly AS (
      SELECT c.cohort_ym, o2.ym - c.cohort_ym AS months_since,
             count(*) AS n_orders, CAST(sum(o2.cents) AS BIGINT) AS cents
      FROM o2 JOIN cohort c ON o2.o_custkey = c.o_custkey
      GROUP BY 1, 2
    )
    SELECT m.cohort_ym, s.cohort_size, m.months_since, m.n_orders,
           m.cents,
           CAST(sum(m.cents) OVER (PARTITION BY m.cohort_ym
                                   ORDER BY m.months_since) AS BIGINT)
             AS cum_cents
    FROM monthly m JOIN sized s ON s.cohort_ym = m.cohort_ym
    WHERE m.months_since <= 12
    """)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    month, revenue accumulated by months-since-acquisition (first 12
    months) — the retention/LTV analysis every growth team runs.
    Months are integer year*12+month arithmetic (no months_between
    floats), money is exact integer cents, the cumulative curve is a
    running integer sum — hash-exact across engines.

    Scale: one groupBy(custkey) cohort pass, one cohort join (the
    cohort relation is customer-cardinality and broadcastable), one
    (cohort, month) aggregate — output is cohorts × 13 rows."""
    (o,) = load(spark, sf_dir, "orders")
    o2 = o.select("o_custkey",
                  (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
                  .cast("long").alias("ym"),
                  F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                   .cast("long").alias("cents"))
    cohort = o2.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    sized = (cohort.groupBy("cohort_ym")
                   .agg(F.count(F.lit(1)).alias("cohort_size")))
    monthly = (o2.join(cohort, "o_custkey")
                 .groupBy("cohort_ym",
                          (F.col("ym") - F.col("cohort_ym"))
                          .alias("months_since"))
                 .agg(F.count(F.lit(1)).alias("n_orders"),
                      F.sum("cents").alias("cents")))
    w = W.partitionBy("cohort_ym").orderBy("months_since")
    return (monthly.join(F.broadcast(sized), "cohort_ym")
                   .withColumn("cum_cents", F.sum("cents").over(w))
                   .filter(F.col("months_since") <= 12)
                   .select("cohort_ym", "cohort_size", "months_since",
                           "n_orders", "cents", "cum_cents"))


@query(
    "trimmed_mean_order_values",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority AS pri,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    n AS (SELECT pri, count(*) AS n_rows FROM c GROUP BY pri),
    ranked AS (
      SELECT pri, cents,
             row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn
      FROM c
    )
    SELECT r.pri AS o_orderpriority,
           CAST(n.n_rows AS BIGINT) AS n_rows,
           count(*) AS n_kept,
           CAST(sum(r.cents) AS BIGINT) AS kept_cents,
           floor((CAST(sum(r.cents) AS DOUBLE) / count(*))
                 * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS trimmed_mean_cents
    FROM ranked r JOIN n ON n.pri = r.pri
    WHERE r.rn > n.n_rows * 5 // 100
      AND r.rn <= n.n_rows - n.n_rows * 5 // 100
    GROUP BY r.pri, n.n_rows
    """)
def trimmed_mean_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean of order values per priority — the robust
    central-tendency statistic (outlier-resistant, unlike avg; less
    lossy than median). EXACT: integer-cents rank windows drop the
    bottom/top n·5 div 100 order statistics, the kept sum is exact
    integer, one final double division (quantized to cents).

    Scale: per-group rank is the two-pass histogram shape at 100 TB
    (``exact_percentile_grid``); here groups are few and the window
    shuffles once on the group key."""
    (o,) = load(spark, sf_dir, "orders")
    c = o.select(F.col("o_orderpriority").alias("pri"),
                 F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    n = c.groupBy("pri").agg(F.count(F.lit(1)).alias("n_rows"))
    ranked = c.withColumn(
        "rn", F.row_number().over(W.partitionBy("pri").orderBy("cents")))
    lo = F.expr("n_rows * 5 div 100")
    kept = (ranked.join(F.broadcast(n), "pri")
                  .filter((F.col("rn") > lo)
                          & (F.col("rn") <= F.col("n_rows") - lo)))
    return (kept.groupBy(F.col("pri").alias("o_orderpriority"), "n_rows")
                .agg(F.count(F.lit(1)).alias("n_kept"),
                     F.sum("cents").alias("kept_cents"))
                .select("o_orderpriority", "n_rows", "n_kept", "kept_cents",
                        quantize(F.col("kept_cents").cast("double")
                                 / F.col("n_kept"), 2)
                         .alias("trimmed_mean_cents")))


@query(
    "seasonal_dow_decomposition",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s FROM daily)
    SELECT CAST(d % 7 AS BIGINT) AS dow,
           count(*) AS n_days,
           CAST(sum(cents) AS BIGINT) AS dow_cents,
           CAST((SELECT n FROM tot) * sum(cents)
                - count(*) * (SELECT s FROM tot) AS BIGINT)
             AS seasonal_num,
           CAST(count(*) * (SELECT n FROM tot) AS BIGINT) AS seasonal_den,
           floor((CAST(sum(cents) AS DOUBLE) / count(*)
                  - CAST((SELECT s FROM tot) AS DOUBLE)
                    / (SELECT n FROM tot))
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS seasonal_cents
    FROM daily GROUP BY 1
    """)
def seasonal_dow_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily revenue — the
    additive-seasonality readout (the mean-by-period core of STL
    without the loess smoothing): for each weekday slot (epoch-day mod
    7, engine-portable — no locale-dependent weekday numbering), its
    seasonal effect = slot mean − grand mean, emitted BOTH as an exact
    BIGINT rational (seasonal_num/seasonal_den — the OLS-trend
    discipline: sign and magnitude hash-check without any float) and
    as quantized cents for display. Feeds anomaly gates: a residual z
    test against (daily − trend − seasonal) flags true outliers
    instead of re-flagging every weekend.

    Scale: one map-combined pass to daily sums (days-bounded
    relation), a 1-row grand total joined as a broadcast scalar, then
    a 7-row aggregate — nothing beyond the first agg touches the fact
    table."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    daily = (e.groupBy(F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                        .cast("long").alias("d"))
              .agg(F.sum(cents).alias("cents")))
    tot = daily.agg(F.count(F.lit(1)).alias("n"),
                    F.sum("cents").cast("long").alias("s"))
    by_dow = (daily.groupBy((F.col("d") % 7).cast("long").alias("dow"))
                   .agg(F.count(F.lit(1)).alias("n_days"),
                        F.sum("cents").cast("long").alias("dow_cents")))
    j = by_dow.crossJoin(F.broadcast(tot))
    return j.select(
        "dow", "n_days", "dow_cents",
        (F.col("n") * F.col("dow_cents") - F.col("n_days") * F.col("s"))
          .cast("long").alias("seasonal_num"),
        (F.col("n_days") * F.col("n")).cast("long").alias("seasonal_den"),
        quantize(F.col("dow_cents").cast("double") / F.col("n_days")
                 - F.col("s").cast("double") / F.col("n"), 2)
          .alias("seasonal_cents"))


@query(
    "theil_sen_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS BIGINT) AS num,
             CAST(b.x - a.x AS BIGINT) AS den
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.x > a.x
    ),
    ranked AS (
      SELECT event_type, num, den,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(num AS DOUBLE) / den,
                                         num, den) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM slopes
    )
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           num AS med_num, den AS med_den,
           floor((CAST(num AS DOUBLE) / den)
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS slope_cents_per_day
    FROM ranked
    WHERE rk = CAST(floor((n_pairs + 1) / 2.0) AS BIGINT)
    """)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily revenue per event type: the
    MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i) — a single
    Black-Friday spike that drags the OLS fit
    (``ols_daily_revenue_trend``) barely moves this one (29.3%
    breakdown point). The median slope is selected by rank over
    (double quotient, then exact num/den tie-break): two distinct
    rationals whose doubles collide still order identically on both
    engines via the integer tie-break, so the pick is deterministic;
    the chosen slope is emitted as its exact integer pair plus
    quantized cents/day.

    Scale: pairwise slopes are quadratic IN DAYS, not rows — the daily
    relation is (types × days)-bounded after the one corpus pass, so
    even a decade of history is ~6.7M pairs per type, a partition-local
    window problem; the corpus itself is touched once."""
    from pyspark.sql.window import Window as W

    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    daily = (e.groupBy("event_type",
                       F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                        .cast("long").alias("x"))
              .agg(F.sum(cents).alias("y")))
    a = daily.select("event_type", F.col("x").alias("xa"),
                     F.col("y").alias("ya"))
    b = daily.select(F.col("event_type").alias("et_b"),
                     F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (a.join(b, (F.col("et_b") == F.col("event_type"))
                     & (F.col("xb") > F.col("xa")))
               .select("event_type",
                       (F.col("yb") - F.col("ya")).cast("long")
                        .alias("num"),
                       (F.col("xb") - F.col("xa")).cast("long")
                        .alias("den")))
    w = W.partitionBy("event_type").orderBy(
        F.col("num").cast("double") / F.col("den"), "num", "den")
    ranked = (slopes
              .withColumn("rk", F.row_number().over(w))
              .withColumn("n_pairs",
                          F.count(F.lit(1)).over(
                              W.partitionBy("event_type"))))
    lower_median = F.floor((F.col("n_pairs") + 1) / 2.0).cast("long")
    return (ranked.filter(F.col("rk") == lower_median)
            .select("event_type",
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("num").alias("med_num"),
                    F.col("den").alias("med_den"),
                    quantize(F.col("num").cast("double") / F.col("den"), 2)
                      .alias("slope_cents_per_day")))


@query(
    "seasonal_residual_outliers",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    dow AS (
      SELECT d % 7 AS dow, count(*) AS n_days,
             CAST(sum(cents) AS BIGINT) AS s
      FROM daily GROUP BY 1
    ),
    resid AS (
      SELECT y.d, y.cents, w.dow,
             CAST(floor(CAST(1000000 * (y.cents * w.n_days - w.s)
                             AS DOUBLE) / w.n_days + 0.5) AS BIGINT)
               AS r_micro
      FROM daily y JOIN dow w ON w.dow = y.d % 7
    ),
    mom AS (
      SELECT count(*) AS n,
             CAST(sum(r_micro) AS BIGINT) AS s1,
             CAST(sum(CAST(r_micro AS HUGEINT) * r_micro) AS HUGEINT) AS s2
      FROM resid
    )
    SELECT r.d AS day_index, CAST(r.dow AS BIGINT) AS dow, r.cents,
           floor((CAST(r.r_micro AS DOUBLE) / 1000000.0)
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS residual_cents,
           abs(CAST(r.r_micro AS DOUBLE)
               - CAST((SELECT s1 FROM mom) AS DOUBLE)
                 / (SELECT n FROM mom))
             > 2.0 * sqrt(CAST((SELECT s2 FROM mom) AS DOUBLE)
                            / (SELECT n FROM mom)
                          - (CAST((SELECT s1 FROM mom) AS DOUBLE)
                             / (SELECT n FROM mom))
                            * (CAST((SELECT s1 FROM mom) AS DOUBLE)
                               / (SELECT n FROM mom)))
             AS is_outlier
    FROM resid r
    """)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection — the composition
    ``seasonal_dow_decomposition`` exists to enable: each day's
    residual vs its weekday-slot mean, flagged when |residual − mean
    residual| > 2σ. Deseasonalizing first is the whole point: a plain
    z-test on raw dailies flags every weekend; on residuals only true
    anomalies fire.

    FP parity: each day's residual quantizes to an INTEGER micro-unit
    (one correctly-rounded division of exact BIGINTs, then floored),
    the moments are exact integer sums (s2 in >64-bit integers), and
    both engines evaluate the identical threshold expression over the
    identical exact operands — no order-dependent double accumulation
    anywhere. The boolean flag is the hash-checked output — a single
    bit of disagreement fails the driver.

    Scale: days-bounded after one corpus pass; the slot and moment
    relations are 7 rows and 1 row, broadcast back."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    daily = (e.groupBy(F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                        .cast("long").alias("d"))
              .agg(F.sum(cents).alias("cents")))
    dow = (daily.groupBy((F.col("d") % 7).alias("dow"))
                .agg(F.count(F.lit(1)).alias("n_days"),
                     F.sum("cents").cast("long").alias("s")))
    resid = (daily.withColumn("dow", F.col("d") % 7)
                  .join(F.broadcast(dow), "dow")
                  .select("d", "cents", "dow",
                          F.floor((1000000 * (F.col("cents")
                                              * F.col("n_days")
                                              - F.col("s"))).cast("double")
                                  / F.col("n_days") + F.lit(0.5))
                           .cast("long").alias("r_micro")))
    dec = "decimal(38,0)"
    mom = resid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r_micro").cast("long").alias("s1"),
        F.sum((F.col("r_micro").cast(dec) * F.col("r_micro")).cast(dec))
         .alias("s2"))
    j = resid.crossJoin(F.broadcast(mom))
    rm = F.col("r_micro").cast("double")
    mean = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(F.col("s2").cast("double") / F.col("n") - mean * mean)
    return j.select(
        F.col("d").alias("day_index"),
        F.col("dow").cast("long").alias("dow"),
        "cents",
        quantize(rm / 1000000.0, 2).alias("residual_cents"),
        (F.abs(rm - mean) > 2.0 * sd).alias("is_outlier"))
