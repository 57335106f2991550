"""Second TPC-H-shaped batch, adapted to the driver testdata columns
(no partsupp/shipmode/commitdate in this schema — each query keeps the
original's plan *shape*, which is what matters for the engine):
Q2→cheapest supplier per part, Q4→priority order counts via EXISTS,
Q7→nation-pair trade volume, Q12→priority class agg, Q14→promo revenue
ratio, Q18→large-order customers (HAVING + IN-subquery), Q19→disjunctive
predicate pushdown, Q22→idle-customer cohort with avg subquery."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize

D = "DECIMAL(18,2)"
_REV = f"CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D}))"


@query(
    "q2_cheapest_supplier_per_part",
    oracle=f"""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum({_REV}) AS DOUBLE) / CAST(sum(CAST(l_quantity AS {D})) AS DOUBLE)
               AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey, l_suppkey, floor((unit_cost) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS unit_cost
    FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
                                       ORDER BY unit_cost, l_suppkey) AS rk
          FROM costs)
    WHERE rk = 1
    """)
def q2_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (min-cost supplier): agg → per-group argmin. The argmin
    is a second HASH aggregation (min_by over a (unit_cost, suppkey)
    ordering struct) rather than a row_number window — no partition
    sort, partial aggregation on the map side, and the second shuffle's
    input is already one row per (part, supp). Tie-break (lowest
    suppkey) matches the oracle's ORDER BY unit_cost, l_suppkey."""
    (li,) = load(spark, sf_dir, "lineitem")
    costs = (li.groupBy("l_partkey", "l_suppkey")
               .agg((F.sum(F.expr(_REV)).cast("double") /
                     F.sum(F.col("l_quantity").cast(D)).cast("double"))
                    .alias("unit_cost")))
    best = (costs.groupBy("l_partkey")
                 .agg(F.min_by(F.struct("l_suppkey", "unit_cost"),
                               F.struct("unit_cost", "l_suppkey")).alias("w")))
    return best.select("l_partkey", F.col("w.l_suppkey").alias("l_suppkey"),
                       quantize(F.col("w.unit_cost"), 6).alias("unit_cost"))


@query(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join against the fact table + priority agg."""
    o, li = load(spark, sf_dir, "orders", "lineitem")
    filt = o.filter((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")) &
                    (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp")))
    late = li.join(filt, (F.col("l_orderkey") == F.col("o_orderkey")) &
                         (F.col("l_shipdate") > F.col("o_orderdate")), "inner") \
             .select("o_orderkey").distinct()
    return (filt.join(late, "o_orderkey", "left_semi")
                .groupBy("o_orderpriority")
                .agg(F.count(F.lit(1)).alias("order_count")))


@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           year(l_shipdate) AS l_year,
           floor((CAST(sum({_REV}) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation cn ON c_nationkey = cn.n_nationkey
                  JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
    """)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: cross-nation volume — two aliased broadcast joins of
    the same dim (nation) under different roles."""
    li, o, c, s, n = load(spark, sf_dir, "lineitem", "orders", "customer",
                          "supplier", "nation")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    j = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) &
                   (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
           .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
           .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
           .filter(F.col("cn_key") != F.col("sn_key")))
    return (j.groupBy("cust_nation", "supp_nation",
                      F.year("l_shipdate").alias("l_year"))
             .agg(quantize(F.sum(F.expr(_REV)).cast("double"), 2).alias("revenue")))


@query(
    "q12_priority_class_agg",
    oracle=f"""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count,
           floor((CAST(sum(CAST(l_extendedprice AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """)
def q12_priority_class_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE aggregation over a fact join."""
    li, o = load(spark, sf_dir, "lineitem", "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                   (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
           .join(o, F.col("l_orderkey") == F.col("o_orderkey")))
    return (j.groupBy("l_linestatus")
             .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                  F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
                  quantize(F.sum(F.col("l_extendedprice").cast(D)).cast("double"), 2)
                   .alias("total_price")))


@query(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT floor((100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                   ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(sum({_REV}) AS DOUBLE)) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-09-01'
    """)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue ratio over a broadcast part join.
    Both sums stay decimal-exact; one double division at the end."""
    li, p = load(spark, sf_dir, "lineitem", "part")
    rev = F.expr(_REV)
    promo = F.when(F.col("p_type") == "PROMO", rev) \
             .otherwise(F.lit("0.00").cast("decimal(18,2)"))
    j = (li.filter((F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp")) &
                   (F.col("l_shipdate") < F.lit("1997-09-01").cast("timestamp")))
           .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")))
    return j.agg(quantize(F.lit(100.0) * F.sum(promo).cast("double")
                         / F.sum(rev).cast("double"), 6)
                  .alias("promo_revenue_pct"))


@query(
    "q18_large_order_customers",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate,
           floor((CAST(sum(CAST(l_quantity AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS {D})) > 200)
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """)
def q18_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING subquery (large orders) semi-joined back into
    the 3-way join. The subquery agg and the outer agg share the
    l_orderkey partitioning."""
    c, o, li = load(spark, sf_dir, "customer", "orders", "lineitem")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum(F.col("l_quantity").cast(D)).alias("q"))
             .filter(F.col("q") > 200).select("l_orderkey"))
    j = (o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
          .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
          .join(li, F.col("o_orderkey") == F.col("l_orderkey")))
    return (j.groupBy("c_custkey", "o_orderkey", "o_orderdate")
             .agg(quantize(F.sum(F.col("l_quantity").cast(D)).cast("double"), 2)
                   .alias("total_qty")))


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT floor((CAST(sum({_REV}) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_type = 'SMALL' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_type = 'MEDIUM' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_type = 'LARGE' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs predicate across both join sides —
    exercises Catalyst's CNF conversion / partial pushdown."""
    li, p = load(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (((F.col("p_type") == "SMALL") & F.col("p_size").between(1, 15) & q.between(1, 20)) |
            ((F.col("p_type") == "MEDIUM") & F.col("p_size").between(10, 30) & q.between(10, 30)) |
            ((F.col("p_type") == "LARGE") & F.col("p_size").between(20, 50) & q.between(20, 40)))
    return j.filter(cond).agg(
        quantize(F.sum(F.expr(_REV)).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"))


@query(
    "q22_idle_rich_customers",
    oracle=f"""
    SELECT c_mktsegment, count(*) AS numcust,
           floor((CAST(sum(CAST(c_acctbal AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS {D})) AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    """)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar avg subquery + NOT EXISTS anti-join + cohort agg."""
    c, o = load(spark, sf_dir, "customer", "orders")
    for df, name in ((c, "customer"), (o, "orders")):
        df.createOrReplaceTempView(name)
    return spark.sql(f"""
        SELECT c_mktsegment, count(*) AS numcust,
               floor((CAST(sum(CAST(c_acctbal AS {D})) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS {D})) AS DOUBLE) / count(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_mktsegment""")
