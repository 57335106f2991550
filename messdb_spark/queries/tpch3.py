"""Third TPC-H-shaped batch — the remaining query shapes, adapted to
the driver testdata (no partsupp/commitdate/receiptdate; each query
keeps the original's *plan shape*, which is what the engine exercises):

Q8→market-share ratio by year, Q9→product profit by nation/year
(supply cost synthesized from part.p_retailprice), Q11→important parts
by value vs global threshold (scalar subquery over an agg), Q13→customer
order-count distribution (outer join with join-condition filter + double
agg), Q15→top-revenue supplier (agg CTE + scalar max subquery),
Q16→supplier count by part attrs (NOT IN + count distinct), Q17→small-
quantity revenue (per-part avg correlated subquery), Q20→excess-quantity
suppliers (nested semi-join chain), Q21→suppliers who kept orders
waiting (multi-EXISTS, expressed as a per-order distinct-supplier agg).

Numeric discipline (see queries/__init__.quantize): money sums stay
DECIMAL end-to-end on both engines; only final ratios/outputs are cast
to DOUBLE and floor-quantized, so Spark and DuckDB hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, pin_result, quantize, quantize_sql, query

D = "DECIMAL(18,2)"
_REV = f"CAST(l_extendedprice AS {D}) * (1 - CAST(l_discount AS {D}))"


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           {quantize_sql("CAST(coalesce(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume END), 0) AS DOUBLE) / CAST(sum(volume) AS DOUBLE)", 6)} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_REV} AS volume, sn.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    """)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's purchase volume per
    year — 6-way join (all dims broadcast), conditional/total decimal
    sums, one double division at the end. The only shuffle is the
    final tiny groupBy(o_year)."""
    li, o, c, s, n, r = load(spark, sf_dir, "lineitem", "orders", "customer",
                             "supplier", "nation", "region")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    asia = r.filter(F.col("r_name") == "ASIA") \
            .select(F.col("r_regionkey").alias("rk"))
    j = (o.filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) &
                  (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
          .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
          .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
          .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
          .join(F.broadcast(asia), F.col("cn_region") == F.col("rk"), "left_semi")
          .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")))
    vol = F.expr(_REV)
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
             .agg(quantize(
                  F.coalesce(F.sum(F.when(F.col("supp_nation") == "NATION_2", vol)),
                             F.lit(0)).cast("double") /
                  F.sum(vol).cast("double"), 6).alias("mkt_share")))


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation, year(o_orderdate) AS o_year,
           {quantize_sql(f"CAST(sum({_REV} - CAST(p_retailprice AS {D}) * CAST(l_quantity AS {D})) AS DOUBLE)", 2)} AS profit
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(o_orderdate)
    """)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per year. The testdata has
    no partsupp, so supply cost is synthesized as p_retailprice (the
    shape — fact joined to a per-part cost column, decimal-exact
    difference summed — is unchanged). p_name filter prunes the part
    dim before broadcast."""
    li, o, p, s, n = load(spark, sf_dir, "lineitem", "orders", "part",
                          "supplier", "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("nation"))
    widgets = p.filter(F.col("p_name").like("%widget%"))
    amount = (F.expr(_REV) -
              F.col("p_retailprice").cast(D) * F.col("l_quantity").cast(D))
    j = (li.join(F.broadcast(widgets), F.col("l_partkey") == F.col("p_partkey"))
           .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
           .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key")))
    return (j.groupBy("nation", F.year("o_orderdate").alias("o_year"))
             .agg(quantize(F.sum(amount).cast("double"), 2).alias("profit")))


@query(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, {quantize_sql("CAST(sum(" + _REV + ") AS DOUBLE)", 2)} AS value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum({_REV}) AS DOUBLE) > (
      SELECT CAST(sum({_REV}) AS DOUBLE) * 1.5 / count(DISTINCT l_partkey)
      FROM lineitem)
    """)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-key value vs a scalar threshold over the same
    fact table — parts carrying >1.5× the average per-part value
    (scale-invariant, unlike the original's fixed fraction). The
    per-part sums are exact decimals cast to double, and the threshold
    is built with the identical IEEE op sequence (×1.5 then ÷N) on
    both engines, so the comparison boundary is bit-portable.

    Scale: the threshold is a 1-row scalar aggregate over the per-part
    sums, broadcast back over them via cross join — no unpartitioned
    window, so no stage funnels the O(parts) frame through a single
    partition (at parts ≈ 10⁸ the old ``Window.partitionBy()`` form was
    a single-executor bottleneck; the only SinglePartition exchange left
    is the 1-row scalar agg over 32 partial rows). The per-part shuffle
    appears in both branches and AQE's exchange reuse materializes it
    once — lineitem scans once, no cache, no driver collect."""
    (li,) = load(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_partkey").agg(F.sum(F.expr(_REV)).alias("v"))
    # identical IEEE sequence to the oracle: cast-to-double, ×1.5, ÷N
    thr = vals.agg((F.sum("v").cast("double") * F.lit(1.5) /
                    F.count(F.lit(1))).alias("thr"))
    return (vals.crossJoin(F.broadcast(thr))
                .filter(F.col("v").cast("double") > F.col("thr"))
                .select("l_partkey",
                        quantize(F.col("v").cast("double"), 2).alias("value")))


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer join with an extra join-condition predicate
    (NOT a post-filter — customers with zero matching orders must
    survive with count 0), then a second aggregation over the first's
    output. count(col) vs count(*) null-semantics are load-bearing."""
    c, o = load(spark, sf_dir, "customer", "orders")
    j = c.join(o, (F.col("c_custkey") == F.col("o_custkey")) &
                  (F.col("o_orderpriority") != "1-URGENT"), "left_outer")
    per_cust = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           {quantize_sql("CAST(total_revenue AS DOUBLE)", 2)} AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: agg CTE reused twice (once for the max scalar, once
    for the join) — the agg computes once and the max is a near-free
    second pass over its (tiny) output; ties all surface, exactly as
    the WHERE = MAX formulation demands. Decimal equality at the
    boundary is exact on both engines."""
    li, s = load(spark, sf_dir, "lineitem", "supplier")
    rev = (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                     (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
             .groupBy(F.col("l_suppkey").alias("supplier_no"))
             .agg(F.sum(F.expr(_REV)).alias("total_revenue"))).cache()
    best = rev.agg(F.max("total_revenue").alias("m")).collect()[0]["m"]
    out = (F.broadcast(s)
            .join(rev.filter(F.col("total_revenue") == F.lit(best)),
                  F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    quantize(F.col("total_revenue").cast("double"), 2)
                     .alias("total_revenue")))
    return pin_result(out, rev)


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
    GROUP BY p_brand, p_type, p_size
    """)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier diversity per part attribute bucket —
    NOT IN anti-join (the testdata's lineitem doubles as the
    part↔supplier relation; the complaint cohort is a deterministic
    modulus since no acctbal is negative here) + count distinct."""
    li, p, s = load(spark, sf_dir, "lineitem", "part", "supplier")
    parts = p.filter((F.col("p_brand") != "Brand#3") &
                     (F.col("p_type") != "PROMO") &
                     F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 49))
    bad = s.filter(F.col("s_suppkey") % 10 == 0).select("s_suppkey")
    j = (li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
           .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                 "left_anti"))
    return (j.groupBy("p_brand", "p_type", "p_size")
             .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT {quantize_sql(f"CAST(sum(CAST(l_extendedprice AS {D})) AS DOUBLE) / 7.0", 2)} AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#5'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part average threshold, decorrelated
    into a groupBy + join (what Catalyst/DuckDB both do under the
    hood). Quantities are integer-valued doubles, so avg is exact and
    the 0.2× boundary is engine-portable."""
    li, p = load(spark, sf_dir, "lineitem", "part")
    brand_parts = p.filter(F.col("p_brand") == "Brand#5").select("p_partkey")
    avg_qty = (li.join(F.broadcast(brand_parts),
                       F.col("l_partkey") == F.col("p_partkey"), "left_semi")
                 .groupBy("l_partkey")
                 .agg((F.lit(0.2) * F.avg("l_quantity")).alias("threshold"))
                 .withColumnRenamed("l_partkey", "t_partkey"))
    j = (li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
           .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("t_partkey"))
           .filter(F.col("l_quantity") < F.col("threshold")))
    return j.agg(quantize(F.sum(F.col("l_extendedprice").cast(D)).cast("double")
                          / F.lit(7.0), 2).alias("avg_yearly"))


@query(
    "q20_excess_quantity_suppliers",
    oracle=f"""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%bolt%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(CAST(l_quantity AS {D})) > 60)
      AND s_nationkey < 13
    """)
def q20_excess_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain — suppliers who moved an
    excess quantity of some matching part in a window. The inner agg
    shuffles on (suppkey, partkey); the outer is a broadcast semi-join
    into the tiny supplier dim."""
    li, p, s = load(spark, sf_dir, "lineitem", "part", "supplier")
    bolts = p.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    excess = (li.filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) &
                        (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
                .join(F.broadcast(bolts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
                .groupBy("l_suppkey", "l_partkey")
                .agg(F.sum(F.col("l_quantity").cast(D)).alias("q"))
                .filter(F.col("q") > 60)
                .select("l_suppkey").distinct())
    return (s.filter(F.col("s_nationkey") < 13)
             .join(excess.withColumnRenamed("l_suppkey", "s_suppkey"),
                   "s_suppkey", "left_semi")
             .select("s_suppkey", "s_name"))


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                 THEN l_suppkey END) AS n_late,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN l_suppkey END) AS late_supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM per_order JOIN supplier ON late_supp = s_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the EXISTS/NOT-EXISTS pair ("another supplier shipped,
    no other supplier was late") collapses into one per-order
    distinct-supplier aggregation — one shuffle on l_orderkey instead
    of two extra self-joins; late = shipped >60 days after order (the
    testdata has no receipt/commit dates)."""
    li, o, s = load(spark, sf_dir, "lineitem", "orders", "supplier")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    j = (li.join(o.filter(F.col("o_orderstatus") == "F"),
                 F.col("l_orderkey") == F.col("o_orderkey")))
    per_order = (j.groupBy("l_orderkey")
                  .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                       F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
                       F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp")))
    return (per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
                     .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
                     .groupBy("s_name")
                     .agg(F.count(F.lit(1)).alias("numwait")))
