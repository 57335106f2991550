"""Model-based tests for the round-5 traversal/rank/trend operators
(SURVEY.md §5 discipline): random constructed inputs → the Spark
implementation shape vs a pure-Python model.

These test the ALGORITHM cores on synthetic relations (not the
registered queries, which tests/test_oracle_parity.py already checks
against DuckDB end-to-end) — the same split the core operators use
(model tests + oracle queries)."""

from __future__ import annotations

import random
from collections import defaultdict

from pyspark.sql import functions as F


# ---- BFS min hops -----------------------------------------------------

def model_bfs(edges, seeds, max_hops):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {v for u in frontier for v in adj[u] if v not in dist}
        for v in nxt:
            dist[v] = h
        frontier = nxt
        if not frontier:
            break
    return sorted(dist.items())


def spark_bfs(spark, edges, seeds, max_hops):
    """The bfs_min_hops loop shape on an arbitrary edge list."""
    e = spark.createDataFrame(edges, "src long, dst long")
    dist = spark.createDataFrame([(s, 0) for s in seeds],
                                 "node long, dist long") \
                .localCheckpoint(eager=True)
    frontier = dist.select("node")
    for hop in range(1, max_hops + 1):
        reached = (e.join(frontier.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node")).distinct())
        fresh = (reached.join(dist.select("node"), "node", "left_anti")
                        .withColumn("dist", F.lit(hop).cast("long"))
                        .localCheckpoint(eager=True))
        if fresh.isEmpty():
            break
        dist = dist.unionByName(fresh).localCheckpoint(eager=False)
        frontier = fresh.select("node")
    return sorted((r.node, r.dist) for r in dist.collect())


def test_bfs_matches_model(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 40
        edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(120)}
        edges = [(u, v) for u, v in edges if u != v]
        edges += [(v, u) for u, v in edges]          # undirected
        seeds = sorted(rng.sample(range(n), 3))
        for max_hops in (1, 3, 10):
            assert spark_bfs(spark, edges, seeds, max_hops) == \
                model_bfs(edges, seeds, max_hops), (trial, max_hops)


# ---- k-core peeling ---------------------------------------------------

def model_kcore(edges, k):
    """Peel to fixpoint; return {node: degree-in-core}."""
    cur = set(edges)
    while True:
        deg = defaultdict(int)
        for u, _ in cur:
            deg[u] += 1
        keep = {u for u, d in deg.items() if d >= k}
        nxt = {(u, v) for u, v in cur if u in keep and v in keep}
        if nxt == cur:
            break
        cur = nxt
    deg = defaultdict(int)
    for u, _ in cur:
        deg[u] += 1
    return sorted(deg.items())


def spark_kcore(spark, edge_list, k, max_rounds=20):
    edges = spark.createDataFrame(edge_list, "src long, dst long") \
                 .localCheckpoint(eager=True)
    n_prev = edges.select("src").distinct().count()
    for _ in range(max_rounds):
        keep = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
                     .filter(F.col("d") >= k)
                     .select(F.col("src").alias("node")))
        edges = (edges.join(keep.withColumnRenamed("node", "src"), "src",
                            "left_semi")
                      .join(keep.withColumnRenamed("node", "dst"), "dst",
                            "left_semi")
                      .localCheckpoint(eager=True))
        n_cur = edges.select("src").distinct().count()
        if n_cur == n_prev:
            break
        n_prev = n_cur
    return sorted((r.src, r.d) for r in
                  edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
                       .collect())


def test_kcore_matches_model(spark):
    rng = random.Random(9)
    for trial in range(3):
        n = 30
        und = {(rng.randrange(n), rng.randrange(n)) for _ in range(90)}
        und = [(u, v) for u, v in und if u != v]
        edges = list({*und, *[(v, u) for u, v in und]})
        for k in (2, 3, 5):
            assert spark_kcore(spark, edges, k) == model_kcore(edges, k), \
                (trial, k)


# ---- Mann-Whitney doubled ranks --------------------------------------

def model_u2(a_vals, b_vals):
    """2*U1 with average-rank ties, computed by brute-force pair
    comparison: U1 = #(a > b) + 0.5*#(a == b)."""
    u2 = 0
    for x in a_vals:
        for y in b_vals:
            u2 += 2 if x > y else (1 if x == y else 0)
    return u2


def test_mannwhitney_doubled_ranks_match_pair_count(spark):
    """The rank-sum formulation (what the query computes) equals the
    pair-count definition of U — including under heavy ties."""
    rng = random.Random(3)
    for trial in range(4):
        a = [rng.randrange(8) for _ in range(rng.randrange(5, 40))]
        b = [rng.randrange(8) for _ in range(rng.randrange(5, 40))]
        rows = [(v, 1) for v in a] + [(v, 0) for v in b]
        df = spark.createDataFrame(rows, "cent long, is_a int")
        pv = df.groupBy("cent").agg(F.count(F.lit(1)).alias("n_v"),
                                    F.sum("is_a").alias("na_v"))
        from pyspark.sql.window import Window as W
        w = W.orderBy("cent")
        r = pv.select("na_v",
                      (2 * (F.sum("n_v").over(w) - F.col("n_v"))
                       + F.col("n_v") + 1).alias("r2"))
        row = r.agg(F.sum(F.col("na_v") * F.col("r2")).alias("two_r1"),
                    F.sum("na_v").alias("n_a")).first()
        u2 = row.two_r1 - row.n_a * (row.n_a + 1)
        assert u2 == model_u2(a, b), trial


# ---- OLS rational slope ----------------------------------------------

def test_ols_rational_matches_float_fit(spark):
    rng = random.Random(7)
    for trial in range(3):
        pts = [(x, rng.randrange(-50, 500)) for x in range(20)]
        df = spark.createDataFrame(pts, "x long, y long")
        n = F.count(F.lit(1))
        row = df.agg(
            (n * F.sum(F.col("x") * F.col("y"))
             - F.sum("x") * F.sum("y")).alias("num"),
            (n * F.sum(F.col("x") * F.col("x"))
             - F.sum("x") * F.sum("x")).alias("den")).first()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        m = len(pts)
        num = m * sum(x * y for x, y in pts) - sum(xs) * sum(ys)
        den = m * sum(x * x for x in xs) - sum(xs) ** 2
        assert (row.num, row.den) == (num, den)
        # sanity: rational equals the closed-form float slope
        slope = (m * sum(x * y for x, y in pts) - sum(xs) * sum(ys)) / den
        assert abs(row.num / row.den - slope) < 1e-12
