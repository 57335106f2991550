"""Graph traversal, rank statistics, and CDC application — round-5
additions to the north-star set (SURVEY.md §2.9).

Three operator classes the reference cannot express (its dataflow is
merge/sort/range only, SURVEY.md §2.1), each with an exact-integer
cross-engine oracle:

- ``bfs_min_hops``: frontier-based multi-hop reachability (min hop
  distance), the iterative-traversal sibling of the connected-components
  loop in ``graph.py`` — oracle via DuckDB ``WITH RECURSIVE``.
- ``mannwhitney_value_shift``: Mann-Whitney U rank-sum test, the
  nonparametric distribution-shift check a data-quality pipeline runs
  between cohorts — all-integer (doubled ranks) so hashes match.
- ``cdc_apply_tombstones``: op-log application with delete tombstones
  via ``operators/core.py:apply_cdc`` — MERGE-with-DELETE, the upsert
  shape the reference's fold algebra has no arm for.
- ``kcore_parts``: iterative degree peeling to the k-core fixpoint —
  oracle by monotone fixed-depth unroll (MATERIALIZED CTE chain).
- ``ols_daily_revenue_trend``: least-squares slope as an exact BIGINT
  rational from one-pass sufficient statistics.
- ``ks_value_distance``: two-sample Kolmogorov-Smirnov distance as an
  exact rational (max CDF gap over per-value counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import load, pin_result, query

# ---------------------------------------------------------------------------
# BFS minimum hop distance (frontier expansion)
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 4
_BFS_SEED_NATION = 0

_BFS_ORACLE = f"""
WITH RECURSIVE eraw AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM eraw
  UNION ALL SELECT s AS src, c AS dst FROM eraw
),
walk AS (
  SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
  FROM customer WHERE c_nationkey = {_BFS_SEED_NATION}
  UNION
  SELECT e.dst AS node, w.dist + 1 AS dist
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < {_BFS_MAX_HOPS}
)
SELECT node // 2 AS entity_id,
       CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@query("bfs_min_hops", oracle=_BFS_ORACLE)
def bfs_min_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance (BFS, ≤{max_hops} hops) from the customers
    of one nation across the bipartite customer↔supplier trade graph
    (same edge definition as ``pagerank_customer_supplier``) — the
    supply-chain blast-radius / contact-tracing query shape.

    Frontier expansion, the canonical distributed BFS: per round, join
    ONLY the newly-reached frontier against the edge relation, drop
    already-visited nodes with a LEFT ANTI against the accumulated
    distance table, tag survivors with the round number. Node labels
    are settled the first round they appear (BFS order = hop order),
    so no re-visits and no min-recomputation.

    100 TB design: the static edge relation is partitioned by ``src``
    once and persisted — every round shuffles only the (bigint)
    frontier, which is the working-set minimum for exact BFS. The
    visited set stays distributed (anti-join, never a driver set). Per
    round one join + one anti-join + an isEmpty action on the (already
    checkpointed) new frontier for early exit; hop count bounds worst
    case. Compare the pointer-jumping CC loop (``graph.py``) — same
    loop discipline (localCheckpoint lineage cuts, single action per
    round), different fixpoint."""
    (c, o, l) = load(spark, sf_dir, "customer", "orders", "lineitem")
    raw = (l.join(o, l.l_orderkey == o.o_orderkey)
            .select((F.col("o_custkey") * 2).alias("c"),
                    (F.col("l_suppkey") * 2 + 1).alias("s"))
            .distinct())
    edges = (raw.select(F.col("c").alias("src"), F.col("s").alias("dst"))
                .unionAll(raw.select(F.col("s").alias("src"),
                                     F.col("c").alias("dst")))
                .repartition(F.col("src"))
                .persist())
    seeds = (c.filter(F.col("c_nationkey") == _BFS_SEED_NATION)
              .select((F.col("c_custkey") * 2).alias("node"),
                      F.lit(0).cast("long").alias("dist")))
    dist = seeds.localCheckpoint(eager=True)
    frontier = dist.select("node")
    for hop in range(1, _BFS_MAX_HOPS + 1):
        reached = (edges.join(frontier.withColumnRenamed("node", "src"),
                              "src")
                        .select(F.col("dst").alias("node"))
                        .distinct())
        fresh = (reached.join(dist.select("node"), "node", "left_anti")
                        .withColumn("dist", F.lit(hop).cast("long"))
                        .localCheckpoint(eager=True))
        if fresh.isEmpty():
            break
        dist = dist.unionByName(fresh).localCheckpoint(eager=False)
        frontier = fresh.select("node")
    out = dist.select(
        F.expr("node DIV 2").alias("entity_id"),
        F.when(F.col("node") % 2 == 0, "cust").otherwise("supp")
         .alias("kind"),
        "dist")
    return pin_result(out, edges)


bfs_min_hops.__doc__ = bfs_min_hops.__doc__.format(max_hops=_BFS_MAX_HOPS)


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (distribution shift between cohorts)
# ---------------------------------------------------------------------------

_MW_CENT = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


@query(
    "mannwhitney_value_shift",
    oracle=f"""
    WITH a AS (
      SELECT event_type, {_MW_CENT} AS cent
      FROM events WHERE event_type != 'view'
    ),
    b AS (SELECT {_MW_CENT} AS cent FROM events WHERE event_type = 'view'),
    pooled AS (
      SELECT event_type AS pair, cent, 1 AS is_a FROM a
      UNION ALL
      SELECT t.event_type AS pair, b.cent, 0 AS is_a
      FROM b CROSS JOIN (SELECT DISTINCT event_type FROM a) t
    ),
    pv AS (
      SELECT pair, cent, count(*) AS n_v, sum(is_a) AS na_v
      FROM pooled GROUP BY pair, cent
    ),
    r AS (
      SELECT pair, na_v,
             2 * (sum(n_v) OVER (PARTITION BY pair ORDER BY cent) - n_v)
               + n_v + 1 AS r2
      FROM pv
    ),
    agg AS (
      SELECT pair AS event_type,
             CAST(sum(na_v) AS BIGINT) AS n_a,
             CAST(sum(na_v * r2) AS BIGINT) AS two_r1
      FROM r GROUP BY pair
    ),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b)
    SELECT event_type, n_a, n_b,
           CAST(two_r1 - n_a * (n_a + 1) AS BIGINT) AS u2,
           CAST((500 * (two_r1 - n_a * (n_a + 1))) // (n_a * n_b)
                AS BIGINT) AS auc_permille
    FROM agg CROSS JOIN nb
    """)
def mannwhitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test of each event cohort's ``value``
    distribution against the 'view' cohort — the nonparametric
    drift/shift check (no normality assumption) a data-quality monitor
    runs between a treatment cohort and its control.

    Exactness: values quantize to integer cents (floor(x·100+0.5) in
    pure double math — bit-identical across engines); tied ranks use
    the average-rank convention, carried as DOUBLED ranks
    (2·rank = 2·cum_before + n_ties + 1) so everything stays integer.
    Outputs: u2 = 2·U₁ and auc_permille = ⌊1000·U₁/(n₁n₂)⌋ — the
    effect size (probability a cohort draw exceeds a control draw,
    i.e. the ROC-AUC equivalence) in exact integer permille.

    100 TB design: rows collapse to per-(cohort, cent) counts first —
    ONE map-side-combined hash agg over the raw table; the rank window
    then runs on the distinct-value relation, bounded by the price
    domain (~50k cents/pair), not the row count. For a genuinely
    unbounded value domain the cum-sum level swaps for the two-level
    distributed prefix sum of ``sequence_packing_offsets`` — the
    window here is over counts, never raw rows, which is what makes
    the statistic feasible at all when n₁n₂ ~ 10²⁴ pairs."""
    (e,) = load(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    a = (e.filter(F.col("event_type") != "view")
          .select(F.col("event_type").alias("pair"), cent.alias("cent"),
                  F.lit(1).alias("is_a")))
    b = e.filter(F.col("event_type") == "view").select(cent.alias("cent"))
    types = a.select("pair").distinct()
    pooled = a.unionByName(
        b.crossJoin(F.broadcast(types)).select("pair", "cent",
                                               F.lit(0).alias("is_a")))
    pv = (pooled.groupBy("pair", "cent")
                .agg(F.count(F.lit(1)).alias("n_v"),
                     F.sum("is_a").alias("na_v")))
    w = W.partitionBy("pair").orderBy("cent")
    r = pv.select(
        "pair", "na_v",
        (2 * (F.sum("n_v").over(w) - F.col("n_v"))
         + F.col("n_v") + 1).alias("r2"))
    agg = (r.groupBy(F.col("pair").alias("event_type"))
            .agg(F.sum("na_v").cast("long").alias("n_a"),
                 F.sum(F.col("na_v") * F.col("r2")).cast("long")
                  .alias("two_r1")))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    u2 = F.col("two_r1") - F.col("n_a") * (F.col("n_a") + 1)
    return (agg.crossJoin(F.broadcast(nb))
               .select("event_type", "n_a", "n_b",
                       u2.cast("long").alias("u2"),
                       F.expr(f"CAST((500 * (two_r1 - n_a * (n_a + 1))) "
                              f"DIV (n_a * n_b) AS BIGINT)")
                        .alias("auc_permille")))


# ---------------------------------------------------------------------------
# CDC op-log application with delete tombstones
# ---------------------------------------------------------------------------

@query(
    "cdc_apply_tombstones",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type AS last_type, value AS last_value
    FROM ranked WHERE rn = 1 AND event_type != 'error'
    """)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicate an op-log with delete tombstones into table state:
    ``events`` read as a CDC feed keyed by ``user_id`` — 'error'
    events are tombstones (erase the key), everything else upserts
    (event_type, value); commit order is (ts, event_id). A user whose
    LAST op is a tombstone is absent from the final state — the GDPR
    erasure / MERGE-WHEN-MATCHED-DELETE semantics the reference's
    fold algebra cannot express (folds only combine, never remove;
    ``operators/core.py:apply_cdc``).

    The query deliberately applies the log in TWO batches split at the
    time midpoint — state = apply(apply(∅, first half), second half) —
    proving batch composition: chained applications over any time
    partitioning equal the one-shot fold (what the oracle computes),
    because per key the greatest-ordinal op wins and batch boundaries
    respect ordinal order.

    100 TB design: each apply is one map-side-combined ``max_by`` agg
    over its batch (net effect per key: a billion-op log with 10M hot
    keys folds to 10M rows before touching the base) + the Delta-MERGE
    anti-join shape — the base never shuffles, touched keys broadcast
    when small. The midpoint threshold is a 2-value scalar agg
    (bounded collect, tpch3.py:200 precedent)."""
    from ..operators.core import KeyedTable, apply_cdc

    (e,) = load(spark, sf_dir, "events")
    lo, hi = e.agg(F.min(F.unix_micros("ts")),
                   F.max(F.unix_micros("ts"))).first()
    mid = (lo + hi) // 2
    oplog = e.select(
        "user_id",
        F.when(F.col("event_type") == "error", "delete")
         .otherwise("upsert").alias("op"),
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        F.unix_micros("ts").alias("us"))
    empty = KeyedTable(
        oplog.select("user_id", "last_type", "last_value")
             .filter(F.lit(False)),
        ("user_id",))
    first = apply_cdc(empty, oplog.filter(F.col("us") <= mid),
                      op_col="op", ord_col="ord")
    state = apply_cdc(first, oplog.filter(F.col("us") > mid),
                      op_col="op", ord_col="ord")
    return state.df


# ---------------------------------------------------------------------------
# k-core decomposition (iterative degree peeling)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_MAX_ROUNDS = 12


def _kcore_oracle() -> str:
    """Unrolled peeling: each round keeps nodes with in-subgraph degree
    >= k and filters edges to kept endpoints. Peeling is monotone —
    once the fixpoint is reached further rounds are identity — so a
    FIXED unroll >= the true round count computes the exact k-core
    (measured: 8 rounds at sf0.01; the Spark side asserts convergence
    within the same bound, so a data change that needed more rounds
    fails loudly rather than mismatching silently)."""
    ctes = ["""e0 AS MATERIALIZED (
      WITH p AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
      )
      SELECT u AS src, v AS dst FROM p
      UNION ALL SELECT v AS src, u AS dst FROM p
    )"""]
    prev = "e0"
    for i in range(1, _KCORE_MAX_ROUNDS + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT src AS node FROM {prev} "
            f"GROUP BY src HAVING count(*) >= {_KCORE_K})")
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"JOIN k{i} a ON e.src = a.node "
            f"JOIN k{i} b ON e.dst = b.node)")
        prev = f"e{i}"
    return (f"WITH {', '.join(ctes)} "
            f"SELECT src AS part_id, CAST(count(*) AS BIGINT) AS core_deg "
            f"FROM {prev} GROUP BY src")


@query("kcore_parts", oracle=_kcore_oracle())
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the repeat-co-order part graph (parts co-ordered in
    >= 2 distinct orders): iteratively peel nodes with degree < {k}
    until the surviving subgraph is stable — the classic cohesive-
    subgroup / graph-denoising primitive (the third iterative-graph
    class here, after label propagation (CC), power iteration
    (PageRank), and frontier traversal (BFS); peeling's fixpoint is a
    mutual-recursion the reference's merge/sort/range algebra cannot
    state).

    Per round: one hash agg (degrees) + one semi-join of edges against
    surviving nodes (both (bigint, bigint)-shaped, never the text or
    fact tables), localCheckpoint lineage cut, convergence = node
    count unchanged — node count is monotone non-increasing, so the
    count action doubles as the convergence witness. 100 TB: identical
    loop discipline to CC — the edge relation shrinks every round, and
    each iteration is shuffle-bounded by the CURRENT subgraph, not the
    input.

    Cross-engine exactness: the oracle unrolls {rounds} peel rounds
    (monotone ⇒ over-unrolling is identity); the Spark side asserts it
    converged within {rounds} rounds so drift fails loudly."""
    (l,) = load(spark, sf_dir, "lineitem")
    li = l.select("l_orderkey", "l_partkey")
    p = (li.alias("a")
           .join(li.alias("b"), (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                 & (F.col("a.l_partkey") < F.col("b.l_partkey")))
           .groupBy(F.col("a.l_partkey").alias("u"),
                    F.col("b.l_partkey").alias("v"))
           .agg(F.count(F.lit(1)).alias("m"))
           .filter(F.col("m") >= 2)
           .select("u", "v"))
    edges = (p.select(F.col("u").alias("src"), F.col("v").alias("dst"))
              .unionAll(p.select(F.col("v").alias("src"),
                                 F.col("u").alias("dst")))
              .localCheckpoint(eager=True))
    n_prev = edges.select("src").distinct().count()
    for _ in range(_KCORE_MAX_ROUNDS):
        keep = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
                     .filter(F.col("d") >= _KCORE_K)
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
    else:
        raise AssertionError(
            f"k-core did not converge within {_KCORE_MAX_ROUNDS} rounds — "
            f"raise _KCORE_MAX_ROUNDS (and the oracle unroll) together")
    return (edges.groupBy(F.col("src").alias("part_id"))
                 .agg(F.count(F.lit(1)).cast("long").alias("core_deg")))


kcore_parts.__doc__ = kcore_parts.__doc__.format(
    k=_KCORE_K, rounds=_KCORE_MAX_ROUNDS)


# ---------------------------------------------------------------------------
# exact-integer OLS trend (least-squares slope as a rational)
# ---------------------------------------------------------------------------

@query(
    "ols_daily_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             AS slope_den
    FROM daily GROUP BY event_type
    """)
def ols_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend of daily revenue per event type — the
    is-this-metric-drifting primitive of a pipeline health monitor —
    with the slope emitted as an EXACT RATIONAL: slope = slope_num /
    slope_den where num = nΣxy − ΣxΣy, den = nΣx² − (Σx)², x = epoch
    day, y = daily cents. No float division ever happens, so the
    driver hash-checks the regression itself (sign of slope_num = sign
    of the trend; callers divide at display time).

    Scale: two cascaded hash aggs — rows → (type, day) daily sums
    (map-side combined; the only pass over the fact table), then the
    day-level relation (bounded by types × days, thousands of rows at
    any corpus size) folds to the five OLS sums per type. This is the
    standard one-pass sufficient-statistics formulation; nothing is
    ever sorted or windowed."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    daily = (e.groupBy("event_type",
                       F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                        .cast("long").alias("x"))
              .agg(F.sum(cents).alias("y")))
    n = F.count(F.lit(1))
    return (daily.groupBy("event_type")
                 .agg(n.cast("long").alias("n_days"),
                      (n * F.sum(F.col("x") * F.col("y"))
                       - F.sum("x") * F.sum("y")).cast("long")
                      .alias("slope_num"),
                      (n * F.sum(F.col("x") * F.col("x"))
                       - F.sum("x") * F.sum("x")).cast("long")
                      .alias("slope_den")))


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample distance (exact rational)
# ---------------------------------------------------------------------------

@query(
    "ks_value_distance",
    oracle=f"""
    WITH a AS (
      SELECT event_type, {_MW_CENT} AS cent
      FROM events WHERE event_type != 'view'
    ),
    b AS (SELECT {_MW_CENT} AS cent FROM events WHERE event_type = 'view'),
    pooled AS (
      SELECT event_type AS pair, cent, 1 AS is_a FROM a
      UNION ALL
      SELECT t.event_type AS pair, b.cent, 0 AS is_a
      FROM b CROSS JOIN (SELECT DISTINCT event_type FROM a) t
    ),
    pv AS (
      SELECT pair, cent, sum(is_a) AS na_v, sum(1 - is_a) AS nb_v
      FROM pooled GROUP BY pair, cent
    ),
    cums AS (
      SELECT pair,
             sum(na_v) OVER w AS ca, sum(nb_v) OVER w AS cb
      FROM pv
      WINDOW w AS (PARTITION BY pair ORDER BY cent)
    ),
    cums2 AS (
      SELECT pair, ca, cb,
             max(ca) OVER (PARTITION BY pair) AS n_a,
             max(cb) OVER (PARTITION BY pair) AS n_b
      FROM cums
    ),
    tot AS (
      SELECT pair AS event_type,
             CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
             CAST(max(abs(n_a * cb - n_b * ca)) AS BIGINT) AS ks_num
      FROM cums2 GROUP BY pair
    )
    SELECT event_type, n_a, n_b, ks_num,
           CAST(n_a * n_b AS BIGINT) AS ks_den,
           CAST((1000 * ks_num) // (n_a * n_b) AS BIGINT) AS ks_permille
    FROM tot
    """)
def ks_value_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance of each event cohort's
    ``value`` distribution vs the 'view' cohort — the max-CDF-gap
    companion to ``mannwhitney_value_shift`` (U is sensitive to
    location shift; KS to ANY distributional difference). D = max over
    values of |F_a − F_b| carried as the exact rational

        ks_num / ks_den = max_v |n_b·cum_a(v) − n_a·cum_b(v)| / (n_a·n_b)

    — all integer, so the supremum statistic itself hash-checks
    cross-engine (plus an integer permille for display).

    100 TB design: identical shape to the U statistic — one map-side-
    combined hash agg collapses rows to per-(cohort, value) counts,
    the CDF window runs over the distinct-value relation (domain-
    bounded), and the max is one more tiny agg. Nothing rank-sorts the
    raw rows."""
    (e,) = load(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    a = (e.filter(F.col("event_type") != "view")
          .select(F.col("event_type").alias("pair"), cent.alias("cent"),
                  F.lit(1).alias("is_a")))
    b = e.filter(F.col("event_type") == "view").select(cent.alias("cent"))
    types = a.select("pair").distinct()
    pooled = a.unionByName(
        b.crossJoin(F.broadcast(types)).select("pair", "cent",
                                               F.lit(0).alias("is_a")))
    pv = (pooled.groupBy("pair", "cent")
                .agg(F.sum("is_a").alias("na_v"),
                     F.sum(1 - F.col("is_a")).alias("nb_v")))
    w = W.partitionBy("pair").orderBy("cent")
    cums = pv.select("pair", F.sum("na_v").over(w).alias("ca"),
                     F.sum("nb_v").over(w).alias("cb"))
    wp = W.partitionBy("pair")
    gaps = cums.select(
        "pair", "ca", "cb",
        F.max("ca").over(wp).alias("n_a"),
        F.max("cb").over(wp).alias("n_b"))
    out = (gaps.groupBy(F.col("pair").alias("event_type"))
               .agg(F.max("n_a").cast("long").alias("n_a"),
                    F.max("n_b").cast("long").alias("n_b"),
                    F.max(F.abs(F.col("n_a") * F.col("cb")
                                - F.col("n_b") * F.col("ca")))
                     .cast("long").alias("ks_num")))
    return out.select(
        "event_type", "n_a", "n_b", "ks_num",
        (F.col("n_a") * F.col("n_b")).cast("long").alias("ks_den"),
        F.expr("CAST((1000 * ks_num) DIV (n_a * n_b) AS BIGINT)")
         .alias("ks_permille"))


# ---------------------------------------------------------------------------
# Spearman rank correlation (doubled average ranks, exact rational)
# ---------------------------------------------------------------------------

@query(
    "spearman_spend_activity",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS spend,
             CAST(count(*) AS BIGINT) AS acts
      FROM events GROUP BY user_id
    ),
    rx AS (SELECT user_id, spend, acts,
                  2 * (sum(1) OVER (ORDER BY spend) - 1)
                    - (count(*) OVER (PARTITION BY spend) - 1) + 1 AS rx2
           FROM u),
    r AS (SELECT user_id, rx2,
                 2 * (sum(1) OVER (ORDER BY acts) - 1)
                   - (count(*) OVER (PARTITION BY acts) - 1) + 1 AS ry2
          FROM rx)
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) * sum(rx2 * ry2) - sum(rx2) * sum(ry2)
                AS BIGINT) AS cov_num,
           CAST(count(*) * sum(rx2 * rx2) - sum(rx2) * sum(rx2)
                AS BIGINT) AS var_x,
           CAST(count(*) * sum(ry2 * ry2) - sum(ry2) * sum(ry2)
                AS BIGINT) AS var_y
    FROM r
    """)
def spearman_spend_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-user total spend and
    activity count — the monotone-association check (robust to
    outliers and nonlinearity, unlike Pearson on raw cents). Emitted
    as the exact rational ρ = cov_num / √(var_x·var_y) in BIGINT
    sufficient statistics over DOUBLED average ranks (cum-count
    formulation handles ties exactly; doubling keeps tie-midpoints
    integer — the ``mannwhitney_value_shift`` discipline applied to
    correlation).

    Scale: the raw table folds to per-user aggregates first (one
    map-side-combined hash agg — the only pass over the facts); ranks
    and moments run on the user-level relation. The rank windows are
    user-cardinality-bounded; for unbounded cardinality the two-level
    prefix sum applies as everywhere else."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    u = (e.groupBy("user_id")
          .agg(F.sum(cents).cast("long").alias("spend"),
               F.count(F.lit(1)).cast("long").alias("acts")))
    # doubled average rank of v = 2*(#rows <= v) - (#ties - 1) - 1
    #                           = 2*cum - ties + 1   (1-based, ties avg)
    wx = W.orderBy("spend")
    wxp = W.partitionBy("spend")
    rx = u.select(
        "acts",
        (2 * (F.sum(F.lit(1)).over(wx) - 1)
         - (F.count(F.lit(1)).over(wxp) - 1) + 1).alias("rx2"))
    wy = W.orderBy("acts")
    wyp = W.partitionBy("acts")
    r = rx.select(
        "rx2",
        (2 * (F.sum(F.lit(1)).over(wy) - 1)
         - (F.count(F.lit(1)).over(wyp) - 1) + 1).alias("ry2"))
    n = F.count(F.lit(1))
    return r.agg(
        n.cast("long").alias("n"),
        (n * F.sum(F.col("rx2") * F.col("ry2"))
         - F.sum("rx2") * F.sum("ry2")).cast("long").alias("cov_num"),
        (n * F.sum(F.col("rx2") * F.col("rx2"))
         - F.sum("rx2") * F.sum("rx2")).cast("long").alias("var_x"),
        (n * F.sum(F.col("ry2") * F.col("ry2"))
         - F.sum("ry2") * F.sum("ry2")).cast("long").alias("var_y"))


# ---------------------------------------------------------------------------
# Benford first-digit audit (data-quality forensics)
# ---------------------------------------------------------------------------

@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit, CAST(count(*) AS BIGINT) AS n,
           CAST((1000000 * count(*)) // (sum(count(*)) OVER ())
                AS BIGINT) AS freq_ppm
    FROM d GROUP BY digit
    """)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census of order totals — the forensic
    data-quality screen (fabricated or truncated monetary data drifts
    from the log-uniform leading-digit law; auditors compare this
    distribution against log10(1+1/d)). Log-free by construction: the
    leading digit comes from the decimal string of integer cents, the
    frequency is integer parts-per-million — everything hash-checks.

    Scale: one map-side-combined count per digit (9 groups) and one
    9-row window for the total — nothing touches the fact table
    twice."""
    (o,) = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
         .cast("string"), 1, 1).cast("long")
    counts = (o.filter(F.col("o_totalprice") > 0)
               .groupBy(digit.alias("digit"))
               .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wall = W.partitionBy()
    return counts.select(
        "digit", "n",
        F.expr("CAST((1000000 * n) DIV (sum(n) OVER ()) AS BIGINT)")
         .alias("freq_ppm"))


# ---------------------------------------------------------------------------
# CUSUM change-point detection (exact scaled integers)
# ---------------------------------------------------------------------------

@query(
    "cusum_changepoint_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(coalesce(floor(value * 100 + 0.5), 0)
                           AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(y) AS BIGINT) AS s FROM daily),
    c AS (
      SELECT d, tot.n, tot.s,
             tot.n * sum(y) OVER (ORDER BY d)
               - (row_number() OVER (ORDER BY d)) * tot.s AS cusum_scaled
      FROM daily, tot
    )
    SELECT d AS change_day,
           CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
           n AS n_days, s AS total_cents
    FROM c
    ORDER BY abs(cusum_scaled) DESC, d LIMIT 1
    """)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue — the classic
    where-did-the-metric-shift estimator: the day maximizing
    |Σ_{{i<=t}} (y_i − ȳ)| splits the series at the most likely mean
    change. Scaled by n to stay integer: n·prefix_t − t·S is exactly
    n·Σ(y_i − ȳ), so the argmax (and the statistic itself) hash-checks
    with no float mean ever computed.

    Scale: the facts fold to daily sums first (one map-side-combined
    agg); CUSUM runs on the calendar-bounded day relation (the
    ``cumulative_new_users_daily`` justification), and the argmax is a
    1-row total-ordered limit."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    daily = (e.groupBy(F.to_date("ts").alias("d"))
              .agg(F.sum(cents).cast("long").alias("y")))
    tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("y").cast("long").alias("s"))
    w = W.orderBy("d")
    c = (daily.crossJoin(F.broadcast(tot))
              .select("d", "n", "s",
                      (F.col("n") * F.sum("y").over(w)
                       - F.row_number().over(w) * F.col("s"))
                      .alias("cusum_scaled")))
    return (c.orderBy(F.abs(F.col("cusum_scaled")).desc(), "d").limit(1)
             .select(F.col("d").alias("change_day"),
                     F.col("cusum_scaled").cast("long").alias("cusum_scaled"),
                     F.col("n").alias("n_days"),
                     F.col("s").alias("total_cents")))


# ---------------------------------------------------------------------------
# Walk counting (integer adjacency powers)
# ---------------------------------------------------------------------------

@query(
    "walk_counts_3hop",
    oracle=f"""
    WITH eraw AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM eraw
      UNION ALL SELECT s AS src, c AS dst FROM eraw
    ),
    v0 AS (
      SELECT c_custkey * 2 AS node, CAST(1 AS BIGINT) AS w
      FROM customer WHERE c_nationkey = {_BFS_SEED_NATION}
    ),
    v1 AS (SELECT e.dst AS node, CAST(sum(v.w) AS BIGINT) AS w
           FROM v0 v JOIN edges e ON e.src = v.node GROUP BY e.dst),
    v2 AS (SELECT e.dst AS node, CAST(sum(v.w) AS BIGINT) AS w
           FROM v1 v JOIN edges e ON e.src = v.node GROUP BY e.dst),
    v3 AS (SELECT e.dst AS node, CAST(sum(v.w) AS BIGINT) AS w
           FROM v2 v JOIN edges e ON e.src = v.node GROUP BY e.dst)
    SELECT node // 2 AS entity_id,
           CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
           w AS n_walks
    FROM v3 ORDER BY w DESC, node LIMIT 25
    """)
def walk_counts_3hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop WALK COUNTS from one nation's customers over the trade
    graph — the adjacency-matrix-power computation (A³·v as three
    join-aggregate rounds) behind influence spread, random-walk
    proximity, and graph-kernel features; all-integer, so unlike
    PageRank it needs no fixed-point scaling tricks at all. Top-25 by
    walk count = the entities most multiply-connected to the seed
    cohort (counts walks, where BFS reports only reachability).

    Scale: identical loop contract to the other graph ops — per hop
    one join of the (node, weight) vector against the src-partitioned
    persisted edges + one map-combined sum; the vector, not the graph,
    is all that moves. The oracle unrolls the same three
    matrix-vector products."""
    (c, o, l) = load(spark, sf_dir, "customer", "orders", "lineitem")
    raw = (l.join(o, l.l_orderkey == o.o_orderkey)
            .select((F.col("o_custkey") * 2).alias("c"),
                    (F.col("l_suppkey") * 2 + 1).alias("s"))
            .distinct())
    edges = (raw.select(F.col("c").alias("src"), F.col("s").alias("dst"))
                .unionAll(raw.select(F.col("s").alias("src"),
                                     F.col("c").alias("dst")))
                .repartition(F.col("src"))
                .persist())
    v = (c.filter(F.col("c_nationkey") == _BFS_SEED_NATION)
          .select((F.col("c_custkey") * 2).alias("node"),
                  F.lit(1).cast("long").alias("w")))
    for _ in range(3):
        v = (edges.join(v.withColumnRenamed("node", "src"), "src")
                  .groupBy(F.col("dst").alias("node"))
                  .agg(F.sum("w").cast("long").alias("w"))
                  .localCheckpoint(eager=False))
    out = (v.orderBy(F.col("w").desc(), "node").limit(25)
            .select(F.expr("node DIV 2").alias("entity_id"),
                    F.when(F.col("node") % 2 == 0, "cust")
                     .otherwise("supp").alias("kind"),
                    F.col("w").alias("n_walks")))
    return pin_result(out, edges)


# ---------------------------------------------------------------------------
# Maximum drawdown (running-peak shortfall, exact integers)
# ---------------------------------------------------------------------------

@query(
    "max_drawdown_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(coalesce(floor(value * 100 + 0.5), 0)
                                     AS BIGINT)
                           ELSE -CAST(coalesce(floor(value * 100 + 0.5), 0)
                                      AS BIGINT) END) AS BIGINT) AS net
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY 1
    ),
    c AS (
      SELECT d, sum(net) OVER (ORDER BY d) AS equity
      FROM daily
    ),
    dd AS (
      SELECT d, equity,
             max(equity) OVER (ORDER BY d) - equity AS drawdown
      FROM c
    )
    SELECT d AS trough_day,
           CAST(drawdown AS BIGINT) AS max_drawdown_cents,
           CAST(equity AS BIGINT) AS equity_cents
    FROM dd ORDER BY drawdown DESC, d LIMIT 1
    """)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the net daily balance (purchases credit,
    errors debit) — the peak-to-trough shortfall metric risk systems
    track on any cumulative series; here it reads as "worst cumulative
    deficit against the best day so far". All integer cents: running
    sum, running max, argmax of the gap — the statistic and its trough
    day hash-check with no float.

    Scale: facts fold to signed daily nets (one map-combined agg);
    both windows run on the calendar-bounded day relation; the answer
    is a 1-row total-ordered limit. Same family as
    ``cusum_changepoint_daily`` — CUSUM finds where the MEAN shifted,
    drawdown finds the worst excursion."""
    (e,) = load(spark, sf_dir, "events")
    cents = F.coalesce(F.floor(F.col("value") * 100 + F.lit(0.5)),
                       F.lit(0)).cast("long")
    signed = F.when(F.col("event_type") == "purchase", cents) \
              .otherwise(-cents)
    daily = (e.filter(F.col("event_type").isin("purchase", "error"))
              .groupBy(F.to_date("ts").alias("d"))
              .agg(F.sum(signed).cast("long").alias("net")))
    w = W.orderBy("d")
    c = daily.select("d", F.sum("net").over(w).alias("equity"))
    dd = c.select("d", "equity",
                  (F.max("equity").over(w) - F.col("equity"))
                  .alias("drawdown"))
    return (dd.orderBy(F.col("drawdown").desc(), "d").limit(1)
              .select(F.col("d").alias("trough_day"),
                      F.col("drawdown").cast("long")
                       .alias("max_drawdown_cents"),
                      F.col("equity").cast("long").alias("equity_cents")))
