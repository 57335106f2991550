"""Feature-engineering operators (round 3): the column-transform layer
an ML/analytics pipeline runs after cleaning and before training —
group-wise standardization, time-weighted averages, equi-width
histograms, and percentile gating.

Exactness discipline: every statistic is computed from EXACT integer
primitives (money → cents BIGINT, time → epoch micros BIGINT) so the
partial-agg sums are order-independent, and the float math applied on
top is the identical expression on both engines — bit-identical
results without any decimal/HUGEINT divergence. Integer sums stay
below 2^53 through sf100 for these columns (documented per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize, quantize_sql


@query(
    "zscore_event_values",
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM c GROUP BY event_type
    )
    SELECT c.event_id, c.event_type,
           {quantize_sql(
               "(CAST(c.cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
               " / sqrt((CAST(ss AS DOUBLE)"
               "         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
               "        / CAST(n - 1 AS DOUBLE))", 6)} AS z
    FROM c JOIN stats USING (event_type)
    """)
def zscore_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score standardization of event values — the
    bread-and-butter feature transform. Stats come from exact integer
    (cents) sums: sum and sum-of-squares are BIGINT partial aggs
    (order-independent, map-side combinable), and the final
    (v - mean)/std is one double expression evaluated identically on
    both engines. SS stays < 2^53 through ~3.7B events at this value
    range.

    Scale: one event_type-keyed agg (vocabulary-sized), broadcast back
    over the corpus — no window over the full table, no second
    corpus shuffle."""
    (e,) = load(spark, sf_dir, "events")
    c = e.select("event_id", "event_type",
                 F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                  .alias("cents"))
    stats = (c.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("cents").alias("s"),
                   F.sum(F.col("cents") * F.col("cents")).alias("ss")))
    sd, nd = F.col("s").cast("double"), F.col("n").cast("double")
    var = ((F.col("ss").cast("double") - sd * sd / nd)
           / (F.col("n") - 1).cast("double"))
    return (c.join(F.broadcast(stats), "event_type")
             .select("event_id", "event_type",
                     quantize((F.col("cents").cast("double") - sd / nd)
                              / F.sqrt(var), 6).alias("z")))


@query(
    "twap_user_daily",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS t_us,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT user_id, day,
           count(*) AS n_intervals,
           {quantize_sql(
               "CAST(CAST(sum(cents * (next_us - t_us)) AS BIGINT) AS DOUBLE)"
               " / CAST(CAST(sum(next_us - t_us) AS BIGINT) AS DOUBLE) / 100.0",
               6)} AS twap
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY user_id, day
    """)
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user-day (the TWAP of finance /
    telemetry): each event's value is weighted by how long it remained
    the latest observation (micros until the next same-day event); the
    day's last event carries no weight. Days with a single event drop
    out (no intervals).

    Exactness: cents x micros products and their sums are exact BIGINT
    (a user-day spans < 8.64e10 us, cents < 5e6 -> products < 4.3e17,
    within int64; DuckDB's HUGEINT sum is cast back). Scale: one
    (user, day) window for lead + one agg on the same key — a single
    shuffle, partition count grows with users x days."""
    (e,) = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    seq = e.select(
        "user_id", day.alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(
            W.partitionBy("user_id", day).orderBy("ts", "event_id"))
         .alias("next_us"))
    dur = F.col("next_us") - F.col("t_us")
    return (seq.filter(F.col("next_us").isNotNull())
               .groupBy("user_id", "day")
               .agg(F.count(F.lit(1)).alias("n_intervals"),
                    quantize(F.sum(F.col("cents") * dur).cast("double")
                             / F.sum(dur).cast("double") / 100.0, 6)
                     .alias("twap")))


@query(
    "order_total_histogram",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    bounds AS (
      SELECT min(cents) AS lo, max(cents) AS hi FROM c
    )
    SELECT CAST(((cents - lo) * 20) // (hi - lo + 1) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM c, bounds
    GROUP BY 1
    """)
def order_total_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of order totals. Bucket index is
    PURE integer arithmetic — ((cents - lo) * 20) div (hi - lo + 1) —
    so bucket edges are bit-identical on every engine (no float width,
    the classic histogram-disagreement bug).

    Scale: min/max is a 1-row scalar agg broadcast into the bucketing
    projection (no window), then one 20-key hash agg with map-side
    combine. Two corpus scans total (bounds + bucket), the second
    reading one pruned column."""
    (o,) = load(spark, sf_dir, "orders")
    c = o.select(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    bounds = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    bucket = F.expr("((cents - lo) * 20) div (hi - lo + 1)").cast("long")
    return (c.crossJoin(F.broadcast(bounds))
             .groupBy(bucket.alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("cents").alias("lo_cents"),
                  F.max("cents").alias("hi_cents")))


@query(
    "length_percentile_gate",
    oracle="""
    WITH gates AS (
      SELECT source,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY source
    )
    SELECT d.source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) >= p05
                              AND CAST(d.n_chars AS DOUBLE) <= p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) < p05
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
           CAST(sum(CASE WHEN CAST(d.n_chars AS DOUBLE) > p95
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_too_long
    FROM documents d JOIN gates USING (source)
    GROUP BY d.source
    """)
def length_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length gating: how many documents fall inside /
    below / above the source's own [p5, p95] length band — the
    relative-percentile outlier filter corpus pipelines prefer over
    absolute length cutoffs (sources have wildly different length
    distributions).

    Exactness: percentile_cont over integers interpolates with the
    same formula on both engines. Scale: the gate table is one row per
    source (broadcast); exact per-group percentiles sort within the
    group — at 100 TB swap in approx_percentile (the documented
    approx.py trade) or t-digest sketches."""
    (d,) = load(spark, sf_dir, "documents")
    gates = (d.groupBy("source")
              .agg(F.expr("percentile(n_chars, 0.05)").alias("p05"),
                   F.expr("percentile(n_chars, 0.95)").alias("p95")))
    nc = F.col("n_chars").cast("double")
    return (d.join(F.broadcast(gates), "source")
             .groupBy("source")
             .agg(F.count(F.lit(1)).alias("n_total"),
                  F.sum(F.when((nc >= F.col("p05")) & (nc <= F.col("p95")), 1)
                         .otherwise(0)).cast("long").alias("n_kept"),
                  F.sum(F.when(nc < F.col("p05"), 1).otherwise(0))
                   .cast("long").alias("n_too_short"),
                  F.sum(F.when(nc > F.col("p95"), 1).otherwise(0))
                   .cast("long").alias("n_too_long")))


@query(
    "global_rank_by_length",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk
    FROM documents
    """)
def global_rank_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL rank over the whole corpus (curriculum ordering:
    rank every document by a score, no sampling, no approximation)
    WITHOUT a single-partition window — the classic distributed
    total-order pattern:

    1. ``repartitionByRange`` on the rank key: range partitioner
       (sampled split points) gives partition i < partition j =>
       every row in i sorts before every row in j;
    2. per-partition counts → cumulative offsets (a P-row window,
       driver-scale, broadcast back);
    3. rank = partition offset + within-partition row_number — each
       window bounded by one partition, never the corpus.

    The naive ``row_number() OVER (ORDER BY ...)`` plans a SinglePartition
    exchange: one task sorts 100 TB. This shape keeps all P partitions
    working and is how exact ranking/percentiles ship at scale."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    key = [F.col("n_chars").desc(), F.col("doc_id")]
    ranged = (d.select("doc_id", "n_chars")
               .repartitionByRange(par, *key)
               .withColumn("pid", F.spark_partition_id()))
    offsets = (ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
                     .withColumn("offset",
                                 F.coalesce(
                                     F.sum("n").over(
                                         W.orderBy("pid")
                                          .rowsBetween(W.unboundedPreceding, -1)),
                                     F.lit(0)))
                     .select("pid", "offset"))
    wp = W.partitionBy("pid").orderBy(*key)
    return (ranged.join(F.broadcast(offsets), "pid")
                  .select("doc_id",
                          (F.col("offset") + F.row_number().over(wp))
                           .alias("rnk")))


def _z_interleave(a: str, b: str, bits: int = 16) -> str:
    """Portable bit-interleave (Morton/Z code): arithmetic only
    (div/mod/multiply), identical text in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


_Z_EXPR = _z_interleave("u16", "m16")


@query(
    "zorder_locality_buckets",
    oracle=f"""
    WITH base AS (
      SELECT user_id % 65536 AS u16,
             (epoch_us(ts) // 60000000) % 65536 AS m16
      FROM events
    ),
    z AS (SELECT u16, m16, {_Z_EXPR} // 16777216 AS zbucket FROM base)
    SELECT zbucket, count(*) AS n,
           min(u16) AS u_lo, max(u16) AS u_hi,
           min(m16) AS m_lo, max(m16) AS m_hi
    FROM z GROUP BY zbucket
    """)
def zorder_locality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for multi-dimensional data
    skipping: interleave the bits of (user, minute) into one sort key;
    writing the table ordered by it makes every file tight in BOTH
    dimensions at once, so either predicate prunes files — the
    lakehouse OPTIMIZE ZORDER BY technique, as a checkable query: per
    top-8-bit z-bucket, the (user, minute) bounding box must be narrow
    (the oracle verifies the exact same integer interleave).

    Scale: the z-value is pure integer arithmetic in whole-stage
    codegen (no UDF); the layout path is ``repartitionByRange(zval)``
    + sortWithinPartitions — the distributed total-order machinery of
    ``global_rank_by_length`` reused for physical clustering."""
    (e,) = load(spark, sf_dir, "events")
    base = e.selectExpr("user_id % 65536 AS u16",
                        "(unix_micros(ts) div 60000000) % 65536 AS m16")
    # Spark uses `div`; the shared interleave text uses `//` — translate
    z = base.selectExpr(
        "u16", "m16",
        f"({_Z_EXPR.replace('//', 'div')}) div 16777216 AS zbucket")
    return (z.groupBy("zbucket")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("u16").alias("u_lo"), F.max("u16").alias("u_hi"),
                  F.min("m16").alias("m_lo"), F.max("m16").alias("m_hi")))


@query(
    "exact_median_twopass",
    oracle="""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    n AS (SELECT count(*) AS n_rows FROM c),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
    )
    SELECT r.cents AS median_cents, n.n_rows
    FROM ranked r, n
    WHERE r.rn = (n.n_rows + 1) // 2
    """)
def exact_median_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median by distributed selection — two passes, no global
    sort: pass 1 histograms the value range into 1024 integer buckets
    (map-side combinable) and locates the bucket holding the target
    rank from driver-scale cumulative counts; pass 2 rescans ONLY that
    bucket's rows (a pushed-down range filter, ~1/1024 of the data)
    and picks the in-bucket rank with a tiny sort. This is the
    selection-algorithm answer to "exact quantiles at 100 TB": work is
    2 scans + one bucket-sized sort, versus a full shuffle-sort for
    row_number, versus approximation for the sketch. The lower median
    (rank (n+1)//2) keeps every step integer-exact.

    Driver-side state: the 1024-bucket histogram (fixed size) — the
    same pattern recurses for tighter buckets if a bucket were still
    huge (documented escape, one extra pass per 1024x)."""
    (o,) = load(spark, sf_dir, "orders")
    c = o.select(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    lo, hi, n_rows = c.agg(F.min("cents"), F.max("cents"),
                           F.count(F.lit(1))).first()
    k = (n_rows + 1) // 2
    width = max(1, (hi - lo + 1024) // 1024)
    hist = {r["b"]: r["n"] for r in
            (c.groupBy(((F.col("cents") - lo) / width).cast("long").alias("b"))
              .agg(F.count(F.lit(1)).alias("n"))).collect()}
    cum = 0
    for b in sorted(hist):
        if cum + hist[b] >= k:
            target_bucket, rank_in_bucket = b, k - cum
            break
        cum += hist[b]
    b_lo = lo + target_bucket * width
    b_hi = b_lo + width
    in_bucket = (c.filter((F.col("cents") >= b_lo) & (F.col("cents") < b_hi))
                  .orderBy("cents").limit(rank_in_bucket)
                  .orderBy(F.col("cents").desc()).limit(1))
    return in_bucket.select(F.col("cents").alias("median_cents"),
                            F.lit(n_rows).cast("long").alias("n_rows"))


@query(
    "exact_median_per_segment",
    oracle="""
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
    )
    SELECT r.seg, r.cents AS median_cents, n.n_rows
    FROM ranked r JOIN n USING (seg)
    WHERE r.rn = (n.n_rows + 1) // 2
    """)
def exact_median_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED exact median by distributed selection — the per-group
    generalization of ``exact_median_twopass``: ONE histogram pass
    builds (group, bucket) counts, the driver walks each group's
    cumulative histogram (groups x 1024 rows — small) to find its
    target bucket, and ONE filtered second pass joins the per-group
    bucket bounds (broadcast) and ranks only in-bucket rows — a window
    over ~1/1024 of each group instead of a full per-group sort.

    At 100 TB this is how you get exact per-group quantiles: two scans
    plus a bucket-sized window, versus percentile_disc's full sort per
    group, versus approx_percentile's error. All integer arithmetic."""
    (o, c) = load(spark, sf_dir, "orders", "customer")
    rows = (o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
             .select(F.col("c_mktsegment").alias("seg"),
                     F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                      .cast("long").alias("cents")))
    bounds = {r["seg"]: (r["lo"], r["hi"], r["n"]) for r in
              rows.groupBy("seg").agg(F.min("cents").alias("lo"),
                                      F.max("cents").alias("hi"),
                                      F.count(F.lit(1)).alias("n")).collect()}
    widths = {s: max(1, (hi - lo + 1024) // 1024)
              for s, (lo, hi, _n) in bounds.items()}
    w_map = F.create_map(*[x for s in bounds
                           for x in (F.lit(s), F.lit(widths[s]))])
    lo_map = F.create_map(*[x for s in bounds
                            for x in (F.lit(s), F.lit(bounds[s][0]))])
    hist = (rows.groupBy("seg",
                         ((F.col("cents") - lo_map[F.col("seg")])
                          / w_map[F.col("seg")]).cast("long").alias("b"))
                .agg(F.count(F.lit(1)).alias("n")).collect())
    by_seg: dict = {}
    for r in hist:
        by_seg.setdefault(r["seg"], {})[r["b"]] = r["n"]
    target = {}
    for s, (lo, _hi, n) in bounds.items():
        k = (n + 1) // 2
        cum = 0
        for b in sorted(by_seg[s]):
            if cum + by_seg[s][b] >= k:
                target[s] = (lo + b * widths[s],
                             lo + (b + 1) * widths[s], k - cum, n)
                break
            cum += by_seg[s][b]
    tgt = spark.createDataFrame(
        [(s, blo, bhi, rk, n) for s, (blo, bhi, rk, n) in target.items()],
        "seg string, b_lo long, b_hi long, rk long, n_rows long")
    in_bucket = rows.join(F.broadcast(tgt), "seg").filter(
        (F.col("cents") >= F.col("b_lo")) & (F.col("cents") < F.col("b_hi")))
    wr = W.partitionBy("seg").orderBy("cents")
    return (in_bucket.withColumn("rn", F.row_number().over(wr))
                     .filter(F.col("rn") == F.col("rk"))
                     .select("seg", F.col("cents").alias("median_cents"),
                             "n_rows"))


@query(
    "weighted_median_price_per_priority",
    oracle="""
    WITH j AS (
      SELECT o_orderpriority AS pri,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    pv AS (SELECT pri, cents, CAST(sum(w) AS BIGINT) AS wv
           FROM j GROUP BY 1, 2),
    c AS (
      SELECT pri, cents,
             sum(wv) OVER (PARTITION BY pri ORDER BY cents) AS cw,
             sum(wv) OVER (PARTITION BY pri) AS tw
      FROM pv
    )
    SELECT pri AS o_orderpriority,
           CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
             AS wmedian_cents,
           CAST(max(tw) AS BIGINT) AS total_weight
    FROM c GROUP BY pri
    """)
def weighted_median_price_per_priority(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """WEIGHTED exact median (price weighted by quantity, per order
    priority) by the same two-pass selection as
    ``exact_median_per_segment`` — generalized from ranks to weight
    mass: the median is the smallest value whose cumulative weight
    reaches half the total (2·cum ≥ total keeps it integer). The
    importance-weighted quantile is what quality-weighted corpus
    statistics need, and no built-in computes it exactly.

    Pass 1 histograms WEIGHT per (group, bucket) — map-side combinable
    sums, driver walks groups×1024 cumulative weights to the target
    bucket; pass 2 rescans only that bucket's rows, folds them to
    per-value weights, and takes the first value crossing the
    remaining mass with a bucket-sized window. Same scale contract as
    the unweighted selection: two scans + ~1/1024-sized window,
    never a full per-group sort."""
    (o, l) = load(spark, sf_dir, "orders", "lineitem")
    rows = (l.join(o, l.l_orderkey == o.o_orderkey)
             .select(F.col("o_orderpriority").alias("pri"),
                     F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
                      .cast("long").alias("cents"),
                     F.col("l_quantity").cast("long").alias("w")))
    bounds = {r["pri"]: (r["lo"], r["hi"], r["tw"]) for r in
              rows.groupBy("pri").agg(F.min("cents").alias("lo"),
                                      F.max("cents").alias("hi"),
                                      F.sum("w").alias("tw")).collect()}
    widths = {p: max(1, (hi - lo + 1024) // 1024)
              for p, (lo, hi, _t) in bounds.items()}
    w_map = F.create_map(*[x for p in bounds
                           for x in (F.lit(p), F.lit(widths[p]))])
    lo_map = F.create_map(*[x for p in bounds
                            for x in (F.lit(p), F.lit(bounds[p][0]))])
    hist = (rows.groupBy("pri",
                         ((F.col("cents") - lo_map[F.col("pri")])
                          / w_map[F.col("pri")]).cast("long").alias("b"))
                .agg(F.sum("w").alias("bw")).collect())
    by_pri: dict = {}
    for r in hist:
        by_pri.setdefault(r["pri"], {})[r["b"]] = r["bw"]
    target = {}
    for p, (lo, _hi, tw) in bounds.items():
        cum = 0
        for b in sorted(by_pri[p]):
            if 2 * (cum + by_pri[p][b]) >= tw:
                target[p] = (lo + b * widths[p],
                             lo + (b + 1) * widths[p], cum, tw)
                break
            cum += by_pri[p][b]
    tgt = spark.createDataFrame(
        [(p, blo, bhi, cum, tw) for p, (blo, bhi, cum, tw) in target.items()],
        "pri string, b_lo long, b_hi long, base_cum long, tw long")
    in_bucket = (rows.join(F.broadcast(tgt), "pri")
                     .filter((F.col("cents") >= F.col("b_lo"))
                             & (F.col("cents") < F.col("b_hi")))
                     .groupBy("pri", "cents", "base_cum", "tw")
                     .agg(F.sum("w").alias("wv")))
    wr = W.partitionBy("pri").orderBy("cents")
    crossing = (in_bucket
                .withColumn("cw", F.sum("wv").over(wr) + F.col("base_cum"))
                .filter(2 * F.col("cw") >= F.col("tw"))
                .groupBy(F.col("pri").alias("o_orderpriority"))
                .agg(F.min("cents").cast("long").alias("wmedian_cents"),
                     F.max("tw").cast("long").alias("total_weight")))
    return crossing


_PCT_GRID = [25, 50, 75, 90, 99]


@query(
    "exact_percentile_grid",
    oracle=f"""
    WITH c AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    n AS (SELECT count(*) AS n_rows FROM c),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM c
    ),
    ps AS (SELECT unnest([{", ".join(map(str, _PCT_GRID))}]) AS p)
    SELECT CAST(ps.p AS BIGINT) AS p,
           r.cents AS pct_cents,
           CAST(n.n_rows AS BIGINT) AS n_rows
    FROM ps, n
    JOIN ranked r ON r.rn = n.n_rows * ps.p // 100 + 1
    """)
def exact_percentile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentile VECTOR (p25/p50/p75/p90/p99) in the same two
    passes as one median — the multi-quantile generalization of
    ``exact_median_twopass``: a single histogram pass locates ALL five
    target buckets from one cumulative walk, and a single second scan
    (filtered to the union of target buckets — ≤5/1024 of the data,
    pushed to the parquet scan) ranks each bucket independently. The
    point at scale: an exact p99 costs no more than an exact median,
    and five quantiles cost two scans total, not ten — versus one full
    sort, or approx_percentile's error on the tail where it matters
    most. Ranks are 1-based order statistics k = n·p//100 + 1, all
    integer."""
    (o,) = load(spark, sf_dir, "orders")
    c = o.select(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                  .cast("long").alias("cents"))
    lo, hi, n_rows = c.agg(F.min("cents"), F.max("cents"),
                           F.count(F.lit(1))).first()
    width = max(1, (hi - lo + 1024) // 1024)
    hist = {r["b"]: r["n"] for r in
            (c.groupBy(((F.col("cents") - lo) / width).cast("long").alias("b"))
              .agg(F.count(F.lit(1)).alias("n"))).collect()}
    targets = []                      # (p, b_lo, b_hi, rank_in_bucket)
    ks = sorted((n_rows * p // 100 + 1, p) for p in _PCT_GRID)
    cum = 0
    it = iter(sorted(hist))
    b = next(it)
    for k, p in ks:                   # one walk serves every quantile
        while cum + hist[b] < k:
            cum += hist[b]
            b = next(it)
        targets.append((p, lo + b * width, lo + (b + 1) * width, k - cum))
    tgt = spark.createDataFrame(
        targets, "p long, b_lo long, b_hi long, rk long")
    in_bucket = (c.join(F.broadcast(tgt),
                        (F.col("cents") >= F.col("b_lo"))
                        & (F.col("cents") < F.col("b_hi"))))
    wr = W.partitionBy("p").orderBy("cents")
    return (in_bucket.withColumn("rn", F.row_number().over(wr))
                     .filter(F.col("rn") == F.col("rk"))
                     .select("p", F.col("cents").alias("pct_cents"),
                             F.lit(n_rows).cast("long").alias("n_rows")))


_TE_M = 10   # smoothing prior strength (pseudo-observations of the
             # global mean) for the smoothed encoding


@query(
    "target_encoding_loo",
    oracle=f"""
    WITH per_cust AS (
      SELECT c.c_custkey, c.c_mktsegment AS segment,
             CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS target
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    seg AS (
      SELECT segment, count(*) AS seg_n,
             CAST(sum(target) AS BIGINT) AS seg_sum
      FROM per_cust GROUP BY segment
    ),
    tot AS (SELECT count(*) AS n, CAST(sum(target) AS BIGINT) AS s
            FROM per_cust)
    SELECT p.c_custkey, p.segment,
           CAST(s.seg_sum - p.target AS BIGINT) AS loo_num,
           CAST(s.seg_n - 1 AS BIGINT) AS loo_den,
           floor((CAST(s.seg_sum - p.target AS DOUBLE) / (s.seg_n - 1))
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS loo_cents,
           floor((CAST((s.seg_sum - p.target) * (SELECT n FROM tot)
                       + {_TE_M} * (SELECT s FROM tot) AS DOUBLE)
                  / (CAST((SELECT n FROM tot) AS DOUBLE)
                     * (s.seg_n - 1 + {_TE_M})))
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS smoothed_cents
    FROM per_cust p JOIN seg s ON s.segment = p.segment
    """)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the standard high-cardinality
    categorical feature for tabular ML (each row's category replaced
    by the mean target of the OTHER rows in its category, so the
    feature never leaks the row's own label), plus the
    {_TE_M}-pseudo-observation smoothed variant that shrinks sparse
    categories toward the global mean (the micci-barreca encoding).
    Target = customer's total order cents; category = market segment.
    The LOO value is emitted as an exact BIGINT rational
    (loo_num/loo_den) AND quantized cents; the smoothed variant's
    numerator/denominator are exact integer products (global count ×
    category residual + prior × global sum), so the one double
    division per row is correctly rounded identically on both
    engines.

    Scale: one per-customer agg over the fact join, one
    category-bounded agg, a 1-row global broadcast, then a broadcast
    join back — each row's encoding is O(1); no window, no self-join,
    no shuffle of the fact table beyond the first agg."""
    (c, o) = load(spark, sf_dir, "customer", "orders")
    per_cust = (c.join(o, o["o_custkey"] == c["c_custkey"])
                 .groupBy(F.col("c_custkey"),
                          F.col("c_mktsegment").alias("segment"))
                 .agg(F.sum(F.floor(F.col("o_totalprice") * 100
                                    + F.lit(0.5)).cast("long"))
                       .cast("long").alias("target")))
    seg = (per_cust.groupBy("segment")
                   .agg(F.count(F.lit(1)).alias("seg_n"),
                        F.sum("target").cast("long").alias("seg_sum")))
    tot = per_cust.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("target").cast("long").alias("s"))
    j = (per_cust.join(F.broadcast(seg), "segment")
                 .crossJoin(F.broadcast(tot)))
    loo_num = (F.col("seg_sum") - F.col("target")).cast("long")
    loo_den = (F.col("seg_n") - 1).cast("long")
    sm_num = (loo_num * F.col("n") + F.lit(_TE_M) * F.col("s"))
    sm_den = (F.col("n").cast("double")
              * (F.col("seg_n") - 1 + F.lit(_TE_M)))
    return j.select(
        "c_custkey", "segment",
        loo_num.alias("loo_num"), loo_den.alias("loo_den"),
        quantize(loo_num.cast("double") / loo_den, 2).alias("loo_cents"),
        quantize(sm_num.cast("double") / sm_den, 2)
          .alias("smoothed_cents"))
