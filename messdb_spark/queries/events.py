"""Event-stream analytics over the ``events`` table (batch shape;
the Structured Streaming variants live in ``messdb_spark.streaming``).
Time parity: Spark ``unix_micros`` == DuckDB ``epoch_us`` exactly, so
gap logic compares as integers, no FP drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import query, load, quantize


@query(
    "events_hourly_stats",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n,
           floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming
    windowed agg): truncate-to-hour + hash agg, one shuffle."""
    (e,) = load(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  quantize(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2)
                   .alias("total_value"),
                  F.countDistinct("user_id").alias("n_users")))


@query(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session boundaries via lag + window,
    then per-user rollup. Micro-second integer arithmetic on both
    engines — exact parity. Scale: one shuffle on user_id serves both
    the window and the final agg (same partitioning, Catalyst reuses)."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.unix_micros(F.col("ts")) - prev) > 1_800_000_000), 1)
         .otherwise(0))
    return (flagged.groupBy("user_id")
                   .agg(F.sum("new_session").alias("n_sessions"),
                        F.count(F.lit(1)).alias("n_events")))


@query(
    "events_top_event_per_user",
    oracle="""
    SELECT user_id, event_id AS top_event_id, floor((value) * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE) AS top_value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rk
      FROM events
    ) WHERE rk = 1
    """)
def events_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax per group (max_by analog, rank form for determinism)."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (e.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") == 1)
             .select("user_id", F.col("event_id").alias("top_event_id"),
                     quantize("value", 2).alias("top_value")))


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           floor((CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / count(json_extract_string(props, '$.k'))) * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON props column → typed field →
    agg (JVM-side get_json_object, no UDF)."""
    (e,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.groupBy("event_type")
             .agg(quantize(F.sum(k).cast("double") / F.count(k), 6).alias("avg_k"),
                  F.max(k).alias("max_k")))


@query(
    "events_funnel_view_purchase",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT fv.user_id, fv.first_view, min(e.ts) AS first_purchase
      FROM fv JOIN events e
        ON e.user_id = fv.user_id AND e.event_type = 'purchase'
           AND e.ts > fv.first_view
      GROUP BY fv.user_id, fv.first_view
    )
    SELECT (SELECT count(*) FROM fv) AS n_viewers,
           count(*) AS n_converted,
           CAST(sum(CASE WHEN epoch_us(first_purchase) - epoch_us(first_view)
                              <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted_1h
    FROM conv
    """)
def events_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel: users whose first 'view' is later followed by a
    'purchase', and how many convert within one hour — the
    sequential-pattern analytics (A-then-B-within-T) a product or
    training-telemetry pipeline runs constantly.

    Exactness: boundaries compare in integer microseconds (the
    sessionization discipline). Scale: two hash aggs + one equi-join
    on user_id; the purchase side prunes to one event_type at the
    scan; output is a single row of counters."""
    (e,) = load(spark, sf_dir, "events")
    fv = (e.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    conv = (fv.join(e.filter(F.col("event_type") == "purchase"), "user_id")
              .filter(F.col("ts") > F.col("first_view"))
              .groupBy("user_id", "first_view")
              .agg(F.min("ts").alias("first_purchase")))
    n_viewers = fv.agg(F.count(F.lit(1)).alias("n_viewers"))
    within = (F.unix_micros(F.col("first_purchase"))
              - F.unix_micros(F.col("first_view"))) <= 3_600_000_000
    stats = conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sum(F.when(within, 1).otherwise(0)).cast("long").alias("n_converted_1h"))
    return n_viewers.crossJoin(stats).select(
        "n_viewers", "n_converted", "n_converted_1h")


@query(
    "events_retention_cohorts",
    oracle="""
    WITH cohort AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    )
    SELECT c.cohort_week,
           CAST(date_diff('day', c.cohort_week, a.wk) // 7 AS BIGINT)
             AS week_offset,
           count(*) AS n_users
    FROM cohort c JOIN activity a USING (user_id)
    GROUP BY c.cohort_week, week_offset
    """)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen week, and
    for each later week how many were active — the cohort table every
    usage dashboard draws.

    Exactness: both engines truncate weeks to Monday and the offset is
    integer day-arithmetic. Scale: one agg for cohorts, one distinct
    for (user, week) activity, one join on user_id, one final agg —
    all hash-partitioned on user/cohort keys; no windows."""
    (e,) = load(spark, sf_dir, "events")
    cohort = (e.groupBy("user_id")
               .agg(F.date_trunc("week", F.min("ts")).cast("date")
                     .alias("cohort_week")))
    activity = (e.select("user_id",
                         F.date_trunc("week", F.col("ts")).cast("date")
                          .alias("wk"))
                 .distinct())
    j = cohort.join(activity, "user_id")
    return (j.groupBy("cohort_week",
                      F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
                       .cast("long").alias("week_offset"))
             .agg(F.count(F.lit(1)).alias("n_users")))


@query(
    "events_gap_fill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
             FROM hourly GROUP BY 1),
    grid AS (SELECT user_id,
                    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
             FROM span)
    SELECT g.user_id, g.hour,
           COALESCE(h.n_events, 0) AS n_events,
           h.n_events IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
    """)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-user hourly event
    counts on a dense hour grid between each user's first and last
    active hour; missing hours materialize as zero-count gap rows —
    the prerequisite for any window/EWMA feature over regular series.

    Scale: the dense grid is generated by exploding sequence() over
    the per-user span AGGREGATE (one tiny row per user), never over
    raw events, and the left join back to hourly counts is a plain
    equi-join hash-partitioned on (user_id, hour). Grid size is
    bounded by users x span-hours, independent of event count. At
    100 TB you'd clamp the span (or bucket users) before densifying —
    the explode is the only row-amplifying step and it is map-only."""
    (e,) = load(spark, sf_dir, "events")
    hourly = (e.groupBy("user_id",
                        F.date_trunc("hour", F.col("ts")).alias("hour"))
               .agg(F.count(F.lit(1)).alias("n_events")))
    span = hourly.groupBy("user_id").agg(F.min("hour").alias("h0"),
                                         F.max("hour").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
         .alias("hour"))
    return (grid.join(hourly, ["user_id", "hour"], "left")
                .select("user_id", "hour",
                        F.coalesce("n_events", F.lit(0).cast("long"))
                         .alias("n_events"),
                        F.col("n_events").isNull().alias("is_gap")))


@query(
    "active_sessions_per_hour",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id,
             ts
      FROM flagged
    ),
    spans AS (
      SELECT user_id, session_id,
             date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM sess GROUP BY user_id, session_id
    ),
    grid AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM spans
    )
    SELECT hour, count(*) AS n_active_sessions
    FROM grid GROUP BY hour
    """)
def active_sessions_per_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrency profile: how many user sessions were active in each
    hour — the load-curve / capacity metric. Composition: the
    sessionization flags feed a running sum (session ids), sessions
    collapse to [start, end] spans, each span explodes to its covered
    hours, one final count per hour.

    Scale: this is the sweep-line problem solved WITHOUT a global
    time-ordered window — the explode amplifies by span-hours (bounded
    per session by the 30-min gap rule: a session spans roughly its
    event count), and the final agg is hash-partitioned on hour. The
    user_id shuffle is reused by lag, running sum, and span agg (same
    partitioning, Catalyst plans one exchange)."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = e.select(
        "user_id", "ts", "event_id",
        F.when(prev.isNull()
               | ((F.unix_micros(F.col("ts")) - prev) > 1_800_000_000), 1)
         .otherwise(0).alias("new_session"))
    run = (W.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, 0))
    sess = flagged.select(
        "user_id", "ts", F.sum("new_session").over(run).alias("session_id"))
    spans = (sess.groupBy("user_id", "session_id")
                 .agg(F.date_trunc("hour", F.min("ts")).alias("h0"),
                      F.date_trunc("hour", F.max("ts")).alias("h1")))
    return (spans.select(F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
                .alias("hour"))
                 .groupBy("hour")
                 .agg(F.count(F.lit(1)).alias("n_active_sessions")))


@query(
    "asof_tolerance_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
                THEN v.event_id END AS attributed_view_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
                THEN v.ts END AS attributed_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts < p.ts
    """)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas ``merge_asof``'s
    ``tolerance=`` in pure DataFrame form): each purchase attributes to
    the latest strictly-earlier view by the same user ONLY if it
    happened within 10 minutes; otherwise the attribution columns stay
    NULL (the purchase row survives — left semantics).

    Correct because as-of picks the LATEST earlier view: if that one
    is outside tolerance, every earlier one is too, so post-filtering
    the single as-of match equals filtering before matching. Same
    single user_id shuffle as ``asof_join_purchase_view``.

    Ordering: at equal ts, purchases sort BEFORE views (the literal
    rank) so the frame only ever carries strictly-earlier views —
    matching the oracle's strict ``v.ts < p.ts``."""
    (e,) = load(spark, sf_dir, "events")
    ev = (e.filter(F.col("event_type").isin("purchase", "view"))
           .select("event_id", "user_id", "ts", "event_type"))
    w = (W.partitionBy("user_id")
          .orderBy("ts",
                   F.when(F.col("event_type") == "purchase", 0).otherwise(1),
                   "event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    j = (ev.withColumn("v_id", F.last(view_id, ignorenulls=True).over(w))
           .withColumn("v_ts", F.last(view_ts, ignorenulls=True).over(w)))
    within = (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("v_ts"))
              <= 600_000_000)
    return (j.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"), "user_id",
                     F.when(within, F.col("v_id")).alias("attributed_view_id"),
                     F.when(within, F.col("v_ts")).alias("attributed_view_ts")))


@query(
    "rollup_cascade_daily",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, count(*) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1
    )
    SELECT CAST(date_trunc('day', hour) AS DATE) AS day,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0
             AS total_value,
           count(*) AS n_active_hours,
           CAST(max(n) AS BIGINT) AS peak_hour_events
    FROM hourly GROUP BY 1
    """)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: the daily continuous aggregate
    is computed FROM the hourly one, not from raw events — the
    timescale pattern where each coarser tier re-aggregates the tier
    below (hours/day = 24 rows vs raw events/day = millions at scale).
    With the engine's memo layer the hourly tier materializes once and
    every coarser tier (and dashboard query) reuses it by content hash.

    Exactness: counts and cents are BIGINT all the way up — re-
    aggregation is exactly associative, so the cascade equals the
    direct daily aggregate bit-for-bit. Scale: the second shuffle
    carries one row per active hour, ~events/3600."""
    (e,) = load(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                           .cast("long")).alias("cents")))
    return (hourly.groupBy(F.date_trunc("day", "hour").cast("date")
                            .alias("day"))
                  .agg(F.sum("n").alias("n_events"),
                       (F.sum("cents").cast("double") / 100.0)
                        .alias("total_value"),
                       F.count(F.lit(1)).alias("n_active_hours"),
                       F.max("n").alias("peak_hour_events")))


@query(
    "nearest_event_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           (SELECT min(abs(epoch_us(v.ts) - epoch_us(p.ts)))
            FROM events v
            WHERE v.event_type = 'view' AND v.user_id = p.user_id
              AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 600000000)
             AS nearest_view_dist_us
    FROM events p WHERE p.event_type = 'purchase'
    """)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, ``direction='nearest'`` (pandas ``merge_asof``'s
    third mode, completing backward/forward): each purchase reports its
    temporal distance to the CLOSEST view by the same user in either
    direction, within a ±10-minute tolerance (NULL when none).

    The nearest view is necessarily either the latest view at-or-before
    or the earliest view after the purchase, so two frames over ONE
    user_id-partitioned ordering (equal-ts views ranked before
    purchases, so ties land in the 'before' frame) replace any range
    join: last(view_ts) over (-inf, -1) and first(view_ts) over
    (1, +inf), then least() of the two gaps. One shuffle, state
    bounded per user — the oracle's correlated range scan done
    scalably. Distances (not view ids) are the output: at equal
    distance the id choice is arbitrary on both engines, the distance
    is unique."""
    (e,) = load(spark, sf_dir, "events")
    ev = (e.filter(F.col("event_type").isin("purchase", "view"))
           .select("event_id", "user_id", "ts", "event_type"))
    # views sort BEFORE purchases at equal ts: an equal-ts view is a
    # valid dist-0 match and must be visible in the preceding frame
    order = ["ts",
             F.when(F.col("event_type") == "view", 0).otherwise(1),
             "event_id"]
    wb = (W.partitionBy("user_id").orderBy(*order)
           .rowsBetween(W.unboundedPreceding, -1))
    wf = (W.partitionBy("user_id").orderBy(*order)
           .rowsBetween(1, W.unboundedFollowing))
    vt = F.when(F.col("event_type") == "view", F.unix_micros(F.col("ts")))
    j = (ev.withColumn("prev_us", F.last(vt, ignorenulls=True).over(wb))
           .withColumn("next_us", F.first(vt, ignorenulls=True).over(wf)))
    t_us = F.unix_micros(F.col("ts"))
    dist = F.least(t_us - F.col("prev_us"), F.col("next_us") - t_us)
    return (j.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"), "user_id",
                     F.when(dist <= 600_000_000, dist)
                      .alias("nearest_view_dist_us")))


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (SELECT cur, nxt, count(*) AS n FROM seq
          WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM c GROUP BY cur)
    SELECT c.cur, c.nxt, c.n,
           floor((CAST(c.n AS DOUBLE) / CAST(t.n_cur AS DOUBLE))
                 * CAST(1000000.0 AS DOUBLE) + 0.5) / CAST(1000000.0 AS DOUBLE)
             AS p
    FROM c JOIN tot t USING (cur)
    """)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the behavioral model
    behind funnel design and next-event prediction features, and the
    sequence analog of the corpus bigram LM.

    Scale: one user_id window (lead) shares the shuffle with nothing
    else but is the only corpus-wide operation; the count matrix is
    |event_types|² rows, and the marginal re-aggregates the matrix
    (no second corpus pass) then broadcasts into the divide."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(F.col("event_type").alias("cur"),
                   F.lead("event_type").over(w).alias("nxt"))
    c = (seq.filter(F.col("nxt").isNotNull())
            .groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n")))
    tot = c.groupBy("cur").agg(F.sum("n").alias("n_cur"))
    return (c.join(F.broadcast(tot), "cur")
             .select("cur", "nxt", "n",
                     quantize(F.col("n").cast("double")
                              / F.col("n_cur").cast("double"), 6).alias("p")))


@query(
    "debounce_event_dedup",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, event_type, ts,
             lag(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT event_id, user_id, event_type, ts
    FROM seq
    WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 60000000
    """)
def debounce_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / rate-limit dedup: drop an event when the same
    (user, type) fired within the previous minute — the telemetry
    de-noising pass that removes double-clicks, retry storms, and
    sensor chatter while keeping the first occurrence of each burst.
    Distinct from exact dedup (different event_ids!) and from
    watermark dedup (keys equal): here SIMILARITY IS TEMPORAL.

    Note the chained semantics: the gap compares to the previous RAW
    event, not the previous survivor — a long burst collapses to its
    first event only if no internal gap exceeds the window, matching
    the lag-based oracle exactly. One (user_id, event_type) window,
    integer-microsecond arithmetic — exact and single-shuffle."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (e.withColumn("_prev", prev)
             .filter(F.col("_prev").isNull()
                     | ((F.unix_micros(F.col("ts")) - F.col("_prev"))
                        > 60_000_000))
             .select("event_id", "user_id", "event_type", "ts"))


@query(
    "sequence_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'view' THEN 'v'
                                        WHEN 'click' THEN 'c'
                                        WHEN 'purchase' THEN 'p'
                                        ELSE 'x' END, ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN regexp_matches(s, 'v[^p]*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view_then_purchase,
           CAST(sum(CASE WHEN regexp_matches(s, 'vc+p') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view_click_purchase,
           CAST(sum(CASE WHEN regexp_matches(s, 'p.*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat_purchasers
    FROM seq
    """)
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE class):
    each user's journey compresses to a character string in strict
    event order, and behavioral patterns become REGEXES over it —
    view-then-eventual-purchase, view→clicks→purchase funnels, repeat
    purchasing. Arbitrary-step sequences in one query, where the
    funnel/transition operators cover 1-2 steps.

    Exactness: the string is built in (ts, event_id) order on both
    engines (sort_array of structs here, string_agg ORDER BY there) —
    same string, same Java/RE2-portable regex results. Scale: one
    user-keyed agg; the journey string is per-user bounded; regexes
    run in whole-stage codegen over it."""
    (e,) = load(spark, sf_dir, "events")
    ch = (F.when(F.col("event_type") == "view", "v")
           .when(F.col("event_type") == "click", "c")
           .when(F.col("event_type") == "purchase", "p")
           .otherwise("x"))
    seq = (e.select("user_id", F.struct(F.col("ts"), F.col("event_id"),
                                        ch.alias("ch")).alias("evt"))
            .groupBy("user_id")
            .agg(F.concat_ws("", F.expr(
                "transform(array_sort(collect_list(evt)), x -> x.ch)"))
                 .alias("s")))
    return seq.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("s").rlike("v[^p]*p"), 1).otherwise(0))
         .cast("long").alias("n_view_then_purchase"),
        F.sum(F.when(F.col("s").rlike("vc+p"), 1).otherwise(0))
         .cast("long").alias("n_view_click_purchase"),
        F.sum(F.when(F.col("s").rlike("p.*p"), 1).otherwise(0))
         .cast("long").alias("n_repeat_purchasers"))


@query(
    "cumulative_new_users_daily",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    per_day AS (SELECT d, count(*) AS new_users FROM first_seen GROUP BY d)
    SELECT d AS day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY d) AS BIGINT)
             AS distinct_users_to_date
    FROM per_day
    """)
def cumulative_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, first-time users plus the running
    count of distinct users ever seen — the cumulative-distinct curve
    that naive ``count(DISTINCT) OVER (ORDER BY day)`` cannot compute
    (distinct is not sum-decomposable over a running frame). The
    standard exact reformulation: distinct-to-date == Σ first-seen —
    min-per-user turns an unbounded distinct-union problem into a
    map-side-combined hash agg plus a DAY-level running sum.

    Scale: the only pass over the fact table is min(date) per user;
    the window runs on the per-day relation (calendar-bounded — tens
    of thousands of rows for decades), so the single-partition window
    is bounded by TIME, not data (q11-lesson compliant)."""
    (e,) = load(spark, sf_dir, "events")
    first_seen = (e.groupBy("user_id")
                   .agg(F.min(F.to_date("ts")).alias("d")))
    per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_users"))
    w = W.orderBy("d")
    return per_day.select(
        F.col("d").alias("day"), "new_users",
        F.sum("new_users").over(w).cast("long")
         .alias("distinct_users_to_date"))


@query(
    "rolling_7d_active_users",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day, CAST(count(DISTINCT ud.user_id) AS BIGINT)
             AS active_7d
    FROM days JOIN ud
      ON ud.d <= days.d AND ud.d >= days.d - INTERVAL 6 DAY
    GROUP BY days.d
    """)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users (WAU) per day — the health metric
    whose sliding DISTINCT makes it non-decomposable: a user active on
    3 of the 7 days must count once, so no running sum works (contrast
    ``trailing_week_revenue``, whose sum decomposes).

    Exact formulation: dedup to user-days (one map-side-combined agg —
    the only pass over the facts), then each user-day contributes to
    the ≤7 calendar days whose window covers it: an equi-join on a
    generated day offset (explode of a 7-element sequence — bounded
    fan-out, NOT a range join), then count distinct users per day.
    Cost is |user-days|·7 rows of (date, bigint) — the exact-WAU
    lower bound without sketches; the HLL path (``queries/approx``)
    is the approximate alternative when even that is too much.

    Scale: every shuffle key is (day) or (user_id, day); the fan-out
    join is a projection, no window, no SinglePartition anywhere."""
    (e,) = load(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.expr("sequence(d, date_add(d, 6))")).alias("day"))
    return (contrib.join(days.withColumnRenamed("d", "day"), "day",
                         "left_semi")
                   .groupBy("day")
                   .agg(F.countDistinct("user_id").cast("long")
                         .alias("active_7d")))


@query(
    "event_trigram_patterns",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type AS t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1, t2, t3 LIMIT 20
    """)
def event_trigram_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral TRIGRAMS — three consecutive actions per user
    in (ts, event_id) order — the sequential-pattern mining step
    between bigram transition matrices (``event_transition_matrix``)
    and full sequence models; product analytics reads these as the
    dominant micro-journeys.

    Scale: the lead window partitions by user (bounded per-user
    history — the ``user_event_sequences`` justification), trigram
    counting is one map-side-combined hash agg over 3-token strings,
    and the top-k is a total-ordered limit (count + lexicographic
    tiebreak so both engines pick identical rows)."""
    (e,) = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (e.select("user_id", "event_type",
                    F.lead("event_type", 1).over(w).alias("t2"),
                    F.lead("event_type", 2).over(w).alias("t3"))
            .filter(F.col("t3").isNotNull()))
    return (seq.groupBy(F.col("event_type").alias("t1"), "t2", "t3")
               .agg(F.count(F.lit(1)).cast("long").alias("n"))
               .orderBy(F.col("n").desc(), "t1", "t2", "t3").limit(20))


@query(
    "conversion_time_percentiles",
    oracle="""
    WITH fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    conv AS (
      SELECT fv.user_id,
             (epoch_us(min(e.ts)) - epoch_us(fv.first_view)) // 1000000
               AS secs
      FROM fv JOIN events e
        ON e.user_id = fv.user_id AND e.event_type = 'purchase'
           AND e.ts > fv.first_view
      GROUP BY fv.user_id, fv.first_view
    ),
    seg AS (
      SELECT c_mktsegment AS segment, secs FROM conv
      JOIN customer ON user_id = c_custkey
    ),
    n AS (SELECT segment, count(*) AS n_conv FROM seg GROUP BY segment),
    ranked AS (
      SELECT segment, secs,
             row_number() OVER (PARTITION BY segment ORDER BY secs) AS rn
      FROM seg
    )
    SELECT n.segment, CAST(n.n_conv AS BIGINT) AS n_conv,
           med.secs AS median_secs, p90.secs AS p90_secs
    FROM n
    JOIN ranked med ON med.segment = n.segment
                   AND med.rn = n.n_conv // 2 + 1
    JOIN ranked p90 ON p90.segment = n.segment
                   AND p90.rn = least(n.n_conv, n.n_conv * 9 // 10 + 1)
    """)
def conversion_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per market segment: seconds from a
    user's first view to their first subsequent purchase, summarized
    as EXACT median and p90 order statistics (rank k = n·p div 100 + 1
    over integer seconds — no interpolation, engine-portable). The
    funnel-rate sibling (``events_funnel_view_purchase``) counts
    conversions; this one characterizes their latency.

    Scale: two hash aggs + one user join produce a converted-users
    relation (user-cardinality); the segment join broadcasts customer;
    the rank windows run over per-segment converted users only."""
    (e, c) = load(spark, sf_dir, "events", "customer")
    fv = (e.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    conv = (fv.join(e.filter(F.col("event_type") == "purchase"), "user_id")
              .filter(F.col("ts") > F.col("first_view"))
              .groupBy("user_id", "first_view")
              .agg(F.min("ts").alias("first_purchase"))
              .select("user_id",
                      ((F.unix_micros("first_purchase")
                        - F.unix_micros("first_view"))
                       / F.lit(1000000)).cast("long").alias("secs")))
    seg = (conv.join(F.broadcast(c),
                     F.col("user_id") == F.col("c_custkey"))
               .select(F.col("c_mktsegment").alias("segment"), "secs"))
    n = seg.groupBy("segment").agg(F.count(F.lit(1)).alias("n_conv"))
    ranked = seg.withColumn(
        "rn", F.row_number().over(W.partitionBy("segment").orderBy("secs")))
    med = (ranked.alias("m")
           .join(F.broadcast(n.alias("nm")),
                 (F.col("m.segment") == F.col("nm.segment"))
                 & (F.col("m.rn") == F.expr("nm.n_conv div 2") + 1))
           .select(F.col("m.segment").alias("segment"),
                   F.col("nm.n_conv").alias("n_conv"),
                   F.col("m.secs").alias("median_secs")))
    p90 = (ranked.alias("p")
           .join(F.broadcast(n.alias("np")),
                 (F.col("p.segment") == F.col("np.segment"))
                 & (F.col("p.rn") == F.least(
                     F.col("np.n_conv"),
                     F.expr("np.n_conv * 9 div 10") + 1)))
           .select(F.col("p.segment").alias("segment2"),
                   F.col("p.secs").alias("p90_secs")))
    return (med.join(p90, F.col("segment") == F.col("segment2"))
               .select("segment", "n_conv", "median_secs", "p90_secs"))


@query(
    "km_survival_time_to_purchase",
    oracle="""
    WITH bounds AS (SELECT max(ts) AS t_end FROM events),
    fv AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
      SELECT fv.user_id, fv.first_view, min(e.ts) AS first_purchase
      FROM fv JOIN events e
        ON e.user_id = fv.user_id AND e.event_type = 'purchase'
           AND e.ts > fv.first_view
      GROUP BY fv.user_id, fv.first_view
    ),
    u AS (
      SELECT fv.user_id, c.c_mktsegment AS segment,
             CASE WHEN fp.first_purchase IS NOT NULL
                  THEN (epoch_us(fp.first_purchase)
                        - epoch_us(fv.first_view)) // 3600000000
                  ELSE (epoch_us(b.t_end)
                        - epoch_us(fv.first_view)) // 3600000000
             END AS dur_h,
             CASE WHEN fp.first_purchase IS NOT NULL THEN 1 ELSE 0 END
               AS converted
      FROM fv
      LEFT JOIN fp ON fp.user_id = fv.user_id
      JOIN customer c ON fv.user_id = c.c_custkey
      CROSS JOIN bounds b
    ),
    seg_n AS (SELECT segment, count(*) AS total FROM u GROUP BY segment),
    at_t AS (
      SELECT segment, dur_h AS t, count(*) AS n_here,
             CAST(sum(converted) AS BIGINT) AS d
      FROM u GROUP BY segment, dur_h
    ),
    risk AS (
      SELECT a.segment, a.t, a.d,
             s.total - coalesce(sum(a.n_here) OVER (
               PARTITION BY a.segment ORDER BY a.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM at_t a JOIN seg_n s ON s.segment = a.segment
    ),
    km AS (
      SELECT segment, t, d, n_risk,
             CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
                    PARTITION BY segment ORDER BY t) = 1
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN d < n_risk
                               THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                               ELSE 0.0 END) OVER (
                    PARTITION BY segment ORDER BY t))
             END AS s_km
      FROM risk
    )
    SELECT segment, CAST(t AS BIGINT) AS t_hours,
           CAST(n_risk AS BIGINT) AS n_risk, d,
           floor(s_km * CAST(1000000.0 AS DOUBLE) + 0.5)
             / CAST(1000000.0 AS DOUBLE) AS s_km
    FROM km WHERE d > 0
    """)
def km_survival_time_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-first-purchase per
    market segment (right-censored at corpus end for users who never
    convert): at each event time t, S(t) multiplies by (1 − d_t/n_t)
    over conversions d_t among the n_t still at risk — the standard
    censoring-correct estimator (Kaplan & Meier 1958), which a naive
    conversion-rate-by-hour analysis gets wrong.

    FP parity: d and n are exact integers; the running product is
    exp(running sum of ln factors) over the SAME ordered window frame
    on both engines, quantized to 1e-6.

    Scale: per-user reduction first (two hash aggs + one join), then
    windows over the (segment, distinct-hour) relation — bounded by
    time resolution, not user count."""
    (e, c) = load(spark, sf_dir, "events", "customer")
    t_end = e.agg(F.max("ts").alias("t_end"))
    fv = (e.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("first_view")))
    fp = (fv.join(e.filter(F.col("event_type") == "purchase"), "user_id")
            .filter(F.col("ts") > F.col("first_view"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("first_purchase")))
    u = (fv.join(fp, "user_id", "left")
           .join(F.broadcast(c), F.col("user_id") == F.col("c_custkey"))
           .crossJoin(F.broadcast(t_end))
           .select(F.col("c_mktsegment").alias("segment"),
                   F.when(F.col("first_purchase").isNotNull(),
                          (F.unix_micros("first_purchase")
                           - F.unix_micros("first_view")))
                    .otherwise(F.unix_micros("t_end")
                               - F.unix_micros("first_view"))
                    .cast("long").alias("us"),
                   F.col("first_purchase").isNotNull()
                    .cast("long").alias("converted"))
           .select("segment", F.expr("us div 3600000000").alias("dur_h"),
                   "converted"))
    seg_n = u.groupBy("segment").agg(F.count(F.lit(1)).alias("total"))
    at_t = (u.groupBy("segment", F.col("dur_h").alias("t"))
             .agg(F.count(F.lit(1)).alias("n_here"),
                  F.sum("converted").alias("d")))
    w_prev = (W.partitionBy("segment").orderBy("t")
               .rowsBetween(W.unboundedPreceding, -1))
    risk = (at_t.join(F.broadcast(seg_n), "segment")
                .withColumn("n_risk",
                            F.col("total")
                            - F.coalesce(F.sum("n_here").over(w_prev),
                                         F.lit(0))))
    w_run = W.partitionBy("segment").orderBy("t")
    # a time where every remaining at-risk user converts drives the
    # survival to EXACT zero — ln would blow up, so the zero is carried
    # by a flag instead of the log-sum
    ln_term = F.when(F.col("d") < F.col("n_risk"),
                     F.log(F.lit(1.0) - F.col("d").cast("double")
                           / F.col("n_risk"))).otherwise(F.lit(0.0))
    zero_seen = F.max((F.col("d") >= F.col("n_risk")).cast("int")) \
        .over(w_run)
    km = risk.withColumn(
        "s_km", F.when(zero_seen == 1, F.lit(0.0))
                 .otherwise(F.exp(F.sum(ln_term).over(w_run))))
    return (km.filter(F.col("d") > 0)
              .select("segment", F.col("t").cast("long").alias("t_hours"),
                      F.col("n_risk").cast("long").alias("n_risk"),
                      F.col("d"), quantize(F.col("s_km"), 6).alias("s_km")))


@query(
    "attribution_models_revenue",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT p.pid, p.cents, e.event_type, e.ts, e.event_id,
             row_number() OVER (PARTITION BY p.pid
                                ORDER BY e.ts, e.event_id) AS rn,
             count(*) OVER (PARTITION BY p.pid) AS k
      FROM p JOIN events e
        ON e.user_id = p.user_id
           AND e.event_type IN ('view', 'click')
           AND e.ts < p.pts
           AND epoch_us(p.pts) - epoch_us(e.ts) <= 86400000000
    ),
    with_touch AS (SELECT DISTINCT pid FROM t),
    direct AS (
      SELECT 'direct' AS touch_type, m.model,
             CAST(sum(p.cents) AS BIGINT) AS attributed_cents,
             count(*) AS n_touches
      FROM p, (SELECT unnest(['first_touch', 'last_touch', 'linear'])
               AS model) m
      WHERE p.pid NOT IN (SELECT pid FROM with_touch)
      GROUP BY m.model
    ),
    first_t AS (
      SELECT event_type AS touch_type, 'first_touch' AS model,
             CAST(sum(cents) AS BIGINT) AS attributed_cents,
             count(*) AS n_touches
      FROM t WHERE rn = 1 GROUP BY event_type
    ),
    last_t AS (
      SELECT event_type AS touch_type, 'last_touch' AS model,
             CAST(sum(cents) AS BIGINT) AS attributed_cents,
             count(*) AS n_touches
      FROM t WHERE rn = k GROUP BY event_type
    ),
    linear_t AS (
      SELECT event_type AS touch_type, 'linear' AS model,
             CAST(sum(cents // k
                      + CASE WHEN rn <= cents % k THEN 1 ELSE 0 END)
                  AS BIGINT) AS attributed_cents,
             count(*) AS n_touches
      FROM t GROUP BY event_type
    )
    SELECT * FROM first_t UNION ALL SELECT * FROM last_t
    UNION ALL SELECT * FROM linear_t UNION ALL SELECT * FROM direct
    """)
def attribution_models_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution: every purchase's cents credited
    to the view/click touchpoints of the preceding 24 h under three
    models — first-touch, last-touch, and LINEAR with exact Hamilton
    splitting (cents div k to every touch, the cents mod k remainder
    to the earliest touches) so each purchase's credit sums to its
    cents EXACTLY — the invariant float fractions can't give, and the
    reason the totals hash-check. Untouched purchases credit a
    'direct' bucket under every model.

    Scale: the touch join is per-user time-bounded (the interval-join
    family — bucketed equi-join at 100 TB); windows run per purchase
    over ≤ a day of one user's touches; outputs are model×type rows."""
    (e,) = load(spark, sf_dir, "events")
    p = (e.filter(F.col("event_type") == "purchase")
          .select(F.col("event_id").alias("pid"), "user_id",
                  F.col("ts").alias("pts"),
                  F.floor(F.coalesce("value", F.lit(0.0)) * 100
                          + F.lit(0.5)).cast("long").alias("cents")))
    tt = (p.join(e.filter(F.col("event_type").isin("view", "click"))
                  .select("user_id", "event_type", "ts", "event_id"),
                 "user_id")
           .filter((F.col("ts") < F.col("pts"))
                   & (F.unix_micros("pts") - F.unix_micros("ts")
                      <= 86400000000))
           .withColumn("rn", F.row_number().over(
               W.partitionBy("pid").orderBy("ts", "event_id")))
           .withColumn("k", F.count(F.lit(1)).over(W.partitionBy("pid"))))
    tt = tt.localCheckpoint(eager=True)
    first_t = (tt.filter(F.col("rn") == 1).groupBy("event_type")
                 .agg(F.sum("cents").alias("attributed_cents"),
                      F.count(F.lit(1)).alias("n_touches"))
                 .select(F.col("event_type").alias("touch_type"),
                         F.lit("first_touch").alias("model"),
                         "attributed_cents", "n_touches"))
    last_t = (tt.filter(F.col("rn") == F.col("k")).groupBy("event_type")
                .agg(F.sum("cents").alias("attributed_cents"),
                     F.count(F.lit(1)).alias("n_touches"))
                .select(F.col("event_type").alias("touch_type"),
                        F.lit("last_touch").alias("model"),
                        "attributed_cents", "n_touches"))
    linear_t = (tt.withColumn(
                    "alloc", F.expr("cents div k")
                    + (F.col("rn") <= F.col("cents") % F.col("k"))
                    .cast("long"))
                  .groupBy("event_type")
                  .agg(F.sum("alloc").alias("attributed_cents"),
                       F.count(F.lit(1)).alias("n_touches"))
                  .select(F.col("event_type").alias("touch_type"),
                          F.lit("linear").alias("model"),
                          "attributed_cents", "n_touches"))
    models = spark.createDataFrame(
        [("first_touch",), ("last_touch",), ("linear",)], "model string")
    direct = (p.join(tt.select("pid").distinct(), "pid", "left_anti")
               .crossJoin(F.broadcast(models))
               .groupBy("model")
               .agg(F.sum("cents").alias("attributed_cents"),
                    F.count(F.lit(1)).alias("n_touches"))
               .select(F.lit("direct").alias("touch_type"), "model",
                       "attributed_cents", "n_touches"))
    return (first_t.unionByName(last_t).unionByName(linear_t)
                   .unionByName(direct))


@query(
    "error_budget_burn_alerts",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    win AS (
      SELECT hour, n, errs,
             CAST(sum(n) OVER w6 AS BIGINT) AS n6,
             CAST(sum(errs) OVER w6 AS BIGINT) AS errs6
      FROM hourly
      WINDOW w6 AS (ORDER BY hour
                    RANGE BETWEEN INTERVAL 5 HOUR PRECEDING
                          AND CURRENT ROW)
    )
    SELECT hour, n, errs,
           floor((CAST(errs AS DOUBLE) / n / 0.05)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS burn_1h,
           floor((CAST(errs6 AS DOUBLE) / n6 / 0.05)
                 * CAST(10000.0 AS DOUBLE) + 0.5)
             / CAST(10000.0 AS DOUBLE) AS burn_6h,
           (errs * 20 > n * 2) AND (errs6 * 20 > n6 * 2) AS page_alert
    FROM win
    """)
def error_budget_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-rate alerting (multi-window, SLO 95%):
    per hour, the 1 h and trailing-6 h burn rates (error rate ÷ budget
    rate 0.05), and the page condition — BOTH windows burning at >2× —
    the Google-SRE-workbook pattern that filters blips (short window
    alone) and slow drifts (long window alone). The alert boolean is
    an integer cross-multiplication (errs·20 > n·2), so the paging
    decision itself never touches floats.

    Scale: one hourly rollup, then a range window over the
    hour-cardinality series — the raw stream never enters a window."""
    (e,) = load(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum((F.col("event_type") == "error").cast("long"))
                     .alias("errs")))
    w6 = (W.orderBy(F.unix_micros("hour"))
           .rangeBetween(-5 * 3600 * 1000000, 0))
    win = (hourly.withColumn("n6", F.sum("n").over(w6))
                 .withColumn("errs6", F.sum("errs").over(w6)))
    burn = lambda ecol, ncol: quantize(   # noqa: E731
        F.col(ecol).cast("double") / F.col(ncol) / F.lit(0.05), 4)
    return win.select(
        "hour", "n", "errs",
        burn("errs", "n").alias("burn_1h"),
        burn("errs6", "n6").alias("burn_6h"),
        ((F.col("errs") * 20 > F.col("n") * 2)
         & (F.col("errs6") * 20 > F.col("n6") * 2)).alias("page_alert"))
