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
