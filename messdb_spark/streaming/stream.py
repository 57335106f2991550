"""Structured Streaming surface (SURVEY.md §2.8 — absent in the
reference, provided as Spark capability per the north star).

Three pieces:

- ``read_event_stream``: file-source stream over the events schema
  (nanos ts arrives as long with ``nanosAsLong`` and converts to a
  µs timestamp — same convention as the batch reader).
- ``windowed_counts`` / ``session_counts``: watermarked tumbling and
  session windows — the streaming forms of the batch
  ``events_hourly_stats`` / ``events_sessionization`` queries.
- ``stream_upsert_into``: foreachBatch sink that fold-merges each
  micro-batch into an Engine catalog table (last-wins upsert) — the
  reference's O1/O5 write path driven by a stream; every batch commit
  produces a new content-addressed table state, so the catalog history
  stays consistent with the batch engine's semantics.

Scale: watermarks bound state; the windowed aggs shuffle on
(window, key) with partial aggregation; the upsert sink rewrites only
on real changes (content-hash write-once store)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over events parquet (driver testdata layout).

    The testdata has shipped ``ts`` as TIMESTAMP(NANOS) (arrives as a
    long under ``nanosAsLong``) and as TIMESTAMP(MICROS, ntz); file
    streams need an explicit schema, so one footer-only batch read
    sniffs the actual encoding and the stream normalizes to TIMESTAMP
    exactly like the batch reader (``session.read_table``) — batch and
    stream plans must agree on event time or watermarks drift."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        static_schema = spark.read.parquet(path).schema
    except Exception:
        # Empty directory (no parquet footer yet): start the stream with
        # the canonical events schema; data arriving later must match it.
        static_schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ])
    raw = (spark.readStream.schema(static_schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(path))
    ts_type = dict((f.name, f.dataType.simpleString())
                   for f in static_schema.fields).get("ts")
    if ts_type == "bigint":          # nanos-as-long generation
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":  # micros-ntz generation
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type (streaming
    form of events_hourly_stats). Late rows beyond the watermark are
    dropped; state is bounded by watermark horizon × window count."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                  .alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (streaming form of
    events_sessionization): built-in session_window with gap timeout."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"), "n_events"))


def running_user_totals(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals carried across micro-batches in GroupState — the
    class of operator built-in windowed aggs can't express (unbounded
    running state keyed by user, emitting the updated cumulative row
    each time the user appears).

    Scale: state is one (count, sum) pair per user key — O(users)
    bounded state, partitioned by the groupBy key across executors;
    each micro-batch touches only the keys present in that batch
    (Arrow-batched pandas per key group, not per row).
    """
    import pandas as pd  # noqa: F401 (arrow path)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total]})

    return (events.withWatermark("ts", watermark)
                  .groupBy("user_id")
                  .applyInPandasWithState(update, out_schema, state_schema,
                                          "update",
                                          GroupStateTimeout.NoTimeout))


def stream_stream_purchase_views(purchases: DataFrame, views: DataFrame,
                                 horizon: str = "30 minutes",
                                 watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase joins the same user's
    view events from the preceding ``horizon`` — the streaming form of
    the batch as-of/interval joins. Both sides carry watermarks and the
    join condition time-bounds the buffered state (Spark evicts each
    side once the other's watermark passes the bound), so state is
    O(arrival rate × horizon) per side, not unbounded."""
    p = (purchases.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("p_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", watermark))
    v = (views.filter(F.col("event_type") == "view")
         .select(F.col("event_id").alias("v_id"),
                 F.col("user_id").alias("v_user"),
                 F.col("ts").alias("v_ts"))
         .withWatermark("v_ts", watermark))
    return p.join(
        v, (F.col("p_user") == F.col("v_user")) &
           (F.col("v_ts") < F.col("p_ts")) &
           (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner")


def dedup_within_watermark(events: DataFrame,
                           keys: tuple[str, ...] = ("event_id",),
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key while
    its event time is within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — at-least-once source →
    effectively-once downstream). State holds one entry per distinct
    key seen in the horizon and is evicted as the watermark advances,
    so memory is bounded by (arrival rate × horizon), not by total
    stream length — the property that matters on an unbounded 100 TB
    feed. The batch analog is the ``dedup_exact`` query."""
    return (events.withWatermark("ts", watermark)
                  .dropDuplicatesWithinWatermark(list(keys)))


def upsert_batch(engine, table_name: str, batch_df: DataFrame,
                 key_cols: tuple[str, ...] = ("event_id",)) -> None:
    """One micro-batch of the upsert sink: fold within-batch duplicate
    keys, merge into the catalog table (last-wins), commit.

    The folded batch is PINNED with ``localCheckpoint`` before the
    merge: ``incoming`` appears twice in the merged plan (anti-join key
    side and union side of ``merge_tables``' fold_to_last path), and a
    streaming batch_df re-evaluates its source scan per subtree — if
    those two scans could ever disagree (offset re-resolution, partition
    relayout feeding ``monotonically_increasing_id``), the anti-join
    under-deletes and a duplicate key survives the merge. Checkpointing
    evaluates the batch exactly once; both plan branches then read the
    pinned copy, so the one-row-per-key invariant cannot race. Batches
    are micro-batch-sized, so the eager materialization is cheap."""
    from ..operators.core import KeyedTable, canonicalize_input, merge_tables
    from ..registry import FOLD_TO_LAST

    folded = canonicalize_input(batch_df, key_cols)
    incoming = KeyedTable(folded.df.localCheckpoint(eager=True),
                          folded.key_cols)
    try:
        current = engine.load_table(table_name)
        merged = merge_tables([current, incoming], FOLD_TO_LAST)
    except KeyError:
        merged = merge_tables([incoming], FOLD_TO_LAST)
    engine.save_table(table_name, merged)


def stream_upsert_into(engine, table_name: str, events: DataFrame,
                       key_cols: tuple[str, ...] = ("event_id",),
                       checkpoint_dir: str | None = None):
    """foreachBatch sink: fold-merge every micro-batch into the catalog
    table (O1 merge with fold_to_last — the reference's upsert write
    path, ``Table.hs:142-143``, driven by a stream).

    Returns the StreamingQuery; caller manages lifecycle
    (processAllAvailable/stop in tests)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        upsert_batch(engine, table_name, batch_df, key_cols)

    w = events.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def stream_incremental_upsert_into(engine, table_name: str, events: DataFrame,
                                   key_cols: tuple[str, ...] = ("event_id",),
                                   n_buckets: int = 64,
                                   checkpoint_dir: str | None = None):
    """foreachBatch sink into a BUCKET-GRANULAR table: each micro-batch
    is an ``incremental_upsert`` touching only the buckets its keys
    hash into, and the new manifest is committed to the catalog — so a
    stream of small batches costs ∝ batch keys per commit, not a full
    table rewrite (the reference's untouched-subtree passthrough,
    ``Trie.hs:346-348``, driven by a stream). Unchanged buckets share
    objects across every commit in the catalog's version history."""
    from ..operators.core import canonicalize_input
    from ..plans.incremental import (incremental_upsert, load_manifest,
                                     write_bucketed)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # pin the batch once (same double-scan race as upsert_batch:
        # the delta feeds both the touched-bucket key set and the
        # per-bucket merges)
        pinned = batch_df.localCheckpoint(eager=True)
        entry = engine.catalog.get(table_name)
        ref = (load_manifest(engine.objects, entry.table_hash)
               if entry is not None else None)
        if ref is None:
            ref = write_bucketed(engine.objects,
                                 canonicalize_input(pinned, key_cols),
                                 n_buckets)
        else:
            ref = incremental_upsert(engine.spark, engine.objects, ref,
                                     pinned)
        engine.save_bucketed_table(table_name, ref)

    w = events.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.start()


def user_profile_table(events_batch: DataFrame) -> DataFrame:
    """Static dimension built from history: per-user first-seen time
    and lifetime spend tier. The slowly-changing profile a streaming
    enrichment joins against (rebuilt batch-side on a cadence)."""
    tier = (F.when(F.col("total_value") >= 1000, "high")
             .when(F.col("total_value") >= 100, "mid")
             .otherwise("low"))
    return (events_batch.groupBy("user_id")
            .agg(F.min("ts").alias("first_seen"),
                 F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                  .alias("total_value"))
            .withColumn("tier", tier))


def stream_static_enrich(events: DataFrame, profile: DataFrame) -> DataFrame:
    """Stream-static join: each in-flight event picks up the user's
    profile columns. The static side is broadcast to every task, so
    the stream side never shuffles and no state store is involved —
    the cheapest join shape Structured Streaming offers (and the
    standard dim-enrichment pattern; the stream-stream join covers the
    both-sides-moving case). Left join keeps events from users the
    profile snapshot hasn't seen yet."""
    prof = F.broadcast(profile.select("user_id", "first_seen", "tier"))
    return (events.join(prof, "user_id", "left")
                  .select("event_id", "user_id", "ts", "event_type", "value",
                          "first_seen", "tier"))


def stream_stream_purchase_views_outer(purchases: DataFrame,
                                       views: DataFrame,
                                       horizon: str = "30 minutes",
                                       watermark: str = "2 hours"
                                       ) -> DataFrame:
    """LEFT OUTER stream-stream interval join: like
    ``stream_stream_purchase_views``, but purchases with no view in
    the preceding ``horizon`` still emit — with a NULL view side —
    once the views watermark has passed the last instant a matching
    view could arrive. The null-emission is watermark-GATED: matched
    rows emit eagerly, unmatched ones only when provably unmatched
    (the semantics that make streaming outer joins correct instead of
    eventually-wrong)."""
    p = (purchases.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("p_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", watermark))
    v = (views.filter(F.col("event_type") == "view")
         .select(F.col("event_id").alias("v_id"),
                 F.col("user_id").alias("v_user"),
                 F.col("ts").alias("v_ts"))
         .withWatermark("v_ts", watermark))
    return p.join(
        v, (F.col("p_user") == F.col("v_user")) &
           (F.col("v_ts") < F.col("p_ts")) &
           (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")),
        "leftOuter")
