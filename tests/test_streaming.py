"""Structured Streaming smoke tests: file-source → windowed/session
aggs → memory sink, and the foreachBatch upsert into the engine
catalog. Driven synchronously via processAllAvailable (local batch of
parquet rows completes the stream)."""

from __future__ import annotations

import pytest

from messdb_spark.engine import Engine
from messdb_spark.streaming.stream import (read_event_stream, session_counts,
                                           stream_upsert_into, windowed_counts)


@pytest.fixture()
def events_dir(sf_dir, tmp_path):
    # the file stream source needs a directory of arriving files
    d = tmp_path / "events_in"
    d.mkdir()
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, sf_dir, events_dir, tmp_path):
    from messdb_spark.session import read_table
    from pyspark.sql import functions as F

    stream = read_event_stream(spark, events_dir)
    q = (windowed_counts(stream).writeStream.outputMode("complete")
         .format("memory").queryName("win_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in spark.sql("SELECT * FROM win_out").collect()}

    batch = read_table(spark, sf_dir, "events")
    expect = {(r["hour"], r["event_type"]): (r["n"], r["tv"])
              for r in (batch.groupBy(F.date_trunc("hour", "ts").alias("hour"),
                                      "event_type")
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.sum(F.col("value").cast("decimal(18,2)"))
                              .cast("double").alias("tv"))).collect()}
    assert got == expect


def test_session_counts_runs(spark, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = (session_counts(stream).writeStream.outputMode("complete")
         .format("memory").queryName("sess_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert len(rows) > 0
    # sessions are per-user, bounded by event counts
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(events_dir).count()


def test_running_user_totals_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    events split into two files, one file per trigger — the final update
    row per user must equal the batch cumulative aggregate, which is only
    possible if GroupState survived between the two batches."""
    from pyspark.sql import functions as F
    from messdb_spark.session import read_table
    from messdb_spark.streaming.stream import running_user_totals

    batch = read_table(spark, sf_dir, "events")
    d = tmp_path / "events_split"
    # two files → two triggers at maxFilesPerTrigger=1
    batch.filter(F.col("event_id") % 2 == 0).coalesce(1) \
         .write.parquet(str(d / "a"))
    batch.filter(F.col("event_id") % 2 == 1).coalesce(1) \
         .write.parquet(str(d / "b"))
    src = tmp_path / "events_in2"
    src.mkdir()
    import glob
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "*.parquet")))):
        (src / f"{i}.parquet").symlink_to(f)

    # stream with the schema we just wrote (ts is already a timestamp
    # here, unlike the driver's nanos-as-long testdata layout)
    stream = (spark.readStream.schema(spark.read.parquet(str(src)).schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (running_user_totals(stream).writeStream.outputMode("update")
         .format("memory").queryName("running_out").start())
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2  # state really crossed a batch boundary

    # memory sink in update mode appends every emitted update row;
    # the final state per user is the row from the last batch that
    # touched that user — reconstruct via max n_events per user.
    rows = spark.sql("""
        SELECT user_id, max_by(n_events, n_events) AS n_events,
               max_by(total_value, n_events) AS total_value
        FROM running_out GROUP BY user_id""").collect()
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in rows}
    expect = {r["user_id"]: (r["n"], r["tv"])
              for r in batch.groupBy("user_id")
                            .agg(F.count(F.lit(1)).alias("n"),
                                 F.sum(F.coalesce(F.col("value"), F.lit(0.0)))
                                  .alias("tv")).collect()}
    assert set(got) == set(expect)
    for u in got:
        assert got[u][0] == expect[u][0]
        assert abs(got[u][1] - expect[u][1]) < 1e-6


def test_stream_upsert_into_catalog(spark, events_dir, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    stream = read_event_stream(spark, events_dir)
    q = stream_upsert_into(eng, "events_live", stream,
                           checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    t = eng.load_table("events_live")
    n = t.df.count()
    assert n == spark.read.parquet(events_dir).count()
    assert t.key_cols == ("event_id",)
    # key uniqueness invariant survived the streamed merges
    assert t.df.select("event_id").distinct().count() == n


def test_dedup_within_watermark_drops_redelivery(spark, sf_dir, tmp_path):
    """The same events file arrives twice (two triggers = at-least-once
    re-delivery): dropDuplicatesWithinWatermark must emit each event_id
    exactly once. State is bounded by the watermark horizon, so this is
    the dedup that survives an unbounded feed."""
    from messdb_spark.streaming.stream import dedup_within_watermark

    src = tmp_path / "events_dup"
    src.mkdir()
    for name in ("first.parquet", "second.parquet"):
        (src / name).symlink_to(f"{sf_dir}/events.parquet")
    stream = read_event_stream(spark, str(src))
    q = (dedup_within_watermark(stream).writeStream.outputMode("append")
         .format("memory").queryName("dedup_out").start())
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    assert n_batches >= 2  # re-delivery really crossed a batch boundary
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    n_distinct = (spark.read.parquet(f"{sf_dir}/events.parquet")
                  .select("event_id").distinct().count())
    assert len(got) == n_distinct
    assert len({r["event_id"] for r in got}) == n_distinct


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join == the same join done in batch:
    every (purchase, prior view within 30 min, same user) pair."""
    from pyspark.sql import functions as F
    from messdb_spark.session import read_table
    from messdb_spark.streaming.stream import stream_stream_purchase_views

    s1 = read_event_stream(spark, events_dir)
    s2 = read_event_stream(spark, events_dir)
    q = (stream_stream_purchase_views(s1, s2)
         .writeStream.outputMode("append")
         .format("memory").queryName("ssj_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["p_id"], r["v_id"])
           for r in spark.sql("SELECT p_id, v_id FROM ssj_out").collect()}

    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase") \
         .select(F.col("event_id").alias("p_id"), "user_id",
                 F.col("ts").alias("p_ts"))
    v = e.filter(F.col("event_type") == "view") \
         .select(F.col("event_id").alias("v_id"),
                 F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    batch = p.join(v, (F.col("user_id") == F.col("v_user")) &
                      (F.col("v_ts") < F.col("p_ts")) &
                      (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 minutes")))
    want = {(r["p_id"], r["v_id"]) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_incremental_upsert_shares_buckets(spark, sf_dir, tmp_path):
    """Streaming into a bucket-granular table: the second micro-batch's
    commit reuses every bucket object the batch didn't touch
    (structural sharing across stream commits), and the final table
    equals the batch union."""
    from pyspark.sql import functions as F
    from messdb_spark.plans.incremental import load_manifest
    from messdb_spark.session import read_table
    from messdb_spark.streaming.stream import stream_incremental_upsert_into

    batch = read_table(spark, sf_dir, "events")
    d = tmp_path / "ev_split"
    big = batch.filter(F.col("event_id") % 20 != 0)
    small = batch.filter(F.col("event_id") % 20 == 0).limit(5)
    big.coalesce(1).write.parquet(str(d / "a"))
    small.coalesce(1).write.parquet(str(d / "b"))
    src = tmp_path / "ev_in"
    src.mkdir()
    import glob
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "*.parquet")))):
        (src / f"{i}.parquet").symlink_to(f)

    eng = Engine(spark, str(tmp_path / "wh"))
    stream = (spark.readStream.schema(big.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = stream_incremental_upsert_into(eng, "ev_live", stream, n_buckets=32,
                                       checkpoint_dir=str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    v = eng.catalog.current_version()
    assert v >= 2
    ref_prev = load_manifest(eng.objects, eng.catalog.get("ev_live", version=v - 1).table_hash)
    ref_cur = load_manifest(eng.objects, eng.catalog.get("ev_live").table_hash)
    shared = sum(1 for a, b in zip(ref_prev.bucket_hashes, ref_cur.bucket_hashes)
                 if a == b and a != "empty")
    touched = sum(1 for a, b in zip(ref_prev.bucket_hashes, ref_cur.bucket_hashes)
                  if a != b)
    assert touched <= 5 and shared >= 32 - 5 - 1  # 5-row batch → ≤5 buckets

    t = eng.load_table("ev_live")
    assert t.df.count() == big.count() + 5
    # time travel: the pre-small-batch state is still queryable
    assert eng.sql("SELECT count(*) AS n FROM ev_live", version=v - 1) \
              .collect()[0]["n"] == big.count()


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_dir):
    """Stream-static dim enrichment must agree row-for-row with the
    same join done in batch, and must not shuffle the stream side
    (broadcast static dim, no state store)."""
    from messdb_spark.session import read_table
    from messdb_spark.streaming.stream import (read_event_stream,
                                               stream_static_enrich,
                                               user_profile_table)

    batch = read_table(spark, sf_dir, "events")
    profile = user_profile_table(batch)
    s = read_event_stream(spark, events_dir, max_files_per_trigger=4)
    q = (stream_static_enrich(s, profile)
         .writeStream.outputMode("append")
         .format("memory").queryName("enrich_out").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["event_id"], r["tier"])
           for r in spark.sql("SELECT event_id, tier FROM enrich_out").collect()}
    want = {(r["event_id"], r["tier"])
            for r in stream_static_enrich(batch, profile).collect()}
    assert got == want and len(want) > 0


def test_replay_conf_pins_rocksdb_and_restores(spark):
    """The replay-scoped conf pins the RocksDB state store provider +
    changelog checkpointing and shuffle partitions, and restores (or
    unsets) every key afterwards."""
    from messdb_spark.queries.engine_ops import (_replay_shuffle_partitions,
                                                 _ROCKSDB_PROVIDER)

    key_p = "spark.sql.streaming.stateStore.providerClass"
    key_c = ("spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled")
    key_s = "spark.sql.shuffle.partitions"
    prev_s = spark.conf.get(key_s)
    with _replay_shuffle_partitions(spark, n=6):
        assert spark.conf.get(key_p) == _ROCKSDB_PROVIDER
        assert spark.conf.get(key_c) == "true"
        assert spark.conf.get(key_s) == "6"
    assert spark.conf.get(key_s) == prev_s
    # provider unset back to the session default (the test session
    # never pinned it), not left at the replay value
    try:
        now = spark.conf.get(key_p)
    except Exception:
        now = None
    assert now != _ROCKSDB_PROVIDER
