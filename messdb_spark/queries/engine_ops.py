"""Engine-path queries: the storage/memo/streaming machinery itself
exercised under the driver's DuckDB gate (not just pytest).

The reference's contract tests drive tables through the full
store→merge→reload cycle and compare against a model
(``messdb-base-testlib/src/MessDB/Test/TrieBase.hs``); these queries do
the same with the DuckDB oracle as the model:

- ``stream_replay_upsert``: the events table replayed as a file stream
  through the foreachBatch upsert sink (O1 merge write path driven by
  Structured Streaming), final catalog table returned. Oracle = the
  events table itself (unique keys ⇒ upsert is content-preserving), so
  hash parity proves the whole replay pipeline — micro-batching,
  within-batch canonicalization, anti-join merge, CAS write, catalog
  reload — loses and mangles nothing.
- ``memo_sorted_spend_view``: a memoized sort-transform view (O2+O8,
  ``Trie.hs:280-295,433-470``) materialized through the view-IR memo
  layer; the query asserts the second materialization is a manifest
  hit (zero recompute) and returns the stored parquet. Oracle = the
  equivalent GROUP BY.

Both build a throwaway warehouse per call (tempfile) — the driver gives
queries no ambient engine state.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, load, quantize


@query(
    "stream_replay_upsert",
    oracle="""
    SELECT event_id, user_id, event_type, ts,
           floor(coalesce(value, 0) * CAST(100.0 AS DOUBLE) + 0.5)
             / CAST(100.0 AS DOUBLE) AS value
    FROM events
    """)
def stream_replay_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events through the streaming upsert sink; see module doc.

    The source directory is split into 3 parquet files so
    ``maxFilesPerTrigger=1`` yields 3 real micro-batches (3 sequential
    catalog commits), not one degenerate batch. Keys (event_id) are
    unique, so the folded result must equal the input bit-for-bit —
    any batch lost, double-merged, or column-mangled breaks the hash."""
    from ..engine import Engine
    from ..streaming.stream import stream_upsert_into

    (e,) = load(spark, sf_dir, "events")
    e = e.select("event_id", "user_id", "event_type", "ts",
                 F.floor(F.coalesce("value", F.lit(0.0)) * 100 + F.lit(0.5))
                  .cast("double").alias("cents"))
    tmp = tempfile.mkdtemp(prefix="messdb_replay_")
    try:
        src_dir = os.path.join(tmp, "src")
        for i in range(3):
            (e.filter(F.col("event_id") % 3 == i)
              .coalesce(1)   # one file per split => exactly 3 micro-batches
              .write.mode("overwrite")
              .parquet(os.path.join(src_dir, f"part{i}")))
        eng = Engine(spark, os.path.join(tmp, "wh"))
        eng.ddl("CREATE TABLE replay (event_id BIGINT PRIMARY KEY, "
                "user_id BIGINT, event_type VARCHAR, ts TIMESTAMP, "
                "cents DOUBLE)")
        stream = (spark.readStream
                  .schema(e.schema)
                  .option("maxFilesPerTrigger", 1)
                  .option("recursiveFileLookup", "true")
                  .parquet(src_dir))
        q = stream_upsert_into(eng, "replay", stream,
                               key_cols=("event_id",),
                               checkpoint_dir=os.path.join(tmp, "ckpt"))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = eng.load_table("replay").df
        # pin the result before the temp warehouse is deleted
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("event_id", "user_id", "event_type", "ts",
                      (F.col("cents") / 100.0).alias("value"))


@query(
    "memo_sorted_spend_view",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           floor((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE))
                 * CAST(100.0 AS DOUBLE) + 0.5) / CAST(100.0 AS DOUBLE)
             AS spend
    FROM orders GROUP BY o_custkey
    """)
def memo_sorted_spend_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 sortTable through the O8 memo layer (view IR → digest →
    manifest → CAS), driver-checked; see module doc. Reuses the
    registered ``orders_by_customer`` transform (core_ops), so the IR
    digest covers a real named function key like the reference's
    FuncKey hashing (``Trie.hs:513-521``)."""
    from ..engine import Engine
    from ..plans.views import scan, sort

    (orders,) = load(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="messdb_memoview_")
    try:
        from ..operators.core import KeyedTable
        eng = Engine(spark, os.path.join(tmp, "wh"))
        eng.save_table("orders_src", KeyedTable(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            ("o_orderkey",)))
        ir = sort(scan(eng.table_hash("orders_src"), ["o_orderkey"]),
                  "orders_by_customer", "fold_sum")
        m = eng.materializer
        h1 = m.materialize(ir)
        ran_first = m.computed_ops
        h2 = m.materialize(ir)
        if h2 != h1 or m.computed_ops != ran_first or m.memo.hits < 1:
            raise AssertionError(
                f"memo miss on re-materialize: {h1[:8]} vs {h2[:8]}, "
                f"computed_ops {ran_first}->{m.computed_ops}")
        out = m.dataframe(ir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("o_custkey", "n_orders",
                      quantize(F.col("spend").cast("double"), 2)
                       .alias("spend"))
