"""Multimodal-column plumbing (SURVEY.md §2.9): media as opaque binary
columns + typed metadata, processed through Arrow-batched
``mapInPandas`` — the real Spark-side shape for decode / feature-extract
/ resize operators at 100 TB (binary stays columnar, Python sees Arrow
batches, never row-at-a-time).

The container has no image/audio codecs, so the *decode* is a
deterministic md5-derived fake (clearly marked); the schema, batch
iteration, partitioning, and UDF signature are the real thing and are
what the ``mapInPandas`` query verifies against a SQL oracle (hashlib
md5 == Spark md5 == DuckDB md5, so even the fake metadata is
oracle-checkable). A genuine decoder drops into ``_decode_blob``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query, load

_META_SCHEMA = ("doc_id long, n_bytes long, fake_width long, fake_height long, "
                "content_md5 string")


def _decode_blob(blob: bytes) -> dict:
    """STUB decoder: deterministic md5-derived pseudo-metadata.

    A real implementation would decode image/audio headers here
    (PIL/libsndfile are not in this container). Raising
    NotImplementedError for real media is the documented contract;
    the fake path keeps the pipeline testable end-to-end."""
    h = hashlib.md5(blob).hexdigest()
    return {
        "n_bytes": len(blob),
        "fake_width": int(h[:4], 16) % 1024 + 1,
        "fake_height": int(h[4:8], 16) % 1024 + 1,
        "content_md5": h,
    }


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """``mapInPandas`` feature-extraction over (doc_id, blob) rows:
    Arrow batches in, metadata rows out — 1:1, schema-stable. This is
    the operator shape every multimodal op (decode, resize,
    frame-sample) reuses."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_blob(b) for b in pdf["blob"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(op, schema=_META_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx long, byte_offset long, frame_md5 string"
_MAX_FRAMES = 4


def sample_frames(media: DataFrame, max_frames: int = _MAX_FRAMES) -> DataFrame:
    """1→N multimodal operator: deterministic frame sampling from a
    "video" blob via ``mapInPandas`` — one input row yields a variable
    number of frame rows (the shape decode-then-explode ops need; the
    1:1 metadata extractor above can't express it). Frame count and
    byte offsets derive from the blob; the frame fingerprint is the
    stub decoder's md5 chain (a real codec would emit actual frame
    bytes at each offset). Narrow map: no shuffle, output partitioning
    follows input."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                meta = _decode_blob(bytes(blob))
                k = meta["n_bytes"] % max_frames + 1
                for i in range(k):
                    fp = hashlib.md5(
                        f"{meta['content_md5']}-{i}".encode()).hexdigest()
                    rows.append((doc_id, i, meta["n_bytes"] * i // k, fp))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "byte_offset", "frame_md5"])

    return media.mapInPandas(op, schema=_FRAME_SCHEMA)


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id, i AS frame_idx,
           octet_length(encode(text)) * i // k AS byte_offset,
           md5(md5(text) || '-' || i) AS frame_md5
    FROM (SELECT doc_id, text,
                 octet_length(encode(text)) % {_MAX_FRAMES} + 1 AS k
          FROM documents),
         LATERAL unnest(range(0, k)) AS t(i)
    """)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the 1→N frame-sample path: documents text as fake video
    blobs, variable frames per blob, checked row-for-row against a
    LATERAL-unnest SQL oracle (hashlib md5 == DuckDB md5 keeps even
    the stub fingerprints verifiable)."""
    (d,) = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
    par = spark.sparkContext.defaultParallelism
    return sample_frames(media.repartition(par))


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ('0x' || substring(md5(text), 1, 4))::BIGINT % 1024 + 1 AS fake_width,
           ('0x' || substring(md5(text), 5, 4))::BIGINT % 1024 + 1 AS fake_height,
           md5(text) AS content_md5
    FROM documents
    """)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the mapInPandas multimodal path end-to-end: documents
    text re-encoded as binary blobs (the testdata has no media
    column), decoded by the stub, checked against a pure-SQL oracle.
    Proves: binary column handling, Arrow batch shape, UDF schema,
    deterministic output."""
    (d,) = load(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
    par = spark.sparkContext.defaultParallelism
    return extract_media_metadata(media.repartition(par))
