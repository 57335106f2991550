"""Multimodal-column plumbing (SURVEY.md §2.9): media as opaque binary
columns + typed metadata, processed through Arrow-batched
``mapInPandas`` — the real Spark-side shape for decode / feature-extract
/ resize operators at 100 TB (binary stays columnar, Python sees Arrow
batches, never row-at-a-time).

Two decoders:

- ``decode_media_header`` — a REAL stdlib-only parser for BMP
  (BITMAPINFOHEADER) and WAV (RIFF/fmt/data) headers via
  ``struct.unpack``; exercised by ``multimodal_real_decode`` over
  synthetic-but-valid blobs generated per doc_id, with a SQL oracle
  that recomputes every header field (and the exact file size) from
  the same doc_id arithmetic.
- ``_decode_blob`` — the md5-derived fake, retained as the fallback
  for formats the container can't decode (no image/audio codec libs);
  drives the 1:1-metadata and 1→N-frame-sample query shapes with
  md5-checkable oracles.
"""

from __future__ import annotations

import hashlib
import struct
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


# ---- real header codec (stdlib struct; BMP + WAV) --------------------

def make_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bpp BMP: 14-byte file header + 40-byte
    BITMAPINFOHEADER + zeroed pixel rows (4-byte-aligned)."""
    row = (width * 3 + 3) // 4 * 4
    pixels = row * height
    size = 54 + pixels
    return (struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          pixels, 2835, 2835, 0, 0)
            + b"\x00" * pixels)


def make_wav(sample_rate: int, n_channels: int, bits: int,
             n_samples: int) -> bytes:
    """Minimal valid PCM WAV: RIFF header + fmt chunk + zeroed data."""
    block = n_channels * bits // 8
    data = n_samples * block
    return (struct.pack("<4sI4s", b"RIFF", 36 + data, b"WAVE")
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, n_channels,
                          sample_rate, sample_rate * block, block, bits)
            + struct.pack("<4sI", b"data", data)
            + b"\x00" * data)


def decode_media_header(blob: bytes) -> dict:
    """REAL header decoder (no codec libs needed): parses BMP and WAV
    headers with ``struct.unpack`` and validates internal sizes against
    the actual byte count. Raises ValueError on anything else — callers
    choose the fallback (the md5 stub)."""
    if blob[:2] == b"BM" and len(blob) >= 54:
        _, size, _, _, _ = struct.unpack_from("<2sIHHI", blob, 0)
        hdr, width, height, planes, bpp = struct.unpack_from("<IiiHH", blob, 14)
        if hdr < 40 or planes != 1:
            raise ValueError("unsupported BMP variant")
        if size != len(blob):
            raise ValueError("BMP size field mismatch")
        return {"format": "bmp", "width": width, "height": abs(height),
                "n_channels": None, "sample_rate": None,
                "bits_per_sample": bpp, "n_samples": None,
                "n_bytes": len(blob)}
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE" and len(blob) >= 44:
        riff_size, = struct.unpack_from("<I", blob, 4)
        if riff_size + 8 != len(blob):
            raise ValueError("RIFF size field mismatch")
        # walk chunks: fmt then data (robust to extra chunks)
        off, fmt, data_size = 12, None, None
        while off + 8 <= len(blob):
            cid, csz = struct.unpack_from("<4sI", blob, off)
            if cid == b"fmt " and csz >= 16:
                fmt = struct.unpack_from("<HHIIHH", blob, off + 8)
            elif cid == b"data":
                data_size = csz
            off += 8 + csz + (csz & 1)
        if fmt is None or data_size is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, rate, _brate, block, bits = fmt
        if audio_fmt != 1 or block == 0:
            raise ValueError("unsupported WAV encoding")
        return {"format": "wav", "width": None, "height": None,
                "n_channels": n_ch, "sample_rate": rate,
                "bits_per_sample": bits, "n_samples": data_size // block,
                "n_bytes": len(blob)}
    raise ValueError("unknown media format")


_REAL_META_SCHEMA = ("doc_id long, format string, width long, height long, "
                     "n_channels long, sample_rate long, bits_per_sample long, "
                     "n_samples long, n_bytes long")
_REAL_COLS = ["doc_id", "format", "width", "height", "n_channels",
              "sample_rate", "bits_per_sample", "n_samples", "n_bytes"]


def extract_real_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched decode with the REAL header parser; undecodable
    blobs fall back to the md5 stub (format='unknown', sizes only) —
    the pipeline never throws on a corrupt blob."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                try:
                    m = decode_media_header(bytes(blob))
                except ValueError:
                    m = {"format": "unknown", "width": None, "height": None,
                         "n_channels": None, "sample_rate": None,
                         "bits_per_sample": None, "n_samples": None,
                         "n_bytes": len(bytes(blob))}
                rows.append((doc_id, m["format"], m["width"], m["height"],
                             m["n_channels"], m["sample_rate"],
                             m["bits_per_sample"], m["n_samples"],
                             m["n_bytes"]))
            out = pd.DataFrame(rows, columns=_REAL_COLS)
            for c in _REAL_COLS:
                if c != "format":   # nullable int64 for clean Arrow nulls
                    out[c] = out[c].astype("Int64")
            yield out

    return media.mapInPandas(op, schema=_REAL_META_SCHEMA)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media corpus: each doc_id becomes ONE
    valid blob — even ids a BMP, odd ids a WAV — with header parameters
    derived arithmetically from the id (so a SQL oracle can recompute
    the expected metadata without parsing bytes). Narrow 1:1 map."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 2 == 0:
                    blob = make_bmp(i % 64 + 1, (i // 7) % 48 + 1)
                else:
                    blob = make_wav([8000, 16000, 44100][i % 3],
                                    (i // 5) % 2 + 1, [8, 16][(i // 3) % 2],
                                    i % 64 + 1)
                rows.append((i, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])

    return docs.select("doc_id").mapInPandas(op, schema="doc_id long, blob binary")


@query(
    "multimodal_real_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS width,
           CASE WHEN doc_id % 2 = 0 THEN (doc_id // 7) % 48 + 1 END AS height,
           CASE WHEN doc_id % 2 = 1 THEN (doc_id // 5) % 2 + 1 END AS n_channels,
           CASE WHEN doc_id % 2 = 1
                THEN [8000, 16000, 44100][CAST(doc_id % 3 AS INT) + 1] END AS sample_rate,
           CASE WHEN doc_id % 2 = 0 THEN 24
                ELSE [8, 16][CAST((doc_id // 3) % 2 AS INT) + 1] END AS bits_per_sample,
           CASE WHEN doc_id % 2 = 1 THEN doc_id % 64 + 1 END AS n_samples,
           CASE WHEN doc_id % 2 = 0
                THEN 54 + ((doc_id % 64 + 1) * 3 + 3) // 4 * 4 * ((doc_id // 7) % 48 + 1)
                ELSE 44 + (doc_id % 64 + 1) * ((doc_id // 5) % 2 + 1)
                          * [8, 16][CAST((doc_id // 3) % 2 AS INT) + 1] // 8
           END AS n_bytes
    FROM documents
    """)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode end-to-end: per-doc synthetic BMP/WAV
    blobs (valid headers + zeroed payload) are built in one
    ``mapInPandas`` stage and parsed back by the struct-based header
    decoder in another; the oracle recomputes every header field AND
    the exact file size from doc_id arithmetic, so a parser that
    misreads any offset, endianness, or padding rule hash-mismatches.
    Scale: two chained narrow Arrow maps, no shuffle; blobs never
    leave their partition."""
    (d,) = load(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return extract_real_metadata(synth_media(d.repartition(par)))


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
