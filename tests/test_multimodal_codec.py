"""The real BMP/WAV header codec: generator↔parser round-trip,
malformed-input rejection, and the stub fallback in the Spark path."""

from __future__ import annotations

import pytest

from messdb_spark.queries.multimodal import (decode_media_header, make_bmp,
                                             make_wav)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (640, 480), (13, 7)])
def test_bmp_roundtrip(w, h):
    m = decode_media_header(make_bmp(w, h))
    assert (m["format"], m["width"], m["height"]) == ("bmp", w, h)
    assert m["bits_per_sample"] == 24
    assert m["n_bytes"] == 54 + (w * 3 + 3) // 4 * 4 * h


@pytest.mark.parametrize("rate,ch,bits,ns",
                         [(8000, 1, 8, 1), (16000, 2, 16, 64),
                          (44100, 2, 8, 63)])
def test_wav_roundtrip(rate, ch, bits, ns):
    m = decode_media_header(make_wav(rate, ch, bits, ns))
    assert m["format"] == "wav"
    assert (m["sample_rate"], m["n_channels"],
            m["bits_per_sample"], m["n_samples"]) == (rate, ch, bits, ns)
    assert m["n_bytes"] == 44 + ns * ch * bits // 8


def test_malformed_blobs_rejected():
    with pytest.raises(ValueError):
        decode_media_header(b"not media at all")
    with pytest.raises(ValueError):
        decode_media_header(make_bmp(4, 4)[:-1])        # size mismatch
    truncated_riff = make_wav(8000, 1, 8, 4)[:-2]
    with pytest.raises(ValueError):
        decode_media_header(truncated_riff)


def test_unknown_format_falls_back_in_spark_path(spark):
    """Corrupt blobs must flow through extract_real_metadata as
    format='unknown' rows, never raise."""
    from messdb_spark.queries.multimodal import extract_real_metadata

    media = spark.createDataFrame(
        [(1, bytearray(make_bmp(2, 2))), (2, bytearray(b"garbage"))],
        "doc_id long, blob binary")
    rows = {r["doc_id"]: r for r in extract_real_metadata(media).collect()}
    assert rows[1]["format"] == "bmp" and rows[1]["width"] == 2
    assert rows[2]["format"] == "unknown" and rows[2]["n_bytes"] == 7
    assert rows[2]["width"] is None
