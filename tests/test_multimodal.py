"""Multimodal plumbing: the REAL (non-stubbed) pure-Python image header
parsers, plus the Arrow mapInPandas dimension pipeline end-to-end."""

from __future__ import annotations

import struct

from logstream_processing_service_spark.operators.multimodal import (
    parse_jpeg_dims,
    parse_png_dims,
    parse_wav_meta,
    synthetic_png,
    synthetic_wav,
)


def _minimal_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0 + DHT (non-frame 0xC4, must be skipped) + SOF0 + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">H", height)
        + struct.pack(">H", width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dht + sof0 + b"\xff\xd9"


def test_parse_png_dims_roundtrip():
    for w, h in [(1, 1), (224, 224), (512, 333), (4096, 1)]:
        assert parse_png_dims(synthetic_png(w, h)) == (w, h)


def test_parse_png_rejects_garbage():
    assert parse_png_dims(b"") is None
    assert parse_png_dims(b"not a png at all, nope") is None
    # valid signature, truncated header
    assert parse_png_dims(b"\x89PNG\r\n\x1a\n\x00\x00") is None


def test_parse_jpeg_dims_sof0_after_skippable_markers():
    for w, h in [(1, 1), (640, 480), (65535, 1)]:
        assert parse_jpeg_dims(_minimal_jpeg(w, h)) == (w, h)


def test_parse_jpeg_rejects_garbage():
    assert parse_jpeg_dims(b"") is None
    assert parse_jpeg_dims(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg_dims(b"\xff\xd8\xff\xd9") is None  # no frame header


def test_image_dimensions_pipeline(spark, sf_dir):
    from logstream_processing_service_spark.operators.multimodal import (
        image_dimensions,
        with_synthetic_image_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = image_dimensions(with_synthetic_image_payload(docs))
    rows = out.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["media_type"] == "image/png"
        assert r["width"] == r["doc_id"] % 512 + 1
        assert r["height"] == r["doc_id"] % 333 + 1


def test_image_dimensions_null_for_non_image(spark, sf_dir):
    from logstream_processing_service_spark.operators.multimodal import (
        image_dimensions,
        with_binary_payload,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = image_dimensions(with_binary_payload(docs))  # text/plain payloads
    for r in out.collect():
        assert r["width"] is None and r["height"] is None


def test_parse_wav_meta_roundtrip():
    b = synthetic_wav(2, 44100, 777)
    assert parse_wav_meta(b) == (2, 44100, 16, 777)
    # odd data size exercises word-aligned chunk walking
    b = synthetic_wav(1, 8000, 3)
    assert parse_wav_meta(b) == (1, 8000, 16, 3)


def test_parse_wav_rejects_garbage():
    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFF\x00\x00\x00\x00DATA" + b"\x00" * 40) is None
    assert parse_wav_meta(b"not audio at all, just text bytes padding...") is None


def test_audio_metadata_pipeline(spark, sf_dir):
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.multimodal import (
        audio_metadata,
        with_synthetic_audio_payload,
    )
    from logstream_processing_service_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = audio_metadata(with_synthetic_audio_payload(docs)).collect()
    assert len(out) == 20
    rates = (8000, 16000, 22050, 44100)
    for r in out:
        d = r["doc_id"]
        assert r["n_channels"] == d % 2 + 1
        assert r["sample_rate"] == rates[d % 4]
        assert r["bits_per_sample"] == 16
        assert r["n_frames"] == d % 1000 + 1
        assert abs(r["duration_ms"] - r["n_frames"] * 1000.0 / r["sample_rate"]) < 1e-6
