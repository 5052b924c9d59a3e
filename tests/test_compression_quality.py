"""Compression-ratio quality signal (textanalysis.compression_quality)
— r7 catalog candidate (rows-only: DuckDB has no deflate).

The distributed numbers must equal a driver-side zlib recomputation
exactly (same level, same bytes), and the planted corpora pin the two
gates: templated text trips too_repetitive, random bytes trip
too_random, natural text trips neither, and short docs get NULL flags
(deflate overhead would mislabel them).
"""

from __future__ import annotations

import random
import string
import zlib

from logstream_processing_service_spark.operators.textanalysis import (
    compression_quality,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_driver_zlib_exactly(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_bytes"], r["n_compressed"])
        for r in compression_quality(docs).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        raw = row["text"].encode("utf-8")
        want = (len(raw), len(zlib.compress(raw, 6)))
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_planted_gates(spark):
    rng = random.Random(11)
    natural = " ".join(
        rng.choice(
            ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "while", "rivers", "run", "through", "green",
             "valleys", "and", "mountains"]
        )
        for _ in range(200)
    )
    templated = "error code 42 at module foo; " * 40
    noise = "".join(
        rng.choice(string.ascii_letters + string.digits + string.punctuation)
        for _ in range(1200)
    )
    short = "tiny"
    rows = {
        r["doc_id"]: r
        for r in compression_quality(
            _docs(spark, [natural, templated, noise, short])
        ).collect()
    }
    assert rows[0]["too_repetitive"] is False
    assert rows[0]["too_random"] is False
    assert rows[1]["too_repetitive"] is True
    assert rows[2]["too_random"] is True
    assert rows[3]["too_repetitive"] is None  # below min_bytes: undefined
    assert rows[3]["too_random"] is None
    assert rows[1]["compression_ratio"] < rows[0]["compression_ratio"]
    assert rows[2]["compression_ratio"] > rows[0]["compression_ratio"]


def test_empty_doc_has_null_ratio(spark):
    r = compression_quality(_docs(spark, [""])).collect()[0]
    assert r["n_bytes"] == 0 and r["compression_ratio"] is None
