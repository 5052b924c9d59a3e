"""Per-band MinHash-LSH audit — rehearsed r10 catalog candidate
`lsh_quality_report`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    lsh_quality_report,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_lsh_quality_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_text import (
        _lsh_quality_oracle,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "lsh_quality_report",
        lambda s, sf: lsh_quality_report(load_table(s, sf, "documents")),
        _lsh_quality_oracle(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_duplicates_raise_precision(spark):
    """A corpus of verbatim duplicate pairs plus unrelated docs: every
    band's candidates are the true pairs -> precision 1.0 on all 4
    bands; counts match the planted pair count."""
    texts = []
    for i in range(6):
        body = " ".join(f"tok{i}w{j}" for j in range(30))
        texts.append((2 * i, body))
        texts.append((2 * i + 1, body))  # verbatim duplicate
    for i in range(12, 18):
        texts.append((i + 10, " ".join(f"solo{i}x{j}" for j in range(30))))
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = lsh_quality_report(docs).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_candidates"] == 6 and r["n_true"] == 6
        assert r["precision"] == 1.0
