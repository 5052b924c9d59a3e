"""Duplicate-n-gram exposure profile (operators/dedup.py
dup_shingle_profile) — r7 catalog candidate `dup_shingle_profile`.

Rehearsed through the driver's compare harness at both test SFs, plus a
planted-corpus pin of the multiplicity and df≥2 semantics.
"""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    dup_shingle_profile,
    dup_shingle_profile_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_dup_shingle_profile_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "dup_shingle_profile",
        lambda s, sf: dup_shingle_profile(load_table(s, sf, "documents")),
        dup_shingle_profile_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_duplicates_and_multiplicity(spark):
    """Docs 0 and 1 share one 5-gram; doc 2 repeats a PRIVATE 5-gram
    twice (must NOT count: df is per distinct doc); doc 3 contains the
    shared 5-gram twice (multiplicity: 2 duplicated positions)."""
    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} one two three four five"),
            (1, f"zero {shared} six seven eight nine"),
            (2, "p q r s t p q r s t"),
            (3, f"{shared} x {shared}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_dup"])
        for r in dup_shingle_profile(docs, n=5).collect()
    }
    # doc 0: 10 words -> 6 positions; exactly 1 carries the shared gram
    assert out[0] == (6, 1)
    # doc 1: 10 words -> 6 positions; the shared gram sits at offset 1
    assert out[1] == (6, 1)
    # doc 2: private repeats only -> its repeated grams have df == 1
    assert out[2][1] == 0
    # doc 3: 11 words -> 7 positions; the shared gram occurs at offsets
    # 0 and 6 -> multiplicity 2
    assert out[3][0] == 7 and out[3][1] >= 2
