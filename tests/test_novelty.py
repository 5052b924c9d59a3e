"""Shingle novelty scores — r9 catalog candidate `novelty_scores`
(dedup-aware sampling signal: what each doc ADDS, the complement of
dup_shingle_profile's how-duplicated-am-I)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    novelty_scores,
    novelty_scores_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_novelty_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "novelty_scores",
        lambda s, sf: novelty_scores(load_table(s, sf, "documents")),
        novelty_scores_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_first_arrival_semantics(spark):
    """doc 0 is all-novel by construction; doc 1 copies doc 0 verbatim
    (novelty 0); doc 2 = half doc 0's text + fresh tail (novelty
    strictly between); first-arrival follows MIN doc_id, matching the
    dedup keep rule."""
    base = " ".join(f"w{i}" for i in range(20))
    fresh = " ".join(f"z{i}" for i in range(14))
    half = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, base, "s"), (1, base, "s"), (2, half + " " + fresh, "s")],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: r for r in novelty_scores(docs).collect()}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0
    assert 0.0 < got[2]["novelty"] < 1.0
    # doc 2: shared 5-gram shingles inside w0..w9 come from doc 0; the
    # boundary and z-tail shingles are its own
    assert got[2]["n_novel"] + (10 - 5 + 1) == got[2]["n_shingles"]
