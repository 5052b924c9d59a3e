"""Proximity + coverage second-stage rerank — rehearsed r11 catalog
candidate `proximity_rerank` (the cross-encoder serving shape with
deterministic joint features)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.retrieval import (
    proximity_rerank,
    proximity_rerank_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_prox_rerank_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "proximity_rerank",
        lambda s, sf: proximity_rerank(load_table(s, sf, "documents")),
        proximity_rerank_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_adjacent_terms_outrank_scattered(spark):
    """Two docs with the SAME bag-of-words (identical BM25 score by
    construction): doc 1 has the query terms ADJACENT, doc 2 scatters
    them to opposite ends. BM25 cannot separate them; the proximity
    feature must rank doc 1 first — the joint-feature win that
    motivates the second stage."""
    filler = " ".join(f"pad{i}" for i in range(20))
    rows = [
        (1, f"alpha beta {filler}"),
        (2, f"alpha {filler} beta"),
        (3, "other words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = proximity_rerank(docs, queries=("alpha beta",), k=3).collect()
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["doc_id"] == 1
    assert by_rank[2]["doc_id"] == 2
    assert by_rank[1]["bm25"] == by_rank[2]["bm25"]  # stage 1 is blind
    assert by_rank[1]["min_dist"] == 1
    assert by_rank[2]["min_dist"] == 21
    assert by_rank[1]["coverage"] == 1.0
    assert 3 not in {r["doc_id"] for r in got}  # no query term, no cand


def test_single_term_query_null_min_dist(spark):
    """A one-term query can never have a cross-term distance: min_dist
    is NULL, the proximity term contributes 0, and ranking falls back
    to bm25 + coverage."""
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha x y"), (2, "alpha x y z w")],
        "doc_id long, text string",
    )
    got = proximity_rerank(docs, queries=("alpha",), k=2).collect()
    assert all(r["min_dist"] is None for r in got)
    assert all(r["coverage"] == 1.0 for r in got)
    assert got[0]["score"] == round(got[0]["bm25"] + 0.5, 6)
