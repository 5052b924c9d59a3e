"""Embedding drift report — r8-session catalog query
`embedding_drift_report`. Exact per-dim mean grain proven hash-stable
by the nearest_centroid oracle; a planted shifted-cluster fixture pins
the drift signal."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.similarity import (
    embedding_drift_report,
)
from logstream_processing_service_spark.queries_vector import (
    q_embedding_drift_report,
)
from logstream_processing_service_spark.catalog import oracle_sql

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_drift_report_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "embedding_drift_report",
        q_embedding_drift_report,
        oracle_sql()["embedding_drift_report"],
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_shifted_cluster_dominates_drift(spark):
    """Labels 0/1 centered at ±e1 (they cancel in the global mean);
    label 2 is a SMALL cluster pushed to 10·e2 with 10x norms: global
    centroid = (0, 2), so label-2 shift is 8 vs the symmetric labels'
    √(1+4) ≈ 2.24 — the drifted cluster must dominate and the
    symmetric labels must match each other exactly."""
    rows = []
    vid = 0
    for k in range(20):
        e = [0.0] * 8; e[0] = 1.0 if k % 2 == 0 else -1.0
        rows.append((vid, e, 0 if k % 2 == 0 else 1)); vid += 1
    for k in range(5):
        e = [0.0] * 8; e[1] = 10.0
        rows.append((vid, e, 2)); vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {r["label"]: r for r in embedding_drift_report(emb).collect()}
    assert got[0]["centroid_shift"] == got[1]["centroid_shift"]
    assert got[2]["centroid_shift"] > 3 * got[0]["centroid_shift"]
    assert got[2]["norm_ratio"] > 2.0
    assert got[0]["avg_norm"] == 1.0 and got[2]["avg_norm"] == 10.0
