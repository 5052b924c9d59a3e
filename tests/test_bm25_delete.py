"""Tombstone DELETE path of the incremental BM25 posting registry —
rehearsed r13 catalog candidate `bm25_delete_twin` (completes the
add/update/delete triangle bm25_incremental_index declared open)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_bm25_delete_hash_matches_post_delete_batch_oracle(spark, sf_dir):
    """Ranked search over the tombstoned registry must be
    INDISTINGUISHABLE from never having indexed the deleted docs:
    same ranking, same 6-dp scores — which forces N, avgdl and df to
    all shrink correctly (stats are derived from the live postings,
    so staleness is impossible by construction)."""
    from logstream_processing_service_spark.queries_text import (
        bm25_delete_oracle_sql,
        q_bm25_delete_twin,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "bm25_delete_twin", q_bm25_delete_twin,
        bm25_delete_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_tombstone_commit_is_doc_grain(spark, tmp_path):
    """The DELETE commit must write ONE row per deleted doc (the
    O(|deletes|) contract — never the deleted docs' postings), and the
    merged read must contain zero rows for tombstoned docs."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators import txlog as TX
    from logstream_processing_service_spark.operators.retrieval import (
        bm25_incremental_delete,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta delta"),
            (3, "alpha epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    dels = spark.createDataFrame([(2,)], "doc_id long")
    t = str(tmp_path / "reg")
    live = bm25_incremental_delete(docs, dels, t)
    # v1 appended exactly ONE tombstone row
    v1_files = sorted(
        set(TX._manifest(t, 1)["files"]) - set(TX._manifest(t, 0)["files"])
    )
    v1_rows = spark.read.parquet(*v1_files).collect()
    assert len(v1_rows) == 1 and v1_rows[0]["doc_id"] == 2
    assert v1_rows[0]["tc"] == -1
    # the live read carries no trace of doc 2, and all of docs 1/3
    got = live.collect()
    assert {r["doc_id"] for r in got} == {1, 3}
    assert all(r["tc"] >= 1 for r in got)
    # deletion-aware df: 'beta' survives only via doc 1
    beta = [r for r in got if r["tok"] == "beta"]
    assert len(beta) == 1 and beta[0]["doc_id"] == 1
    # doc-length/stat derivation sees the shrunken corpus
    assert live.select("doc_id").distinct().count() == 2
