"""Incremental LSH band-key registry maintenance over the txlog —
rehearsed r13 catalog candidate `lsh_incremental_twin` (the
bm25_incremental_index discipline applied to the dedup index)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_lsh_incremental_hash_matches_batch_oracle(spark, sf_dir):
    """Pairs from the merged (v0 base + v1 delta) registry must equal
    the from-scratch batch LSH over the union corpus exactly — the
    dedup index composes under ingest."""
    from logstream_processing_service_spark.queries_text import (
        lsh_incremental_oracle_sql,
        q_lsh_incremental_twin,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "lsh_incremental_twin", q_lsh_incremental_twin,
        lsh_incremental_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_delta_commit_writes_only_delta_band_keys(spark, tmp_path):
    """The append commit must carry ONLY the delta docs' band keys —
    the O(|delta|) contract: ingest never re-signatures the base."""
    from logstream_processing_service_spark.operators import txlog as TX
    from logstream_processing_service_spark.operators.dedup import (
        lsh_incremental_pairs,
    )

    body = " ".join(f"w{i}" for i in range(30))
    base = spark.createDataFrame(
        [(1, body), (2, "totally different words here friend")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame([(3, body)], "doc_id long, text string")
    t = str(tmp_path / "reg")
    pairs = lsh_incremental_pairs(base, delta, t)
    v1_files = sorted(
        set(TX._manifest(t, 1)["files"]) - set(TX._manifest(t, 0)["files"])
    )
    v1 = spark.read.parquet(*v1_files)
    assert set(r["doc_id"] for r in v1.select("doc_id").distinct().collect()) == {3}
    # and the merged registry finds the cross-commit verbatim pair
    got = [(r["d1"], r["d2"], r["jaccard"]) for r in pairs.collect()]
    assert got == [(1, 3, 1.0)]
