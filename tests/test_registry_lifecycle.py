"""Registry lifecycle completion — rehearsed r13 catalog candidates
`bm25_compaction_twin` (add/delete/COMPACT) and
`char_window_incremental_twin` (char-grain postings, df derived at
read)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_compaction_hash_matches_post_delete_oracle(spark, sf_dir):
    """Search over the compacted registry (plain scan, no tombstone
    filtering) must equal the post-delete batch rebuild — compaction
    is a pure physical rewrite."""
    from logstream_processing_service_spark.queries_text import (
        bm25_delete_oracle_sql,
        q_bm25_compaction_twin,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "bm25_compaction_twin", q_bm25_compaction_twin,
        bm25_delete_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_compaction_folds_tombstones_and_preserves_time_travel(
    spark, tmp_path
):
    """After compaction: (a) the new snapshot has FEWER files than the
    merged v1 and (b) contains zero tombstone rows; (c) the
    pre-compaction v1 is still time-travelable and its tombstone-aware
    read equals the compacted read (snapshot isolation)."""
    from logstream_processing_service_spark.operators import txlog as TX
    from logstream_processing_service_spark.operators.retrieval import (
        bm25_compact_registry,
        bm25_incremental_delete,
        live_postings,
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
    bm25_incremental_delete(docs, dels, t)
    v2 = bm25_compact_registry(spark, t)
    assert v2 == 2
    assert len(TX._manifest(t, 2)["files"]) < len(TX._manifest(t, 1)["files"])
    compacted = TX.read_snapshot(spark, t)
    assert compacted.filter("tc < 0").count() == 0
    assert compacted.filter("doc_id = 2").count() == 0
    # time travel: v1's tombstone-aware read == the compacted read
    v1 = live_postings(TX.read_snapshot(spark, t, version=1))
    a = sorted(tuple(r) for r in v1.collect())
    b = sorted(tuple(r) for r in compacted.collect())
    assert a == b


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_char_window_incremental_hash_matches_batch_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.dedup import (
        char_window_hash_oracle_sql,
    )
    from logstream_processing_service_spark.queries_text import (
        q_char_window_incremental_twin,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "char_window_incremental_twin",
        q_char_window_incremental_twin,
        char_window_hash_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_char_window_delta_commit_is_delta_grain_and_df_fresh(
    spark, tmp_path
):
    """(a) v1 carries only the delta docs' window postings; (b) the df
    analytic sees CROSS-COMMIT duplication — a delta doc repeating a
    base doc's window must show dup windows on BOTH docs (stored df
    would miss it: the base doc's rows predate the delta)."""
    from logstream_processing_service_spark.operators import txlog as TX
    from logstream_processing_service_spark.operators.dedup import (
        char_window_incremental_profile,
    )

    body = "x" * 10 + "shared-window-content-" * 4  # > 40 chars
    base = spark.createDataFrame(
        [(1, body), (2, "completely different text " * 4)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame([(3, body)], "doc_id long, text string")
    t = str(tmp_path / "reg")
    prof = {r["doc_id"]: r for r in
            char_window_incremental_profile(base, delta, t).collect()}
    v1_files = sorted(
        set(TX._manifest(t, 1)["files"]) - set(TX._manifest(t, 0)["files"])
    )
    v1 = spark.read.parquet(*v1_files)
    assert set(
        r["doc_id"] for r in v1.select("doc_id").distinct().collect()
    ) == {3}
    assert prof[1]["n_dup_windows"] == prof[1]["n_windows"]  # all shared
    assert prof[3]["n_dup_windows"] == prof[3]["n_windows"]
    assert prof[1]["max_window_df"] == 2
    assert prof[2]["n_dup_windows"] == 0
