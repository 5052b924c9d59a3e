"""txlog RESTORE (rollback) driver-checked — rehearsed r14 catalog
candidate `snapshot_restore_twin`."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_restore_twin_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_relational import (
        q_snapshot_restore_twin,
        snapshot_restore_oracle_sql,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "snapshot_restore_twin", q_snapshot_restore_twin,
        snapshot_restore_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_restore_is_a_commit_not_a_rewrite(spark, tmp_path):
    """restore(v0) creates v2 whose manifest points at v0's FILES
    (no data copied), history stays intact (v1 time-travelable), and a
    subsequent append builds on the restored state."""
    from logstream_processing_service_spark.operators import txlog as TX

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(3, "z")], "id long, v string")
    t = str(tmp_path / "tbl")
    TX.commit(t, a)
    TX.commit(t, b, mode="append")
    v2 = TX.restore(t, 0)
    assert v2 == 2
    assert TX._manifest(t, 2)["files"] == TX._manifest(t, 0)["files"]
    assert TX.read_snapshot(spark, t).count() == 2          # restored
    assert TX.read_snapshot(spark, t, version=1).count() == 3  # history
    TX.commit(t, b, mode="append")
    assert TX.read_snapshot(spark, t).count() == 3  # append on restored
