"""txlog VACUUM (unreferenced-file GC) driver-checked — rehearsed r14
catalog candidate `snapshot_vacuum_twin` (optimize makes the old dirs
unreferenced; vacuum retain-1 collects them; the live read is intact)."""

from __future__ import annotations

import os

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_vacuum_twin_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_relational import (
        q_snapshot_vacuum_twin,
        snapshot_vacuum_oracle_sql,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "snapshot_vacuum_twin", q_snapshot_vacuum_twin,
        snapshot_vacuum_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_vacuum_keeps_files_a_restore_re_referenced(spark, tmp_path):
    """The restore-pin interplay at the twin's grain: restore(v0)
    re-references v0's files in the NEW latest manifest, so a vacuum
    that drops the v0/v1 manifests must still keep v0's data dir — the
    restored read survives the GC."""
    from logstream_processing_service_spark.operators import txlog as TX

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(3, "z")], "id long, v string")
    t = str(tmp_path / "tbl")
    TX.commit(t, a)
    TX.commit(t, b, mode="append")
    TX.restore(t, 0)  # v2 references v0's files
    rep = TX.vacuum(t, retain_last=1, min_age_seconds=0.0)
    assert rep["removed_manifests"] == 2          # v0, v1 manifests
    # v0's dir is pinned by v2; only v1's append dir is collectable
    assert rep["removed_data_dirs"] == 1
    assert TX.read_snapshot(spark, t).count() == 2
    # the pinned dir physically survives
    kept = {
        os.path.dirname(f) for f in TX._manifest(t, 2)["files"]
    }
    for d in kept:
        assert os.path.isdir(d)
