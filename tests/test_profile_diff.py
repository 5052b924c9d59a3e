"""Snapshot data-quality drift report — rehearsed r10 catalog candidate
`profile_diff_report`."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_profile_diff_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_analytics import (
        profile_diff_oracle_sql,
        q_profile_diff_report,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "profile_diff_report", q_profile_diff_report,
        profile_diff_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_null_creep_and_enum_explosion(spark):
    """Old snapshot: no nulls, 2 enum values. New: 50% nulls in v,
    4 enum values -> null_rate_delta 0.5 on v, distinct_ratio 2.0 on e."""
    old = spark.createDataFrame(
        [(i, float(i), "a" if i % 2 else "b") for i in range(8)],
        "id long, v double, e string",
    )
    new = spark.createDataFrame(
        [(i, float(i) if i % 2 else None, f"x{i % 4}") for i in range(8)],
        "id long, v double, e string",
    )
    from logstream_processing_service_spark.operators.analytics import (
        profile_diff_report,
    )

    got = {r["col_name"]: r for r in profile_diff_report(old, new).collect()}
    assert got["v"]["null_rate_delta"] == 0.5
    assert got["e"]["distinct_ratio"] == 2.0
    assert got["id"]["null_rate_delta"] == 0.0
