"""Holt-Winters residual anomaly flags — r8-session catalog query
`holt_winters_anomaly`. The oracle wraps the full HW recursive-CTE twin
and applies the same residual moments; a planted weekly series with one
spiked day pins the seasonal-awareness claim."""

from __future__ import annotations

import datetime

import pytest

from logstream_processing_service_spark.operators.trends import (
    holt_winters_anomaly,
    holt_winters_anomaly_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_hw_anomaly_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "holt_winters_anomaly",
        lambda s, sf: holt_winters_anomaly(load_table(s, sf, "events")),
        holt_winters_anomaly_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_spiked_day_flags_and_seasonal_twin_does_not(spark):
    """Six strict weekly cycles with ONE day doubled: only that day
    flags. The same LEVEL on a high-season day would be normal — the
    static-z strawman would flag every peak day instead."""
    week = [10, 20, 30, 40, 30, 20, 10]
    counts = week * 6
    spike_idx = 3 * 7 + 1  # a Tuesday in week 4
    counts[spike_idx] = 40  # doubled vs the seasonal expectation of 20
    rows, eid = [], 0
    for d, c in enumerate(counts):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for _ in range(c):
            rows.append((eid, day, "load", eid % 7, 1.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "user_id long, value double",
    )
    out = holt_winters_anomaly(ev).collect()
    flagged = [r for r in out if r["is_anomaly"]]
    days_flagged = {r["day"] for r in flagged}
    spike_day = (
        datetime.datetime(2024, 1, 1) + datetime.timedelta(days=spike_idx)
    ).date()
    assert spike_day in days_flagged, sorted(days_flagged)
    # 40 is a NORMAL level on Thursdays — no Thursday may flag
    for r in flagged:
        assert r["day"].weekday() != 3 or r["day"] == spike_day
