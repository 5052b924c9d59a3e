"""Additive Holt-Winters daily forecast — r8 catalog candidate
`holt_winters_daily`. The DuckDB twin unrolls the coupled
level/trend/seasonal recurrence as a RECURSIVE CTE carrying the m
seasonal slots as a DOUBLE list; every coefficient is repr()-
interpolated and CAST to DOUBLE so both engines execute the identical
IEEE op sequence (DuckDB's bare decimal literals are DECIMAL-typed and
1.0 - 0.3 differs from the double by an ulp — enough to flip 6-dp
rounding over a long recurrence)."""

from __future__ import annotations

import datetime

import pytest

from logstream_processing_service_spark.operators.trends import (
    holt_winters_daily,
    holt_winters_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_holt_winters_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "holt_winters_daily",
        lambda s, sf: holt_winters_daily(load_table(s, sf, "events")),
        holt_winters_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _mk_events(spark, counts):
    """counts[d] events on day d (epoch 2024-01-01 + d)."""
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for _ in range(c):
            rows.append((eid, day, "load", eid % 7, 1.0))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "user_id long, value double"
    )


def test_pure_seasonal_series_fits_exactly_and_forecast_repeats(spark):
    """A strict weekly pattern with zero trend: after the warm-up the
    one-step fits converge onto the observations and the 7-day forecast
    reproduces the next week's pattern."""
    week = [10, 20, 30, 40, 30, 20, 10]
    out = holt_winters_daily(_mk_events(spark, week * 6)).collect()
    fits = [r for r in out if r["kind"] == "fit"]
    fc = [r for r in out if r["kind"] == "forecast"]
    assert len(fc) == 7
    # init is exact for a perfectly periodic series: every fit is exact
    for r in fits:
        assert abs(r["yhat"] - r["y"]) < 1e-6, (r["day"], r["yhat"], r["y"])
    # the forecast continues the weekly pattern (42 days = 6 weeks, so
    # forecast day h matches week[(42 + h - 1) % 7])
    for h, r in enumerate(sorted(fc, key=lambda r: r["day"]), start=1):
        assert abs(r["yhat"] - week[(42 + h - 1) % 7]) < 1e-6


def test_trend_is_tracked(spark):
    """Seasonal pattern + linear growth of +7/week: the forecast must
    carry the trend forward, not just repeat the last week."""
    week = [10, 20, 30, 40, 30, 20, 10]
    counts = [week[d % 7] + d for d in range(49)]
    out = holt_winters_daily(_mk_events(spark, counts)).collect()
    fc = sorted(
        (r for r in out if r["kind"] == "forecast"), key=lambda r: r["day"]
    )
    for h, r in enumerate(fc, start=1):
        want = week[(49 + h - 1) % 7] + (49 + h - 1)
        assert abs(r["yhat"] - want) / want < 0.15, (h, r["yhat"], want)


def test_short_series_skipped(spark):
    out = holt_winters_daily(_mk_events(spark, [5] * 14)).collect()
    assert out == []  # needs >= 2m + 1 observed days


def test_horizon_beyond_season_refused(spark):
    with pytest.raises(ValueError, match="re-indexing"):
        holt_winters_daily(_mk_events(spark, [5] * 15), horizon=8)
