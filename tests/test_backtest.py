"""Forecast backtest (MASE/sMAPE vs seasonal naive) — rehearsed r10
catalog candidate `forecast_backtest_report`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.trends import (
    forecast_backtest_report,
    forecast_backtest_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_backtest_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "forecast_backtest_report",
        lambda s, sf: forecast_backtest_report(load_table(s, sf, "events")),
        forecast_backtest_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_perfect_weekly_seasonality_beats_nothing(spark):
    """A perfectly periodic weekly series: the seasonal-naive baseline
    is PERFECT (y_t == y_{t-7}), so MASE is undefined-large — the
    implementation must not divide by zero silently; DuckDB/Spark both
    yield inf/NULL-free output only when ae_nv > 0 somewhere. Use a
    series with a trend so naive errs: y grows by 1/day; HW tracks the
    trend, naive lags 7 behind -> MASE << 1."""
    from datetime import datetime, timedelta

    rows, eid = [], 0
    base = datetime(2024, 1, 1)
    for d in range(35):
        n = 10 + d  # linear growth
        for _ in range(n):
            rows.append((eid, "t", base + timedelta(days=d, minutes=eid % 50)))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )
    out = forecast_backtest_report(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["mae_naive"] == 7.0  # the lag-7 baseline errs by exactly 7/day
    assert r["mase"] < 0.5  # HW tracks the linear trend far better
    assert 0.0 <= r["smape"] < 0.2
