"""EWMA control chart — r9 catalog candidate `ewma_control_chart`.
Recursive-CTE oracle parity plus a planted sustained-shift fixture
(the small-shift case a 3-sigma Shewhart chart misses but EWMA flags)."""

from __future__ import annotations

from datetime import datetime

import pytest

from logstream_processing_service_spark.operators.trends import (
    ewma_control_chart,
    ewma_control_chart_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_ewma_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "ewma_control_chart",
        lambda s, sf: ewma_control_chart(load_table(s, sf, "events")),
        ewma_control_chart_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_sustained_small_shift_flags(spark):
    """30 days at 10/day then 20 days at 13/day: each shifted day is
    only ~1.5 sigma above the overall mean (sigma ~= 1.5 around the
    combined mu ~= 11.1), so a 3-sigma z chart stays silent — but the
    EWMA statistic accumulates the shift past the tight
    L*sigma*sqrt(a/(2-a)) band and flags the tail."""
    from datetime import timedelta

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for d in range(50):
        n = 10 if d < 30 else 13
        for _ in range(n):
            rows.append((eid, "t", base + timedelta(days=d, minutes=eid % 60)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = ewma_control_chart(ev).collect()
    assert len(out) == 50
    flagged_days = [r["day"] for r in out if r["flag"]]
    assert flagged_days, "sustained shift must flag"
    # the flags concentrate in the shifted regime's tail
    assert all(d.month == 2 for d in flagged_days[-3:])
    # and the pre-shift steady state never flags
    assert all(not r["flag"] for r in out[:25])
