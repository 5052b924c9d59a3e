"""Last/first-touch purchase attribution — r9 catalog candidate
`purchase_attribution`. One user-keyed running-window pass (no
purchase×click self-join); the packed ts:id string max makes the
"latest preceding click" identical on both engines."""

from __future__ import annotations

import datetime

import pytest

from logstream_processing_service_spark.operators.mining import (
    purchase_attribution,
    purchase_attribution_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_attribution_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "purchase_attribution",
        lambda s, sf: purchase_attribution(load_table(s, sf, "events")),
        purchase_attribution_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _ev(spark, rows):
    """rows: (event_id, user, type, offset_seconds from epoch day)."""
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=s), t, u, 1.0)
            for i, u, t, s in rows
        ],
        "event_id long, ts timestamp, event_type string, user_id long,"
        " value double",
    )


def test_hand_computed_models(spark):
    day = 24 * 3600
    rows = [
        # user 1: click(10), click(20), purchase(30) -> last=2, first=1
        (1, 1, "click", 10),
        (2, 1, "click", 20),
        (3, 1, "purchase", 30),
        # user 1: second purchase 10 days later -> outside 7d lookback,
        # last_click NULL but first_click still 1
        (4, 1, "purchase", 30 + 10 * day),
        # user 2: purchase with no prior click at all
        (5, 2, "purchase", 50),
        # user 2: a click AFTER the purchase must not attribute
        (6, 2, "click", 60),
        # user 3: view between click and purchase is transparent
        (7, 3, "click", 100),
        (8, 3, "view", 110),
        (9, 3, "purchase", 120),
    ]
    got = {
        r["event_id"]: r
        for r in purchase_attribution(_ev(spark, rows)).collect()
    }
    assert set(got) == {3, 4, 5, 9}
    assert got[3]["last_click_id"] == 2 and got[3]["first_click_id"] == 1
    assert got[3]["last_click_lag_s"] == 10.0
    assert got[4]["last_click_id"] is None
    assert got[4]["last_click_lag_s"] is None
    assert got[4]["first_click_id"] == 1
    assert got[5]["last_click_id"] is None
    assert got[5]["first_click_id"] is None
    assert got[9]["last_click_id"] == 7
    assert got[9]["last_click_lag_s"] == 20.0


def test_attribution_plan_single_window_no_self_join(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        purchase_attribution(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("SortMergeJoin") == 0  # no purchase x click join
    assert "Window" in plan
    assert "CartesianProduct" not in plan
