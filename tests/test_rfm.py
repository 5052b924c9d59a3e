"""RFM customer segmentation — rehearsed r10 catalog candidate
`rfm_segments` (nation-keyed quintiles, no global ntile)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.analytics import (
    rfm_segments,
    rfm_segments_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_rfm_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "rfm_segments",
        lambda s, sf: rfm_segments(
            load_table(s, sf, "orders"), load_table(s, sf, "customer")
        ),
        rfm_segments_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_hand_quintiles(spark):
    """10 customers in one nation with strictly increasing R/F/M:
    scores are the textbook quintiles 1,1,2,2,3,3,4,4,5,5 and the
    best customer lands segment 555."""
    from datetime import datetime

    orders = []
    ok = 0
    for c in range(10):
        for i in range(c + 1):  # frequency strictly increasing
            orders.append(
                (ok, c, float(100 * (c + 1)),
                 datetime(2024, 1, 1 + c))  # recency increasing
            )
            ok += 1
    odf = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate timestamp",
    )
    cdf = spark.createDataFrame(
        [(c, 7) for c in range(10)], "c_custkey long, c_nationkey int"
    )
    got = {r["c_custkey"]: r for r in rfm_segments(odf, cdf).collect()}
    want = [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    for c in range(10):
        assert got[c]["r_score"] == want[c] == got[c]["f_score"] == got[c]["m_score"]
    assert got[9]["segment"] == 555 and got[0]["segment"] == 111


def test_one_nation_exchange(spark):
    """All three quintile windows share the nation partitioning: one
    hashpartitioning exchange on nation (plus the per-customer agg and
    the presentation sort), no single-partition global window."""
    df = rfm_segments(
        load_table(spark, SF_DIR, "orders"),
        load_table(spark, SF_DIR, "customer"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import re

    assert not re.search(r"Window \[[^\]]*\], \[\](?!,)", plan), plan[:1500]
