"""Exact equi-depth binning — r9 catalog candidate `equidepth_bins`.
Rank-selected cut points (no global ntile single-partition window);
ties at a cut land in the lower bin on both engines."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.analytics import (
    equidepth_bins,
    equidepth_bins_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_equidepth_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "equidepth_bins",
        lambda s, sf: equidepth_bins(load_table(s, sf, "events")),
        equidepth_bins_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_hand_computed_quartiles(spark):
    """Values 1..8 on one type: cuts at ranks 2/4/6 -> 2,4,6; bins
    {1,2},{3,4},{5,6},{7,8} (ties at a cut land LOW)."""
    ev = spark.createDataFrame(
        [(i, "t", float(i)) for i in range(1, 9)],
        "event_id long, event_type string, value double",
    )
    rows = equidepth_bins(ev, n_bins=4).collect()
    got = {r["bin"]: r for r in rows}
    assert len(got) == 4
    for b in range(4):
        assert got[b]["n"] == 2
    assert (got[0]["lo"], got[0]["hi"]) == (1.0, 2.0)
    assert (got[3]["lo"], got[3]["hi"]) == (7.0, 8.0)


def test_no_global_single_partition_window(spark):
    """The scale claim: every window is keyed by event_type — no empty
    partitionBy (global ntile) anywhere in the plan."""
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        equidepth_bins(ev)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # a global window prints as "Window [...], []" (no partition spec)
    assert not re.search(r"Window \[[^\]]*\], \[\](?!,)", plan), plan[:1500]
    assert "CartesianProduct" not in plan
