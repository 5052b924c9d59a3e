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


def test_single_bin_fast_path_matches_oracle(spark):
    """ADVICE-r8 (low): n_bins=1 used to leave `cuts` None and raise;
    now it is a no-cut fast path (bin 0 everywhere) on BOTH engines."""
    con = duckdb_conn(SF_DIR)
    r = compare_one(
        spark,
        con,
        "equidepth_bins_1",
        lambda s, sf: equidepth_bins(load_table(s, sf, "events"), n_bins=1),
        equidepth_bins_oracle_sql(n_bins=1),
        SF_DIR,
    )
    assert r["status"] == "OK", r


def test_fewer_rows_than_bins_keeps_cut_multiplicity(spark):
    """When n < n_bins several cut ranks coincide on one row; the
    single-pass explode must keep those duplicate cuts (they each count
    in the strictly-greater assignment, exactly like the oracle's
    UNION ALL) — one value -> 3 identical cuts -> everything in bin 0."""
    ev = spark.createDataFrame(
        [(1, "t", 5.0), (2, "u", 1.0), (3, "u", 9.0)],
        "event_id long, event_type string, value double",
    )
    rows = {(r["event_type"], r["bin"]): r["n"]
            for r in equidepth_bins(ev, n_bins=4).collect()}
    assert rows[("t", 0)] == 1  # the lone value sits in bin 0
    # two values: cuts at ranks ceil(i*2/4)=1,1,2 -> [1.0,1.0,9.0];
    # 1.0 beats no cut (bin 0), 9.0 beats the two 1.0 cuts (bin 2)
    assert rows[("u", 0)] == 1 and rows[("u", 2)] == 1


def test_cuts_selected_in_one_pass(spark):
    """ADVICE-r8 (low): the previous form filtered the ranked table once
    per cut rank, re-running the event scan + per-type sort n_bins-1
    times. The single-pass form has exactly ONE per-type sort window in
    the plan."""
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        equidepth_bins(ev, n_bins=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # row_number windows ordered by v: the cut-selection sort appears
    # once, not n_bins-1 times
    n_rank_windows = len(re.findall(r"row_number\(\)", plan))
    assert n_rank_windows == 1, plan[:2000]
