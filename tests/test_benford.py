"""Benford first-digit audit — rehearsed r11 catalog candidate
`benford_deviation_report`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.analytics import (
    benford_deviation_report,
    benford_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_benford_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_analytics import (
        q_benford_deviation_report,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "benford_deviation_report", q_benford_deviation_report,
        benford_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_fabricated_uniform_vs_benford_series(spark):
    """Two planted segments: 'nat' is exactly Benford at n=100 by
    construction (digit d appears round(100·log10(1+1/d)) times —
    30,18,12,10,8,7,6,5,5 — 101 draws), 'fab' is a fabricated
    uniform-digit feed
    (all digits equally common). The report must show near-zero
    deviations for nat and the textbook uniform signature for fab
    (digit 1 under-represented by ~0.19, digit 9 over by ~0.065)."""
    import math

    rows, eid = [], 0
    nat_counts = [round(100 * math.log10(1 + 1 / d)) for d in range(1, 10)]
    for d, c in zip(range(1, 10), nat_counts):
        for _ in range(c):
            rows.append((eid, "nat", d + 0.23))
            eid += 1
    for d in range(1, 10):
        for _ in range(11):
            rows.append((eid, "fab", d * 10.0 + 0.5))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {(r["event_type"], r["digit"]): r
           for r in benford_deviation_report(ev).collect()}
    assert len(out) == 18
    for d in range(1, 10):
        assert out[("nat", d)]["abs_dev"] < 0.007  # rounding of 101 draws
    assert out[("fab", 1)]["abs_dev"] > 0.18
    assert out[("fab", 9)]["abs_dev"] > 0.06
    assert all(out[("fab", d)]["n"] == 11 for d in range(1, 10))


def test_missing_digit_kept_as_zero_row(spark):
    """A segment whose values never start with 9: the digit-9 row must
    STAY in the spine with n=0 and abs_dev == expected_p — the missing
    digit is the signal, not an absent row."""
    rows = [(i, "t", float(d)) for i, d in enumerate([1, 2, 3, 4, 5, 6, 7, 8] * 3)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["digit"]: r for r in benford_deviation_report(ev).collect()}
    assert out[9]["n"] == 0
    assert out[9]["observed_p"] == 0.0
    assert out[9]["abs_dev"] == out[9]["expected_p"]


def test_type_with_no_positive_values_is_null_not_nan(spark):
    """r10-advice regression: the spine covers ALL event types but
    counts only value>0 rows, so a type whose values are all <= 0 has a
    zero window total. observed_p must be NULL (guarded) on BOTH
    engines — never 0.0/0.0 -> NaN, whose NULL-vs-nan rendering is
    engine/version dependent."""
    import duckdb
    import pandas as pd

    from .oracle_harness import normalize

    rows = [(0, "pos", 12.5), (1, "pos", 91.0), (2, "neg", -3.0),
            (3, "neg", 0.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = benford_deviation_report(ev)
    got = {(r["event_type"], r["digit"]): r for r in out.collect()}
    assert len(got) == 18  # both types keep the full 9-digit spine
    for d in range(1, 10):
        r = got[("neg", d)]
        assert r["n"] == 0
        assert r["observed_p"] is None  # guarded, not NaN
        assert r["abs_dev"] is None
    assert got[("pos", 1)]["observed_p"] == 0.5
    assert got[("pos", 9)]["observed_p"] == 0.5

    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"]),
    )
    rel = con.sql(benford_oracle_sql())
    s_norm = normalize(out.columns, [tuple(r) for r in out.collect()])
    d_norm = normalize(list(rel.columns), rel.fetchall())
    assert s_norm == d_norm
