"""Cross-engine parity rehearsals + semantic pins for the r7 catalog
candidates `seasonal_volume_decompose` (operators/trends.py
seasonal_decompose) and `mad_anomaly` (operators/analytics.py).

Both operators exist to make a float-heavy statistic engine-portable:
the decomposition runs on exact integer-scaled detrended units
(420 = lcm(1..7) absorbs every edge-window width) and the MAD flags
rank-select their medians instead of interpolating, so the driver's
value hash must match bit-for-bit at both test SFs.
"""

from __future__ import annotations

import datetime

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from logstream_processing_service_spark.operators.analytics import (
    mad_anomaly,
    mad_anomaly_oracle_sql,
)
from logstream_processing_service_spark.operators.trends import (
    seasonal_decompose,
    seasonal_decompose_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_seasonal_decompose_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "seasonal_volume_decompose",
        lambda s, sf: seasonal_decompose(load_table(s, sf, "events")),
        seasonal_decompose_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_mad_anomaly_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    from logstream_processing_service_spark.sources import load_table

    r = compare_one(
        spark,
        con,
        "mad_anomaly",
        lambda s, sf: mad_anomaly(load_table(s, sf, "events")),
        mad_anomaly_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _ts(day: int, i: int = 0):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(
        days=day, minutes=i
    )


def test_seasonal_recovers_planted_weekly_pattern(spark):
    """4 weeks of volume with Wednesdays 3× the base rate: the seasonal
    component must peak on the planted dow and the reconstruction
    y = trend + seasonal + residual must hold to rounding."""
    rows = []
    eid = 0
    for day in range(28):
        base = 5 if day % 7 != 2 else 15
        for i in range(base):
            rows.append((eid, 1, "click", _ts(day, i), 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    out = seasonal_decompose(df).collect()
    by_dow = {}
    for r in out:
        by_dow.setdefault(r["dow"], []).append(r["seasonal"])
        assert r["y"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=3e-6
        )
    means = {d: sum(v) / len(v) for d, v in by_dow.items()}
    planted = max(means, key=means.get)
    # day index 2 of an epoch-anchored mod-7 cycle
    x0 = (datetime.date(2024, 1, 3) - datetime.date(1970, 1, 1)).days
    assert planted == x0 % 7
    assert means[planted] > 4  # ~ +8.6 expected, others negative


def test_mad_flags_planted_outliers_and_resists_contamination(spark):
    """999 inliers at value≈10 ± small noise, 5 planted at 1000: MAD
    flags exactly the planted rows, and the median/mad stay at the
    inlier scale (a mean/std detector would be dragged)."""
    rows = [
        (i, 1, "click", _ts(i % 28), 10.0 + (i % 7) * 0.1)
        for i in range(999)
    ] + [(1000 + j, 1, "click", _ts(j), 1000.0) for j in range(5)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    r = mad_anomaly(df).collect()[0]
    assert r["n_anomalies"] == 5
    assert 10.0 <= r["med"] <= 10.6
    assert r["mad"] <= 0.5


def test_rank_median_matches_statistics_median(spark):
    """_rank_median == statistics.median on odd AND even counts."""
    import statistics

    from logstream_processing_service_spark.operators.analytics import (
        _rank_median,
    )

    for vals in ([3.0, 1.0, 2.0], [4.0, 1.0, 3.0, 2.0], [5.0], [2.0, 2.0]):
        df = spark.createDataFrame(
            [("k", v) for v in vals], "g string, v double"
        )
        got = _rank_median(df, "g", "v", "m").collect()[0]["m"]
        assert got == pytest.approx(statistics.median(vals), abs=0)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_resample_daily_volume_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.trends import (
        resample_daily_volume,
        resample_daily_volume_oracle_sql,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "resample_daily_volume",
        lambda s, sf: resample_daily_volume(load_table(s, sf, "events")),
        resample_daily_volume_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_resample_fills_planted_gap_linearly(spark):
    """Counts 4 on day 0 and 10 on day 3 with days 1-2 missing: the
    spine must contain all 4 days and interpolate 6.0 and 8.0."""
    from logstream_processing_service_spark.operators.trends import (
        resample_daily_volume,
    )

    rows = []
    eid = 0
    for day, n in ((0, 4), (3, 10)):
        for i in range(n):
            rows.append((eid, 1, "click", _ts(day, i), 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    out = {
        r["x"]: (r["y_filled"], r["interpolated"])
        for r in resample_daily_volume(df).collect()
    }
    xs = sorted(out)
    assert len(xs) == 4
    assert out[xs[0]] == (4.0, False)
    assert out[xs[1]] == (6.0, True)
    assert out[xs[2]] == (8.0, True)
    assert out[xs[3]] == (10.0, False)


def test_fuzz_resample_vs_python_recompute(spark):
    """Random sparse day sets with random counts: the spine, the
    neighbor selection, and the rational interpolation must match a
    literal Python recomputation (hardens the IGNORE-NULLS window
    logic beyond the single planted gap)."""
    import random

    from logstream_processing_service_spark.operators.trends import (
        resample_daily_volume,
    )

    for seed in range(5):
        rng = random.Random(400 + seed)
        days = sorted(rng.sample(range(30), rng.randint(2, 8)))
        counts = {d: rng.randint(1, 20) for d in days}
        rows = []
        eid = 0
        for d, n in counts.items():
            for i in range(n):
                rows.append((eid, 1, "click", _ts(d, i), 1.0))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
            "ts timestamp, value double",
        )
        got = {
            r["x"]: (r["y_filled"], r["interpolated"])
            for r in resample_daily_volume(df).collect()
        }
        base = min(got)  # epoch-day of the first active day
        want = {}
        for d in range(days[0], days[-1] + 1):
            x = base + (d - days[0])
            if d in counts:
                want[x] = (float(counts[d]), False)
            else:
                pd_ = max(p for p in days if p < d)
                nd = min(p for p in days if p > d)
                y = round(
                    (counts[pd_] * (nd - d) + counts[nd] * (d - pd_))
                    / (nd - pd_),
                    6,
                )
                want[x] = (y, True)
        assert got == want, seed


def test_fuzz_mad_vs_python_recompute(spark):
    """Random value sets (ties, even/odd counts, negatives): median,
    MAD, and the flag count must match a literal recomputation with
    the same rank-selection rule."""
    import random
    import statistics

    for seed in range(5):
        rng = random.Random(900 + seed)
        vals = [
            round(rng.choice([rng.uniform(-5, 5), rng.choice([1.0, 2.0])]), 2)
            for _ in range(rng.randint(3, 60))
        ]
        rows = [
            (i, 1, "click", _ts(i % 20), v) for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
            "ts timestamp, value double",
        )
        r = mad_anomaly(df).collect()[0]
        med = statistics.median(vals)
        devs = [abs(v - med) for v in vals]
        mad = statistics.median(devs)
        n_out = sum(1 for d in devs if d > 3.0 * 1.4826 * mad)
        assert r["med"] == pytest.approx(med, abs=1e-9), seed
        assert r["mad"] == pytest.approx(mad, abs=1e-9), seed
        assert r["n_anomalies"] == n_out, seed
