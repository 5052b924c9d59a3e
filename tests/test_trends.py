"""Semantic unit tests for operators/trends.py and token_pmi: each operator
checked against an independent naive recomputation (pandas/numpy loops) —
the non-SQL second opinion alongside the DuckDB parity pair."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from logstream_processing_service_spark.operators import trends as TR
from logstream_processing_service_spark.operators import textanalysis as TA
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def events_pd(spark, events):
    return events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).toPandas()


def test_cohort_offset_zero_is_full(spark, events):
    out = TR.cohort_retention(events).toPandas()
    zero = out[out.week_offset == 0]
    assert (zero.retention == 1.0).all()
    assert set(zero.cohort) == set(out.cohort)
    assert (out.retention <= 1.0).all() and (out.retention > 0).all()
    # by definition of "cohort = week of FIRST activity" there are no
    # negative offsets
    assert (out.week_offset >= 0).all()


def test_cohort_against_naive(spark, events, events_pd):
    out = TR.cohort_retention(events).toPandas()
    pdf = events_pd.copy()
    wk = pdf.ts.dt.to_period("W-SUN").dt.start_time  # Monday-start weeks
    pdf["wk"] = wk
    first = pdf.groupby("user_id").wk.min().rename("cohort")
    j = pdf.join(first, on="user_id")
    j["off"] = ((j.wk - j.cohort).dt.days // 7).astype(int)
    naive = (
        j.drop_duplicates(["user_id", "off"])
        .groupby(["cohort", "off"])
        .size()
        .rename("n")
        .reset_index()
    )
    got = {
        (pd.Timestamp(r.cohort).date(), r.week_offset): r.n_active
        for r in out.itertuples()
    }
    want = {(r.cohort.date(), r.off): r.n for r in naive.itertuples()}
    assert got == want


def test_transitions_probs_sum_to_one(spark, events):
    out = TR.event_transitions(events).toPandas()
    sums = out.groupby("prev_type").prob.sum()
    # rounded per-row to 6dp, so the sum is within n_rows ulps of 1
    assert ((sums - 1.0).abs() < 1e-4).all()
    n_total = out.n.sum()
    # every adjacent pair counted exactly once: n_events - n_users_with_events
    pdf = events.select("user_id").toPandas()
    assert n_total == len(pdf) - pdf.user_id.nunique()


def test_volume_trend_matches_numpy(spark, events, events_pd):
    out = TR.volume_trend(events).toPandas().set_index("event_type")
    pdf = events_pd.copy()
    pdf["day"] = pdf.ts.dt.normalize()
    for etype, grp in pdf.groupby("event_type"):
        daily = grp.groupby("day").size()
        x = (daily.index - pd.Timestamp("1970-01-01")).days.to_numpy(float)
        y = daily.to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = out.loc[etype]
        assert row.n_days == len(x)
        assert math.isclose(row.slope, slope, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(row.intercept, intercept, rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(row.r2, r * r, rel_tol=1e-6, abs_tol=1e-6)


def test_cusum_matches_naive_recursion(spark, events, events_pd):
    """The running-min identity must reproduce the textbook recursion
    S_t = max(0, S_{t-1} + x_t - 1.1*mu) exactly."""
    out = TR.cusum_changepoints(events).toPandas()
    pdf = events_pd.copy()
    pdf["day"] = pdf.ts.dt.normalize()
    for etype, grp in pdf.groupby("event_type"):
        daily = grp.groupby("day").size().sort_index()
        mu = daily.sum() / len(daily)
        s, naive = 0.0, []
        for x in daily:
            s = max(0.0, s + (x - 1.1 * mu))
            naive.append(s)
        got = out[out.event_type == etype].sort_values("day")
        assert len(got) == len(naive)
        for g, want in zip(got.cusum, naive):
            assert math.isclose(g, want, rel_tol=1e-9, abs_tol=1e-5)
        # flags agree with the naive threshold
        for g, want in zip(got.is_change, naive):
            assert g == int(want > 3 * mu)


def test_ohlc_open_close_are_sequence_ends(spark, events, events_pd):
    out = TR.ohlc_bars(events).toPandas()
    pdf = events_pd.copy()
    pdf["day"] = pdf.ts.dt.normalize()
    srt = pdf.sort_values(["ts", "event_id"])
    first = srt.groupby(["event_type", "day"]).value.first()
    last = srt.groupby(["event_type", "day"]).value.last()
    for r in out.itertuples():
        k = (r.event_type, pd.Timestamp(r.day))
        assert math.isclose(r.open, round(first[k], 4), abs_tol=1e-9)
        assert math.isclose(r.close, round(last[k], 4), abs_tol=1e-9)
        assert r.low <= r.open <= r.high and r.low <= r.close <= r.high


def test_funnel_strict_sequencing_matches_naive(spark, events, events_pd):
    """Per-user stage flags recomputed with an explicit sequential scan
    over the (ts, event_id)-ordered event list."""
    out = (
        TR.funnel_conversion(events)
        .toPandas()
        .set_index("stage")
    )
    pdf = events_pd.sort_values(["user_id", "ts", "event_id"])
    n1 = n2 = n3 = 0
    for _, grp in pdf.groupby("user_id"):
        t1 = t2 = t3 = None  # position (index into the ordered list)
        for i, et in enumerate(grp.event_type):
            if et == "view" and t1 is None:
                t1 = i
            elif et == "click" and t2 is None and t1 is not None and i > t1:
                t2 = i
            elif et == "purchase" and t3 is None and t2 is not None and i > t2:
                t3 = i
        n1 += t1 is not None
        n2 += t2 is not None
        n3 += t3 is not None
    assert out.loc[1].n_users == n1
    assert out.loc[2].n_users == n2
    assert out.loc[3].n_users == n3
    assert out.loc[1].pct_of_top == 1.0
    assert math.isclose(out.loc[2].pct_of_prev, round(n2 / n1, 6))
    assert math.isclose(out.loc[3].pct_of_prev, round(n3 / n2, 6))
    assert math.isclose(out.loc[3].pct_of_top, round(n3 / n1, 6))


def test_funnel_out_of_order_user_not_counted(spark):
    """A user who purchases BEFORE ever viewing must not reach stage 3 —
    the property the naive did-all-three-types formulation gets wrong."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # user 1: purchase, then view, then click — reaches stage 2 only
    for i, et in enumerate(["purchase", "view", "click"]):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, et, 0.0, "{}"))
    # user 2: the proper order
    for i, et in enumerate(["view", "click", "purchase"]):
        rows.append((10 + i, t0 + dt.timedelta(minutes=i), 2, et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = TR.funnel_conversion(df).toPandas().set_index("stage")
    assert out.loc[1].n_users == 2  # both viewed
    assert out.loc[2].n_users == 2  # both clicked after a view
    assert out.loc[3].n_users == 1  # only user 2 purchased in order


def test_rolling_distinct_matches_naive(spark, events, events_pd):
    out = TR.rolling_distinct_users(events).toPandas()
    pdf = events_pd.copy()
    pdf["day"] = pdf.ts.dt.normalize()
    for r in out.itertuples():
        day = pd.Timestamp(r.day)
        sl = pdf[(pdf.event_type == r.event_type) & (pdf.day == day)]
        assert r.uniq_day == sl.user_id.nunique()
        win = pdf[
            (pdf.event_type == r.event_type)
            & (pdf.day > day - pd.Timedelta(days=7))
            & (pdf.day <= day)
        ]
        assert r.uniq_win == win.user_id.nunique()
    # the window count dominates the day count and is bounded by 7 days' sum
    assert (out.uniq_win >= out.uniq_day).all()


def test_rolling_distinct_range_frame_spans_gaps(spark):
    """RANGE (calendar-day) semantics: a day more than window_days after
    the previous activity must NOT see the old users (ROWS would)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "click", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 2, "click", 0.0, "{}"),
        # 20-day gap: a trailing-7-day window at day 22 holds only user 3
        (3, dt.datetime(2024, 1, 22), 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = TR.rolling_distinct_users(df).toPandas().set_index("day")
    assert out.loc[pd.Timestamp("2024-01-02").date()].uniq_win == 2
    assert out.loc[pd.Timestamp("2024-01-22").date()].uniq_win == 1


def test_token_pmi_values_from_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = TA.token_pmi(docs, min_count=3, k=20).toPandas()
    assert len(out) > 0
    # recompute counts naively from the raw text
    pdf = docs.select("text").toPandas()
    from collections import Counter

    uni, big = Counter(), Counter()
    for t in pdf.text:
        ws = [w for w in t.split(" ") if w != ""]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    T_, B = sum(uni.values()), sum(big.values())
    for r in out.itertuples():
        c_xy = big[(r.w1, r.w2)]
        assert c_xy == r.n_pair
        want = (
            math.log(c_xy) - math.log(B)
            - math.log(uni[r.w1]) - math.log(uni[r.w2])
            + 2.0 * math.log(T_)
        )
        assert math.isclose(r.pmi, want, rel_tol=1e-6, abs_tol=1e-5)
    # ranked by pmi descending
    assert (out.pmi.values[:-1] >= out.pmi.values[1:] - 1e-9).all()
