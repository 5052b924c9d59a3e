"""Stream-stream LEFT OUTER join semantics — probed, pinned, rehearsed
(the r7 catalog candidate extending stream_join_twin's inner-join row
to the outer-join state machine: null-emission on state eviction).

Pinned rules, each discriminated by the probe fixture below (on top of
the inner twin's filtered max-combine watermark pin):

1. matched pairs emit immediately in the batch where both sides meet —
   the per-batch JOIN runs BEFORE that batch's eviction, so a left
   whose state is due for eviction still matches a right arriving in
   the same batch (probe arm u5);
2. an unmatched left null-emits in the batch whose eviction watermark
   first exceeds l_ts + lookback; eviction during batch b uses the
   watermark from batches ≤ b−1 — one batch AHEAD of the late-input
   filter's ≤ b−2 lag, so a left can be admitted and evict-emitted in
   the same batch (probe arm u3);
3. after the last input batch, a trailing NO-DATA batch runs one final
   eviction under the all-batches watermark (probe arm u6);
4. unmatched lefts whose state never expires are discarded silently at
   availableNow termination (probe arm u8).

Because matches always beat eviction (rule 1), the emitted SET needs
only two arms: the inner twin's match conditions, plus null rows for
admitted never-matched lefts with l_ts + lookback < the final
watermark — the per-batch eviction schedule only affects WHICH batch a
null lands in, which the twin deliberately does not project.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR
from .oracle_harness import compare_one, duckdb_conn

_DELAY_H = 480     # the inner twin's 20-day delay — arms at sf0.01:
_LOOKBACK_S = 6 * 3600  # 175 pairs, 387 null-emits, 1231 silent-tail,
_N = 3                  # 233 late-dropped signups (measured)


def _us(h: int, m: int) -> int:
    return 1_704_067_200_000_000 + (h * 3600 + m * 60) * 1_000_000


def test_louter_semantics_probe(spark):
    """One fixture exercising rules 1-4 with a 2h watermark / 1h
    lookback; fails with a recalibration message if Spark's outer-join
    eviction machinery shifts."""
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        correlated_pairs_stream,
    )

    schema = "ts_us long, user_id long, event_type string, event_id long"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    slices = [
        mk([
            # rule 1: signup 7 is evictable under b2's eviction
            # watermark (05:30 < 06:00) yet matched by the error
            # arriving IN b2 — join runs first
            (_us(4, 30), 5, "signup", 7),
            (_us(1, 0), 1, "signup", 1), (_us(1, 10), 1, "error", 2),
            (_us(5, 0), 9, "error", 90),    # b0 joined-type max 05:00 →
            # b2's late-input filter sits at 03:00 (w over batches ≤ 0)
        ]),
        # an ERROR at 08:00 (rights never null-emit) drags b2's
        # eviction watermark (w over batches ≤ 1) to 06:00
        mk([(_us(8, 0), 8, "error", 80)]),
        mk([
            (_us(5, 0), 5, "error", 8),     # completes rule 1's pair
            # rule 2: admitted (03:30 > 03:00 late filter) then
            # evict-emitted in the SAME batch (04:30 < 06:00)
            (_us(3, 30), 3, "signup", 61),
            # rule 3: survives b2's eviction (07:30 ≥ 06:00); only the
            # trailing no-data batch's all-batches watermark (10:00,
            # from the 12:00 signup below) catches it
            (_us(6, 30), 7, "signup", 63),
            # rule 4: 10:30 clears even the final watermark → silent
            (_us(9, 30), 6, "signup", 62),
            # the final-watermark driver; itself silent (13:00 ≥ 10:00)
            (_us(12, 0), 10, "signup", 81),
        ]),
    ]
    captured = run_deterministic_batches(
        spark,
        slices,
        schema,
        lambda s: correlated_pairs_stream(
            s.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
            watermark="2 hours",
            lookback_sec=3600,
            how="left_outer",
        ),
        output_mode="append",
    )
    key = lambda t: tuple(-1 if x is None else x for x in t)  # noqa: E731
    got = sorted(
        (
            (r["l_event_id"], r["r_event_id"], r["_batch"])
            for r in captured.collect()
        ),
        key=key,
    )
    want = sorted(
        [(1, 2, 0), (7, 8, 2), (61, None, 2), (63, None, 3)], key=key
    )
    if got != want:
        pytest.fail(
            "Structured Streaming's outer-join eviction semantics "
            "changed under this Spark version — recalibrate the oracle "
            f"in tests/test_louter_twin.py. Observed: {got}"
        )


def _louter_oracle(
    delay_h: int = _DELAY_H, lb_s: int = _LOOKBACK_S, n: int = _N
) -> str:
    """Inner-twin match arms + the null arm: admitted never-matched
    lefts whose l_ts + lookback falls below the ALL-BATCHES watermark
    (rule 3 guarantees the trailing no-data batch fires that final
    eviction, so membership needs no per-batch schedule)."""
    lb = lb_s * 1_000_000
    d = delay_h * 3600 * 1_000_000
    return f"""
    WITH ev AS (
        SELECT epoch_us(ts) AS us, user_id, event_type, event_id,
               CAST(event_id % {n} AS INT) AS b
        FROM events
    ),
    wm AS (SELECT max(us) - {d} AS w FROM ev
           WHERE b = 0 AND event_type IN ('signup', 'error')),
    wf AS (SELECT max(us) - {d} AS w3 FROM ev
           WHERE event_type IN ('signup', 'error')),
    s AS (SELECT user_id, us AS s_us, event_id AS s_id, b AS sb
          FROM ev WHERE event_type = 'signup'),
    e AS (SELECT user_id, us AS e_us, event_id AS e_id, b AS eb
          FROM ev WHERE event_type = 'error'),
    j AS (
        SELECT s.user_id, s_id, e_id, s_us, e_us, sb, eb
        FROM s JOIN e USING (user_id)
        WHERE e_us >= s_us AND e_us <= s_us + {lb}
    ),
    matched AS (
        SELECT user_id, s_id, e_id, s_us, e_us
        FROM j, wm
        WHERE (sb <= 1 AND eb <= 1)
           OR (sb <= 1 AND eb = 2 AND e_us >= w AND s_us + {lb} >= w)
           OR (sb = 2 AND eb <= 1 AND s_us >= w AND e_us >= w)
           OR (sb = 2 AND eb = 2 AND s_us >= w AND e_us >= w)
    ),
    adm_s AS (SELECT s.* FROM s, wm WHERE sb <= 1 OR s_us >= w),
    nulls AS (
        SELECT a.user_id, a.s_id
        FROM adm_s a, wf
        WHERE a.s_us + {lb} < wf.w3
          AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.s_id = a.s_id)
    )
    SELECT user_id, s_id AS signup_id, e_id AS error_id,
           CAST((e_us - s_us) // 1000000 AS BIGINT) AS lag_s
    FROM matched
    UNION ALL
    SELECT user_id, s_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM nulls
    ORDER BY user_id, signup_id, error_id
    """


def test_louter_twin_hash_matches_oracle(spark):
    """Full driver-harness parity on the real events table at the
    driver's SF — the r7 wiring rehearsal, mirroring stream_join_twin
    with how='left_outer'."""
    from logstream_processing_service_spark.sources import load_table
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        correlated_pairs_stream,
    )

    def q(s, sf_dir):
        ev = load_table(s, sf_dir, "events").select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id", "event_type", F.col("event_id"),
        )
        slices = [
            ev.filter(F.col("event_id") % _N == b) for b in range(_N)
        ]
        cap = run_deterministic_batches(
            s,
            slices,
            "ts_us long, user_id long, event_type string, event_id long",
            lambda st: correlated_pairs_stream(
                st.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
                watermark=f"{_DELAY_H} hours",
                lookback_sec=_LOOKBACK_S,
                how="left_outer",
            ),
            output_mode="append",
        )
        return cap.select(
            F.col("l_user").alias("user_id"),
            F.col("l_event_id").alias("signup_id"),
            F.col("r_event_id").alias("error_id"),
            F.expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000000")
            .cast("bigint")
            .alias("lag_s"),
        ).orderBy("user_id", "signup_id", "error_id")

    con = duckdb_conn(SF_DIR)
    r = compare_one(spark, con, "louter_twin", q, _louter_oracle(), SF_DIR)
    assert r["status"] == "OK", r


def test_fouter_right_eviction_probe(spark):
    """full_outer adds the symmetric right-null arm: an error's state
    evicts when r_ts < the eviction watermark (no lookback slack — it
    only matches signups AT OR BEFORE it, so once the watermark passes
    it no future signup can qualify), with the same same-batch and
    trailing no-data emission mechanics as the left side."""
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        correlated_pairs_stream,
    )

    schema = "ts_us long, user_id long, event_type string, event_id long"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    slices = [
        mk([
            (_us(1, 0), 1, "signup", 1), (_us(1, 10), 1, "error", 2),
            (_us(1, 30), 9, "error", 90),   # evicts in b1 (01:30 < 03:00)
            (_us(5, 0), 19, "error", 91),   # b0 max; evicts in b2 (< 10:00)
        ]),
        mk([(_us(12, 0), 8, "error", 80)]),  # drags b2's eviction wm to
        # 10:00; itself ≥ 10:00 → silent tail
        mk([
            (_us(4, 0), 12, "error", 92),   # admitted (> 03:00 late
            # filter) then evict-emitted same batch (04:00 < 10:00)
            (_us(3, 30), 3, "signup", 61),  # the left arm still fires
        ]),
    ]
    captured = run_deterministic_batches(
        spark,
        slices,
        schema,
        lambda s: correlated_pairs_stream(
            s.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
            watermark="2 hours",
            lookback_sec=3600,
            how="full_outer",
        ),
        output_mode="append",
    )
    key = lambda t: tuple(-1 if x is None else x for x in t)  # noqa: E731
    got = sorted(
        (
            (r["l_event_id"], r["r_event_id"], r["_batch"])
            for r in captured.collect()
        ),
        key=key,
    )
    want = sorted(
        [
            (1, 2, 0), (None, 90, 1), (None, 91, 2), (None, 92, 2),
            (61, None, 2),
        ],
        key=key,
    )
    if got != want:
        pytest.fail(
            "Structured Streaming's full-outer eviction semantics "
            "changed under this Spark version — recalibrate the oracle "
            f"in tests/test_louter_twin.py. Observed: {got}"
        )


def _fouter_oracle(
    delay_h: int = _DELAY_H, lb_s: int = _LOOKBACK_S, n: int = _N
) -> str:
    """left-outer oracle + the right-null arm: admitted never-matched
    rights with r_ts below the final watermark (arms at sf0.01:
    410 right null-emits, 1214 silent, 221 late-dropped — measured)."""
    lb = lb_s * 1_000_000
    d = delay_h * 3600 * 1_000_000
    base = _louter_oracle(delay_h, lb_s, n)
    head, tail = base.rsplit("ORDER BY", 1)
    return f"""{head}
    UNION ALL
    SELECT a.user_id, CAST(NULL AS BIGINT), a.e_id, CAST(NULL AS BIGINT)
    FROM e a, wm, wf
    WHERE (a.eb <= 1 OR a.e_us >= wm.w)
      AND a.e_us < wf.w3
      AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.e_id = a.e_id)
    ORDER BY {tail}
    """


def test_fouter_twin_hash_matches_oracle(spark):
    """Full driver-harness parity for how='full_outer' on the real
    events table at the driver's SF."""
    from logstream_processing_service_spark.sources import load_table
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        correlated_pairs_stream,
    )

    def q(s, sf_dir):
        ev = load_table(s, sf_dir, "events").select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id", "event_type", F.col("event_id"),
        )
        slices = [
            ev.filter(F.col("event_id") % _N == b) for b in range(_N)
        ]
        cap = run_deterministic_batches(
            s,
            slices,
            "ts_us long, user_id long, event_type string, event_id long",
            lambda st: correlated_pairs_stream(
                st.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
                watermark=f"{_DELAY_H} hours",
                lookback_sec=_LOOKBACK_S,
                how="full_outer",
            ),
            output_mode="append",
        )
        return cap.select(
            F.coalesce(F.col("l_user"), F.col("r_user")).alias("user_id"),
            F.col("l_event_id").alias("signup_id"),
            F.col("r_event_id").alias("error_id"),
            F.expr("(unix_micros(r_ts) - unix_micros(l_ts)) div 1000000")
            .cast("bigint")
            .alias("lag_s"),
        ).orderBy("user_id", "signup_id", "error_id")

    con = duckdb_conn(SF_DIR)
    r = compare_one(spark, con, "fouter_twin", q, _fouter_oracle(), SF_DIR)
    assert r["status"] == "OK", r


def test_router_right_arm_only(spark):
    """right_outer = the fouter fixture's matched + right-null rows,
    with NO left-null rows — same pinned eviction rules, one arm."""
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        correlated_pairs_stream,
    )

    schema = "ts_us long, user_id long, event_type string, event_id long"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    slices = [
        mk([
            (_us(1, 0), 1, "signup", 1), (_us(1, 10), 1, "error", 2),
            (_us(1, 30), 9, "error", 90),
            (_us(5, 0), 19, "error", 91),
        ]),
        mk([(_us(8, 0), 8, "error", 80)]),
        mk([
            (_us(4, 0), 12, "error", 92),
            (_us(3, 30), 3, "signup", 61),  # unmatched LEFT: must NOT
            # null-emit under right_outer
        ]),
    ]
    captured = run_deterministic_batches(
        spark,
        slices,
        schema,
        lambda s: correlated_pairs_stream(
            s.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
            watermark="2 hours",
            lookback_sec=3600,
            how="right_outer",
        ),
        output_mode="append",
    )
    key = lambda t: tuple(-1 if x is None else x for x in t)  # noqa: E731
    got = sorted(
        (
            (r["l_event_id"], r["r_event_id"])
            for r in captured.collect()
        ),
        key=key,
    )
    want = sorted(
        [(1, 2), (None, 90), (None, 91), (None, 92)], key=key
    )
    assert got == want
