"""dropDuplicatesWithinWatermark semantics — probed, pinned, and
rehearsed as an oracle-paired twin (the r7 catalog candidate for the
NATIVE watermarked-dedup state machine; streaming/dedup.py's registry
twin covers the custom foreachBatch form).

Pinned rules (each discriminated by the probe below; organic micros
data never lands on the untested boundary-equality cases):

1. per dedup key, the FIRST processed row is emitted and its event
   time T is stored; later duplicates are suppressed and do NOT
   extend T (a suppressed 07:30 duplicate of a 01:00 row leaves
   expiry at 01:00 + delay);
2. "first processed" = input-file order within the micro-batch (the
   single-mapper batches this harness writes preserve it through the
   shuffle), NOT min event time;
3. state evicts at a batch boundary when T + delay < watermark —
   a key whose T + delay still clears the watermark keeps
   suppressing (T < watermark alone does NOT evict);
4. input rows with ts < watermark are dropped entirely (no emission,
   no state);
5. the watermark carries the same one-batch lag the other stream
   twins pin: the value governing batch b derives from batches
   ≤ b − 2 (batch 1 runs under the initial zero watermark).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR
from .oracle_harness import compare_one, duckdb_conn

_DELAY_H = 168  # 7 days: every oracle arm non-vacuous at sf0.01
# (e0=740, e1=10 first-emissions; 683 evictions; 2556 late drops;
# 454 re-admissions; 37 keys suppressed by live state — measured)
_N_BATCHES = 3


def _us(h: int, m: int) -> int:
    return 1_704_067_200_000_000 + (h * 3600 + m * 60) * 1_000_000


def _run(spark, slices, schema):
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )

    def xform(s):
        return (
            s.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
            .withWatermark("ts", "2 hours")
            .dropDuplicatesWithinWatermark(["k"])
            .select("k", "event_id")
        )

    cap = run_deterministic_batches(
        spark, slices, schema, xform, output_mode="append"
    )
    return sorted((r["k"], r["event_id"], r["_batch"]) for r in cap.collect())


def test_ddww_semantics_probe(spark):
    """One fixture exercising all five pinned rules; fails with a
    recalibration message naming the oracle builder if Spark's
    dedup-state machine shifts under an upgrade."""
    schema = "ts_us long, k string, event_id long"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    slices = [
        mk([
            (_us(6, 45), "w", 2), (_us(5, 30), "w", 1),  # rule 2: file order
            (_us(6, 0), "x", 11),   # rule 3: T+delay=08:00 > wm 07:00 → live
            (_us(4, 30), "y", 12),  # rule 3: T+delay=06:30 < 07:00 → evicted
            (_us(1, 0), "a", 13),
            (_us(9, 0), "hi", 14),  # drives the watermark: 09:00 − 2h
        ]),
        mk([
            (_us(7, 30), "a", 21),  # rule 5: suppressed under the zero wm
            (_us(8, 55), "pad", 22),
        ]),
        mk([
            (_us(8, 0), "x", 31),   # suppressed: x still live
            (_us(8, 10), "y", 32),  # emitted: y evicted (rule 3)
            (_us(8, 30), "a", 33),  # emitted: a evicted; rule 1 — the
            # suppressed 07:30 duplicate did NOT extend a's T=01:00
            (_us(5, 0), "z", 34),   # rule 4: late (< 07:00) → dropped
        ]),
    ]
    got = _run(spark, slices, schema)
    want = [
        ("a", 13, 0), ("a", 33, 2), ("hi", 14, 0), ("pad", 22, 1),
        ("w", 2, 0), ("x", 11, 0), ("y", 12, 0), ("y", 32, 2),
    ]
    if got != want:
        pytest.fail(
            "dropDuplicatesWithinWatermark state semantics changed under "
            "this Spark version — recalibrate the oracle rules in "
            f"tests/test_ddww_twin.py. Observed: {got}"
        )


def _ddww_oracle(delay_h: int = _DELAY_H, n: int = _N_BATCHES) -> str:
    """The five pinned rules unrolled for the (event_id % n) batch split
    over the real events table, keyed on (user_id, event_type). Winner
    per (key, batch) = min event_id (the slices are written sorted by
    event_id, so file order IS event_id order — rule 2)."""
    d_us = delay_h * 3600 * 1_000_000
    return f"""
    WITH ev AS (
        SELECT event_id, epoch_us(ts) AS us, user_id, event_type,
               CAST(event_id % {n} AS INT) AS b
        FROM events
    ),
    wm AS (SELECT max(us) - {d_us} AS w2 FROM ev WHERE b = 0),
    e0 AS (SELECT user_id, event_type, min(event_id) AS id,
                  arg_min(us, event_id) AS t
           FROM ev WHERE b = 0 GROUP BY 1, 2),
    e1 AS (SELECT v.user_id, v.event_type, min(v.event_id) AS id,
                  arg_min(v.us, v.event_id) AS t
           FROM ev v
           WHERE b = 1 AND NOT EXISTS (
               SELECT 1 FROM e0
               WHERE e0.user_id = v.user_id
                 AND e0.event_type = v.event_type)
           GROUP BY 1, 2),
    st AS (SELECT * FROM e0 UNION ALL SELECT * FROM e1),
    live AS (SELECT s.* FROM st s, wm WHERE s.t + {d_us} >= wm.w2),
    e2 AS (SELECT v.user_id, v.event_type, min(v.event_id) AS id
           FROM ev v, wm
           WHERE v.b = 2 AND v.us >= wm.w2 AND NOT EXISTS (
               SELECT 1 FROM live l
               WHERE l.user_id = v.user_id
                 AND l.event_type = v.event_type)
           GROUP BY 1, 2)
    SELECT user_id, event_type, id AS event_id, 0 AS batch FROM e0
    UNION ALL
    SELECT user_id, event_type, id, 1 FROM e1
    UNION ALL
    SELECT user_id, event_type, id, 2 FROM e2
    ORDER BY user_id, event_type, batch
    """


def test_ddww_twin_hash_matches_oracle(spark):
    """Full driver-harness parity on the real events table at the
    driver's SF — the r7 wiring rehearsal (same shape as
    stream_join_twin: slices by event_id % 3, real availableNow
    stream, per-batch capture)."""
    from logstream_processing_service_spark.sources import load_table
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )

    def q(s, sf_dir):
        ev = load_table(s, sf_dir, "events").select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id", "event_type", "event_id",
        )
        slices = [
            ev.filter(F.col("event_id") % _N_BATCHES == b).orderBy("event_id")
            for b in range(_N_BATCHES)
        ]
        cap = run_deterministic_batches(
            s,
            slices,
            "ts_us long, user_id long, event_type string, event_id long",
            lambda st: st.withColumn(
                "ts", F.timestamp_micros(F.col("ts_us"))
            )
            .withWatermark("ts", f"{_DELAY_H} hours")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type", "event_id"),
            output_mode="append",
        )
        return cap.select(
            "user_id", "event_type", "event_id",
            F.col("_batch").cast("int").alias("batch"),
        ).orderBy("user_id", "event_type", "batch")

    con = duckdb_conn(SF_DIR)
    r = compare_one(spark, con, "ddww_twin", q, _ddww_oracle(), SF_DIR)
    assert r["status"] == "OK", r
