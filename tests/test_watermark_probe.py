"""Watermark-lag probe (VERDICT r5 #3).

``_windowed_volume_twin_oracle`` (queries_streaming.py) unrolls Spark's
watermark trajectory with an EMPIRICALLY PINNED scheduler detail: the
watermark computed from micro-batch 0's max event time does not filter
micro-batch 1's input (admission lags one batch) but does govern the
late filter from batch 2 on and the eviction that emits closed windows.
That is an implementation detail of Structured Streaming's micro-batch
planner, not a documented contract — a Spark upgrade could legally shift
it and the oracle would silently assert stale semantics.

This probe plants timestamps that make the three pinned behaviors
observable in the emitted set and fails with a recalibration message
naming the oracle when any of them shifts:

- batch 0: events at 01:15 and 10:30  → watermark_0 = 08:30
- batch 1: event at 01:30 — OLDER than watermark_0. One-batch lag ⇒
  admitted (window [01:00,02:00) emits cnt=2); zero lag ⇒ dropped
  (cnt=1 or no emission).
- batch 2: event at 01:45 — must be dropped (late under watermark_0),
  and must NOT re-emit the already-closed window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _us(hour: int, minute: int) -> int:
    # a fixed day, micros since epoch
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    return base + (hour * 3600 + minute * 60) * 1_000_000


def test_watermark_one_batch_lag_probe(spark):
    from logstream_processing_service_spark.streaming.drive import (
        run_deterministic_batches,
    )
    from logstream_processing_service_spark.streaming.pipeline import (
        windowed_volume,
    )

    schema = "ts_us long, event_type string, value double"
    mk = lambda rows: spark.createDataFrame(rows, schema)  # noqa: E731
    slices = [
        mk([(_us(1, 15), "a", 1.0), (_us(10, 30), "a", 1.0)]),
        mk([(_us(1, 30), "a", 1.0)]),
        mk([(_us(1, 45), "a", 1.0)]),
    ]
    captured = run_deterministic_batches(
        spark,
        slices,
        schema,
        lambda s: windowed_volume(
            s.withColumn("ts", F.timestamp_micros(F.col("ts_us"))),
            watermark="2 hours",
        ),
        output_mode="append",
    )
    rows = sorted(
        (r["hour"].hour, r["cnt"], r["_batch"]) for r in captured.collect()
    )

    recal = (
        "Structured Streaming's watermark scheduling changed under this "
        "Spark version — recalibrate _windowed_volume_twin_oracle and "
        "_session_twin_oracle in queries_streaming.py (the pinned "
        "one-batch admission lag no longer holds). Observed emissions "
        f"(hour, cnt, _batch): {rows}"
    )
    # exactly one window emitted: [01:00,02:00) with BOTH the batch-0
    # and the batch-1 row (admission lag), WITHOUT the batch-2 late row
    if len(rows) != 1:
        pytest.fail(recal)
    hour, cnt, batch = rows[0]
    if hour != 1 or cnt != 2:
        pytest.fail(recal)
    # the emission lands when batch 1's completion evicts the window;
    # a shift here changes per-batch capture grouping, not the final
    # set — still worth a loud flag
    if batch != 1:
        pytest.fail(recal)
