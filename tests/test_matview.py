"""Incremental materialized-view maintenance: delta-only refresh,
fallback triggers, idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstream_processing_service_spark.operators import txlog as TX
from logstream_processing_service_spark.operators.matview import (
    ViewSpec,
    read_matview,
    refresh_matview,
)

SPEC = ViewSpec(group_cols=("k",), sum_cols=("v",), minmax_cols=("v",))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v double")


def _served(spark, view_dir):
    return {
        (r["k"], r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in read_matview(spark, view_dir, SPEC).collect()
    }


def test_incremental_equals_full(spark, tmp_path):
    t, v = str(tmp_path / "t"), str(tmp_path / "v")
    TX.commit(t, _mk(spark, [("a", 1.5), ("b", 2.0)]))
    assert refresh_matview(spark, v, t, SPEC)["mode"] == "full"
    TX.commit(t, _mk(spark, [("a", 3.25), ("c", 7.0)]), mode="append")
    info = refresh_matview(spark, v, t, SPEC)
    assert info["mode"] == "incremental"
    # compare against a from-scratch view over the same base
    v2 = str(tmp_path / "v2")
    refresh_matview(spark, v2, t, SPEC)
    assert _served(spark, v) == _served(spark, v2)
    assert ("a", 2, 4.75, 1.5, 3.25) in _served(spark, v)


def test_noop_and_replay(spark, tmp_path):
    t, v = str(tmp_path / "t"), str(tmp_path / "v")
    TX.commit(t, _mk(spark, [("a", 1.0)]))
    refresh_matview(spark, v, t, SPEC)
    info = refresh_matview(spark, v, t, SPEC)  # nothing new
    assert info["mode"] == "noop"
    assert len(TX.history(v)) == 1  # true no-op: no extra view version


def test_overwrite_triggers_full_recompute(spark, tmp_path):
    t, v = str(tmp_path / "t"), str(tmp_path / "v")
    TX.commit(t, _mk(spark, [("a", 1.0), ("a", 2.0)]))
    refresh_matview(spark, v, t, SPEC)
    # overwrite retracts rows — incremental merge would be WRONG
    TX.commit(t, _mk(spark, [("b", 5.0)]), mode="overwrite")
    info = refresh_matview(spark, v, t, SPEC)
    assert info["mode"] == "full"
    assert _served(spark, v) == {("b", 1, 5.0, 5.0, 5.0)}


def test_vacuumed_base_manifest_triggers_full(spark, tmp_path):
    t, v = str(tmp_path / "t"), str(tmp_path / "v")
    TX.commit(t, _mk(spark, [("a", 1.0)]))
    refresh_matview(spark, v, t, SPEC)
    for i in range(3):
        TX.commit(t, _mk(spark, [("a", float(i))]), mode="append")
    # drop the manifest the view's base_version points at
    TX.vacuum(t, retain_last=1, min_age_seconds=0)
    info = refresh_matview(spark, v, t, SPEC)
    assert info["mode"] == "full"  # correctness never depends on history
    v2 = str(tmp_path / "v2")
    refresh_matview(spark, v2, t, SPEC)
    assert _served(spark, v) == _served(spark, v2)


def test_matview_sink_under_real_stream(spark, tmp_path):
    """The streaming composition: availableNow micro-batches -> txlog
    appends -> incremental refresh per batch; the served view equals the
    batch aggregate over everything ingested, and stream restart with
    the same checkpoint is a no-op for both table and view."""
    import os

    from logstream_processing_service_spark.operators.matview import (
        matview_sink,
    )

    src = str(tmp_path / "src")
    t, v = str(tmp_path / "t"), str(tmp_path / "v")
    os.makedirs(src)

    def run_stream():
        q = (
            spark.readStream.schema("k string, v double")
            .parquet(src)
            .writeStream.foreachBatch(matview_sink(t, v, SPEC))
            .option("checkpointLocation", str(tmp_path / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _mk(spark, [("a", 1.0), ("b", 2.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_stream()
    _mk(spark, [("a", 3.0)]).coalesce(1).write.mode("append").parquet(src)
    run_stream()
    assert _served(spark, v) == {
        ("a", 2, 4.0, 1.0, 3.0),
        ("b", 1, 2.0, 2.0, 2.0),
    }
    n_t, n_v = len(TX.history(t)), len(TX.history(v))
    run_stream()  # nothing new: full no-op
    assert (len(TX.history(t)), len(TX.history(v))) == (n_t, n_v)
