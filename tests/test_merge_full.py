"""Delta-style MERGE work-alike: every clause combination over one
full-outer join (sources/tables.py merge_full)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstream_processing_service_spark.sources.tables import merge_full


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "id long, v string, ver long"
    )
    source = spark.createDataFrame(
        [(2, "B", 2), (3, "C_old", 0), (4, "d", 2)], "id long, v string, ver long"
    )
    return target, source


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_conditional_update_insert(spark):
    target, source = _frames(spark)
    out = merge_full(
        target, source, "id",
        when_matched="update",
        matched_condition=lambda j: F.col("s.ver") > F.col("t.ver"),
    )
    # 2 updated (newer), 3 untouched (stale source), 4 inserted, 1 kept
    assert _rows(out) == [(1, "a", 1), (2, "B", 2), (3, "c", 1), (4, "d", 2)]


def test_merge_matched_delete(spark):
    target, source = _frames(spark)
    out = merge_full(
        target, source, "id",
        when_matched="delete",
        matched_condition=lambda j: F.col("s.ver") > F.col("t.ver"),
        when_not_matched_insert=False,
    )
    # 2 deleted (cond holds), 3 survives (cond false), no insert of 4
    assert _rows(out) == [(1, "a", 1), (3, "c", 1)]


def test_merge_not_matched_by_source_delete(spark):
    target, source = _frames(spark)
    out = merge_full(
        target, source, "id",
        when_matched="update",
        not_matched_by_source_delete=True,
    )
    # 1 has no source row -> deleted; unconditional update wins for 2 and 3
    assert _rows(out) == [(2, "B", 2), (3, "C_old", 0), (4, "d", 2)]


def test_merge_source_key_dedup_last_writer_wins(spark):
    target = spark.createDataFrame([(1, "a", 1)], "id long, v string, ver long")
    source = spark.createDataFrame(
        [(1, "x", 5), (1, "z", 9)], "id long, v string, ver long"
    )
    out = merge_full(target, source, "id")
    # max(struct) picks the (z, 9) row deterministically
    assert _rows(out) == [(1, "z", 9)]


def test_streaming_merge_sink_updates_and_replays(spark, tmpdir):
    """merge_sink: micro-batch 2 updates keys from micro-batch 1; replaying
    a batch leaves the target unchanged (at-least-once -> effective
    exactly-once)."""
    import os

    from logstream_processing_service_spark.streaming.pipeline import merge_sink

    src = f"{tmpdir}/src"
    out = f"{tmpdir}/out"
    os.makedirs(src)
    schema = "id long, v string, ver long"

    def run_stream():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.foreachBatch(merge_sink(out, key="id"))
            .option("checkpointLocation", f"{out}/_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_stream()
    spark.createDataFrame([(2, "B", 2), (3, "c", 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_stream()
    want = [(1, "a", 1), (2, "B", 2), (3, "c", 1)]
    got = sorted(map(tuple, spark.read.parquet(f"{out}/data").collect()))
    assert got == want

    # replay batch 2 by hand (simulates redelivery after checkpoint loss)
    replay = spark.createDataFrame([(2, "B", 2), (3, "c", 1)], schema)
    merge_sink(out, key="id")(replay, 99)
    got = sorted(map(tuple, spark.read.parquet(f"{out}/data").collect()))
    assert got == want
