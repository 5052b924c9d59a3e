"""Structured Streaming shell over the batch transforms (SURVEY §2.10).

The reference's 'streaming' is external micro-batching: a Lambda assigns
``[START_LOG_ID, END_LOG_ID]`` ranges and a container processes one slice
(scripts/run_incremental_batch.py:29-41), with watermarks tracked by hand
(``MAX(last_seen)`` + ``timestamp > :last_time``, src/db/pattern_ops.py:12-46)
and exactly-once faked by idempotent upserts (src/db/log_ops.py:47-81).

Spark-native mapping:
- offset ranges        → file-source offsets / Trigger.AvailableNow catch-up
- hand watermarks      → ``withWatermark`` + append mode
- per-row upsert txn   → idempotent ``foreachBatch`` anti-join append,
                         keyed by batchId (T2)
- batch_order status   → the checkpoint's commit log (S9)

Every transformation is the SAME function used in batch (operators/*) —
the stream shell only wires sources and sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..session import apply_runtime_conf

def _events_schema(spark: SparkSession, src: str) -> StructType:
    """The stream source needs an explicit schema; derive the ts column's
    physical shape from a batch peek at the same files (TIMESTAMP(NANOS)
    parquet arrives as LongType under nanosAsLong; micros arrives as a
    native timestamp) so the stream normalizes exactly like ``load_table``
    regardless of which the generator wrote."""
    ts_type = next(
        f.dataType
        for f in spark.read.parquet(src).schema.fields
        if f.name == "ts"
    )
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events table; ts normalization identical
    to the batch loader (adaptive nanos-long vs native-timestamp)."""
    apply_runtime_conf(spark)
    schema = _events_schema(spark, f"{sf_dir.rstrip('/')}/events.parquet")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file stream source wants a DIRECTORY; testdata keeps every table
    # in one dir, so stage a per-table symlink dir (no data copied). In
    # production the source is simply the table's own directory.
    src = f"{sf_dir.rstrip('/')}/events.parquet"
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"logstream-events-{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    df = reader.parquet(stage)
    if isinstance(schema["ts"].dataType, LongType):
        # integer division first: the ns value exceeds double precision
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def windowed_volume(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window volume per event_type (T3/T5): the
    streaming twin of ``relational.hourly_volume`` with late-data handling
    the reference can't express (its late rows silently skew history)."""
    return (
        events.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
        .groupBy(F.window("ts_tz", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def upsert_sink(out_dir: str, key: str = "event_id"):
    """Idempotent foreachBatch sink: anti-join against what's already in the
    target, then append (T2/S6: ON CONFLICT DO NOTHING, set-oriented).
    Re-delivered batches become no-ops, giving effective exactly-once on
    top of at-least-once delivery."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = f"{out_dir}/data"
        new = batch_df.dropDuplicates([key])
        try:
            existing = spark.read.parquet(target).select(key)
            new = new.join(existing, key, "left_anti")
        except Exception:
            pass  # first batch: nothing to dedup against
        new.write.mode("append").parquet(target)

    return write


def run_incremental_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    levels: tuple[str, ...] = ("error", "signup"),
) -> None:
    """The reference's incremental scoring batch (SURVEY §3.1) as ONE
    streaming query with AvailableNow catch-up: filter → template compose →
    idempotent sink. Embedding/cluster stages plug in as extra columns via
    the same batch transforms."""
    events = read_events_stream(spark, sf_dir)
    scored = events.filter(F.col("event_type").isin(*levels)).withColumn(
        "log_template",
        F.concat_ws(" | ", F.col("event_type"), F.col("props")),
    )
    q = (
        scored.writeStream.foreachBatch(upsert_sink(out_dir))
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_windowed_volume(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """Streaming windowed aggregation to a parquet sink.

    Append output mode: a window is emitted exactly once, after the
    watermark closes it — so the sink never sees partial counts. The sink
    itself writes each micro-batch into its own ``batch_id=N`` partition
    with overwrite, so a replayed batch (foreachBatch is at-least-once)
    lands in the same partition instead of duplicating rows.
    """
    vol = windowed_volume(read_events_stream(spark, sf_dir))

    def write(df: DataFrame, bid: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/volume/batch_id={bid}")

    q = (
        vol.writeStream.foreachBatch(write)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint_vol"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_volume(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization via ``session_window`` (the native twin of
    the batch gaps-and-islands ``relational.sessionize``): a session closes
    after ``gap`` of silence, emitted once the watermark passes."""
    return (
        events.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
        .groupBy(F.session_window("ts_tz", gap).alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_anomaly_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    levels: tuple[str, ...] = ("error", "signup"),
) -> None:
    """The reference's full incremental anomaly pass (SURVEY §3.1 steps
    5-6) inside ONE streaming query: each micro-batch appends its volume
    counts to history, recomputes rolling features over the accumulated
    history, flags anomalies, and upserts incidents — the same batch
    operators (`batch_volume`/`volume_zscore`/`flag_anomalies`/
    `open_incident_upsert`), unchanged, wired into foreachBatch.
    """
    from ..operators.relational import (
        batch_volume,
        flag_anomalies,
        open_incident_upsert,
        volume_zscore,
    )

    hist_path = os.path.join(out_dir, "volume_history")
    inc_path = os.path.join(out_dir, "incidents")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        vol = batch_volume(batch_df.select("user_id", "event_id"))
        # foreachBatch is at-least-once: a replayed batch must not
        # double-count history, so each micro-batch owns one overwritten
        # partition ("ingest_batch" — batch_volume already emits a
        # "batch_id" column of its own).
        vol.write.mode("overwrite").parquet(f"{hist_path}/ingest_batch={batch_id}")
        history = sp.read.parquet(hist_path).drop("ingest_batch")
        flagged = flag_anomalies(volume_zscore(history))
        try:
            incidents = sp.read.parquet(inc_path)
        except Exception:
            incidents = sp.createDataFrame(
                [], "cluster_id bigint, status string, created_at timestamp"
            )
        actions = open_incident_upsert(flagged.select("cluster_id"), incidents)
        (
            actions.filter(F.col("action") == "insert")
            .select(
                "cluster_id",
                F.lit("NEW").alias("status"),
                F.current_timestamp().alias("created_at"),
            )
            .write.mode("append")
            .parquet(inc_path)
        )

    events = read_events_stream(spark, sf_dir).filter(
        F.col("event_type").isin(*levels)
    )
    q = (
        events.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint_anom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-key dedup (T7): dropDuplicates bounded by
    a watermark so the seen-keys state is evicted as event time advances —
    the unbounded-state-safe form of the reference's ON CONFLICT DO NOTHING
    (src/db/log_ops.py:53)."""
    return (
        events.withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def correlated_pairs_stream(
    events: DataFrame,
    left_type: str = "signup",
    right_type: str = "error",
    watermark: str = "2 hours",
    lookback_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: every ``right_type`` event paired with the
    same user's ``left_type`` events from the preceding ``lookback_sec``.

    The streaming form of the batch as-of/interval join family
    (operators/relational.py asof_last_event): both sides are the SAME
    watermarked stream filtered two ways, joined on user + a time-range
    predicate. The range bound plus the watermark lets Spark expire join
    state — without it, stream-stream state grows forever; this is the
    canonical scalable shape (state ∝ users active within the lookback,
    not stream length).

    ``how='left_outer'`` additionally emits every unmatched left event
    with NULL right columns once its join state expires (the streaming
    "signup that never errored" report); ``'right_outer'`` emits the
    symmetric right-null rows instead (errors no signup preceded), and
    ``'full_outer'`` emits both. Emission
    timing is driven by state eviction — semantics probed and pinned in
    tests/test_louter_twin.py: matches emit immediately (the per-batch
    join runs BEFORE that batch's eviction), null-emits fire in the
    batch whose eviction watermark first exceeds the row's matchable
    horizon (l_ts + lookback on the left, r_ts itself on the right —
    including a trailing no-data batch after the last input batch), and
    unmatched state that never expires is discarded at availableNow
    termination.
    """
    from pyspark.sql import functions as F

    # watermarks require tz-aware TIMESTAMP (session tz is pinned UTC by the
    # session factory, so the cast is a pure type relabel)
    base = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    left = base.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    right = base.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            "how must be 'inner', 'left_outer', 'right_outer' or"
            " 'full_outer'"
        )
    return left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("l_ts") <= F.col("r_ts"))
        & (F.col("l_ts") >= F.col("r_ts") - F.expr(f"INTERVAL {lookback_sec} SECONDS")),
        how,
    )


def merge_sink(
    out_dir: str,
    key: str = "event_id",
    when_matched: str = "update",
    matched_condition=None,
):
    """foreachBatch MERGE sink: the update-capable sibling of
    ``upsert_sink`` (which is insert-only). Each micro-batch runs the full
    Delta-style clause set (sources/tables.py ``merge_full``) against the
    target and swaps the result in atomically (rename pair — readers see
    old or new, never partial).

    Replay-idempotent on at-least-once delivery: re-merging the same batch
    updates rows to the values they already hold and inserts nothing new.
    On a table format (Delta/Iceberg) this whole sink is one MERGE INTO
    with snapshot isolation; the rename swap is the plain-parquet stand-in.
    """
    import shutil

    from ..sources.tables import merge_full

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = f"{out_dir}/data"
        try:
            # safe to read lazily: the merge writes to tmp and the target
            # dir is only renamed AFTER that write succeeds
            existing = spark.read.parquet(target)
        except Exception:
            existing = spark.createDataFrame([], batch_df.schema)
        merged = merge_full(
            existing,
            batch_df,
            key,
            when_matched=when_matched,
            matched_condition=matched_condition,
        )
        tmp, backup = target + "._staged", target + "._old"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(backup):
            shutil.rmtree(backup)
        if os.path.exists(target):
            os.rename(target, backup)
        os.rename(tmp, target)
        if os.path.exists(backup):
            shutil.rmtree(backup)

    return write
