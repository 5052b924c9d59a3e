"""Deterministically drive a stateful streaming transformation over an
explicit micro-batch split, capturing every batch's output — the harness
that makes applyInPandasWithState / transformWithState operators
driver-checkable (the generalization of the registry-twin pattern in
streaming/dedup.py: that sink is a foreachBatch fn and could be called
directly; arbitrary stateful TRANSFORMATIONS need a real streaming query,
which this module runs with availableNow + maxFilesPerTrigger=1).

Batch boundaries: each slice is written as its own single-file parquet
directory, sequentially (file mtimes strictly increase, which is the
order FileStreamSource processes them under maxFilesPerTrigger=1), so
micro-batch b contains exactly slice b's rows. Output capture is a
foreachBatch parquet sink that tags rows with ``_batch``, so callers can
reconstruct per-batch emissions (append ops) or final state (update ops)
without depending on sink row order.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_deterministic_batches(
    spark: SparkSession,
    slices: list[DataFrame],
    schema: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "update",
) -> DataFrame:
    """Run ``transform`` (a streaming DataFrame -> DataFrame stateful op)
    over micro-batches defined by ``slices`` (processed in list order)
    and return the captured output with an extra ``_batch`` long column.

    The returned frame is materialized (the stream has finished); all
    work happens at call time — the eager-build bench caveat of
    streaming_bm25_twin applies. Temp dirs are cleaned up on success."""
    work = tempfile.mkdtemp(prefix="stream_twin_")
    src = f"{work}/src"
    out = f"{work}/out"
    try:
        for b, sl in enumerate(slices):
            sl.coalesce(1).write.mode("overwrite").parquet(f"{src}/batch={b}")

        def capture(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.withColumn("_batch", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/batch=*")
        )
        q = (
            transform(stream)
            .writeStream.foreachBatch(capture)
            .outputMode(output_mode)
            .option("checkpointLocation", f"{work}/_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if not os.path.isdir(out):
            # no batch ever fired (empty `slices`): there is no captured
            # schema to return — make the failure loud instead of letting
            # spark.read error on a missing path after cleanup
            raise ValueError(
                "run_deterministic_batches: no micro-batch produced output"
                " (empty `slices`?)"
            )
        # materialize before the finally-block deletes the source files —
        # including the empty case: a lazy `.limit(0)` over `out` would
        # dangle once the temp dir is gone (ADVICE r5), so capture the
        # schema eagerly and return a local empty frame.
        captured = spark.read.parquet(out)
        out_schema = captured.schema
        rows = captured.collect()
        return spark.createDataFrame(rows, out_schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def last_batch_per_key(captured: DataFrame, key_col: str = "key") -> DataFrame:
    """For update-mode census outputs (one row per key per batch): keep
    each key's row from the last micro-batch it appeared in."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.desc("_batch"))
    return (
        captured.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch")
    )
