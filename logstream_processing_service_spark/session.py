"""SparkSession factory.

The reference has no engine of its own (SQL strings go to Postgres —
src/db/connection.py:10-19); here the session IS the engine, so the factory
centralizes the configuration that matters at 100 TB:

- AQE on (runtime re-plan: broadcast conversion, partition coalescing,
  skew-join splitting).
- Shuffle partitions sized to the local core count for tests; on a real
  cluster AQE coalesces from a high initial number.
- Arrow enabled so any unavoidable Python stage is vectorized.
- UTC session timezone so timestamp semantics are deployment-independent.
- ``nanosAsLong`` because the shared testdata parquet uses TIMESTAMP(NANOS),
  which Spark does not read natively (loaders convert back to timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf that must hold on ANY session running this engine (including a session
# created by an external driver) — all runtime-settable.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # split packing: 1 MB open-cost estimate (realistic for compacted
    # parquet on fast storage; the 4 MB default stops small inputs from
    # splitting to the session's minPartitionNum and leaves cores idle)
    "spark.sql.files.openCostInBytes": "1048576",
}


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an existing session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Never fail a query because a conf key is locked down.
            pass
    return spark


def get_spark(
    app_name: str = "logstream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        # ReservedCodeCacheSize: whole-stage codegen emits a new class per
        # plan, and a long session running 100+ distinct queries (the
        # bench, the driver's correctness sweep) fills the JVM's default
        # 240 MB JIT code cache — once full the compiler is disabled and
        # LATER queries silently run interpreted (the "late-run drift"
        # class adjudicated in the r4-r6 ABAB tables). 512 MB keeps the
        # JIT alive for the whole sweep.
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.timezone=UTC -XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_conf(spark)
