"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``logstream_processing_service_spark``; this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: cluster volume history
    window (SURVEY §7 minimum slice) — scan → group count → virtual batch →
    top-5-per-cluster ranking (reference: src/db/cluster_ops.py:39-53).
    """
    from logstream_processing_service_spark.operators import relational as R
    from logstream_processing_service_spark.sources import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return R.volume_history_window(R.batch_volume(events))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from logstream_processing_service_spark import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable query."""
    from logstream_processing_service_spark import catalog

    return catalog.oracle_sql()
