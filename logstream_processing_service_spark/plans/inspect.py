"""Physical-plan inspection utilities.

The reference delegates planning to Postgres and never inspects it
(SURVEY §4); here the plan IS the scale contract, so the engine ships the
tools to assert on it (used by tests/test_plans.py and ad-hoc tuning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prep) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain('formatted')`` as a string (codegen ids, per-node detail)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def scan_columns(df: DataFrame) -> set[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    for line in physical_plan(df).splitlines():
        if "FileScan parquet" in line:
            cols = line.split("[", 2)[1].split("]")[0]
            return {c.split("#")[0] for c in cols.split(",") if c}
    return set()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragment of the scan node ('' if none)."""
    plan = physical_plan(df)
    idx = plan.find("PushedFilters: [")
    if idx == -1:
        return ""
    return plan[idx + len("PushedFilters: [") : plan.index("]", idx)]

def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters fragment of the scan node ('' if none)."""
    plan = physical_plan(df)
    idx = plan.find("PartitionFilters: [")
    if idx == -1:
        return ""
    return plan[idx + len("PartitionFilters: [") : plan.index("]", idx)]


def count_exchanges(df: DataFrame, key: str | None = None) -> int:
    """Number of shuffle exchanges (optionally only those on ``key``)."""
    lines = [
        l
        for l in physical_plan(df).splitlines()
        if "Exchange hashpartitioning" in l
    ]
    if key:
        lines = [l for l in lines if key in l]
    return len(lines)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)
