"""Vector expressions over ArrayType(Float) columns — pure Spark SQL, no
UDFs (SURVEY M3's Minkowski note: ``aggregate(zip_with(...))`` keeps the
distance math inside codegen; the reference does this per-row in scipy,
src/ml/vector_engine.py:13-19).

Elements are cast to double before any arithmetic so the fold matches the
DuckDB oracle bit-for-bit (same left-to-right order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def minkowski(a: Column, b: Column, p: float = 1.5) -> Column:
    """Minkowski distance (reference default p=1.5,
    src/ml/vector_engine.py:8)."""
    s = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.pow(F.abs(_d(x) - _d(y)), F.lit(p))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.pow(s, F.lit(1.0 / p))


# --- DuckDB oracle snippets (1-based list indexing, same fold order) -------


def dot_sql_duckdb(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1,{dim + 1}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def norm_sql_duckdb(a: str, dim: int) -> str:
    return f"sqrt({dot_sql_duckdb(a, a, dim)})"


def cosine_sql_duckdb(a: str, b: str, dim: int) -> str:
    return (
        f"({dot_sql_duckdb(a, b, dim)} / "
        f"({norm_sql_duckdb(a, dim)} * {norm_sql_duckdb(b, dim)}))"
    )


def minkowski_sql_duckdb(a: str, b: str, dim: int, p: float = 1.5) -> str:
    s = (
        f"list_sum(list_transform(range(1,{dim + 1}), "
        f"i -> pow(abs(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)), {p})))"
    )
    return f"pow({s}, {1.0 / p})"
