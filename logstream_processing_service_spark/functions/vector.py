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


# ---------------------------------------------------------------------------
# Random-hyperplane LSH for cosine (north-star near-dup scale path)
# ---------------------------------------------------------------------------

LSH_BITS = 16
LSH_BANDS = 4  # 4 x 4-bit bands over the 16-bit signature
LSH_BAND_BITS = 4
LSH_DIM = 64

# Deterministic Rademacher (+/-1) hyperplanes: sign(dot(v, H_b)) is bit b.
# Fixed seed => identical literals in the Spark plan and the DuckDB oracle.


def _gen_hyperplanes(bits: int = LSH_BITS, dim: int = LSH_DIM) -> list[list[int]]:
    state = 88172645463325252
    planes = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            # xorshift64 — dependency-free, stable across numpy versions
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(1 if state & 1 else -1)
        planes.append(row)
    return planes


HYPERPLANES: list[list[int]] = _gen_hyperplanes()


def lsh_signature(emb: Column) -> Column:
    """16-bit hyperplane signature: bit b set iff dot(emb, H_b) > 0.
    Pure codegen arithmetic — the signed sums reuse the same fold shape as
    ``dot`` so Spark and DuckDB agree bit-for-bit."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(HYPERPLANES):
        signed = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(h) for h in plane]),
                lambda x, h: _d(x) * _d(h),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(signed > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def lsh_signature_sql_duckdb(a: str, dim: int = LSH_DIM) -> str:
    terms = []
    for b, plane in enumerate(HYPERPLANES):
        arr = "[" + ",".join(str(h) for h in plane) + "]"
        dot_h = (
            f"list_sum(list_transform(range(1,{dim + 1}), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST(({arr})[i] AS DOUBLE)))"
        )
        terms.append(f"(CASE WHEN {dot_h} > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
