"""Local replica of the driver's DuckDB-oracle comparison.

For each catalog query: run the Spark implementation AND the oracle SQL on
the same sf directory, normalize (sort columns by name, sort rows, stringify
values), and diff. Mirrors the driver's row-count + schema + value-hash gate
so failures surface locally before a round ends.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# Output-column types the driver's fetch path may represent asymmetrically
# between Spark and DuckDB (e.g. pandas turns DuckDB DECIMAL and HUGEINT into
# float64 while Spark returns Decimal objects / int64). Catalog queries must
# never emit them: money aggregates are computed exactly in DECIMAL and cast
# to DOUBLE at the end (bit-identical correctly-rounded cast on both engines),
# and DuckDB integer sums are cast to BIGINT.
_BANNED_DUCK_TYPES = ("DECIMAL", "HUGEINT")


def _norm_value(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision: repr round-trips the exact double, so any
        # engine-order drift surfaces locally before the driver sees it
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def compare_one(spark, con, name: str, fn, sql: str, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_types = [str(t) for t in rel.types]
    d_rows = rel.fetchall()
    report: dict[str, Any] = {"name": name, "spark_rows": len(s_rows), "oracle_rows": len(d_rows)}
    bad_types = [
        f"{c}:{t}"
        for c, t in zip(d_cols, d_types)
        if any(b in t.upper() for b in _BANNED_DUCK_TYPES)
    ]
    bad_types += [
        f"spark.{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.dataType.simpleString().startswith("decimal")
    ]
    if bad_types:
        report["status"] = "UNSTABLE_OUTPUT_TYPE"
        report["columns"] = bad_types
        return report
    if sorted(s_cols) != sorted(d_cols):
        report["status"] = "SCHEMA_MISMATCH"
        report["spark_cols"] = s_cols
        report["oracle_cols"] = d_cols
        return report
    if len(s_rows) != len(d_rows):
        report["status"] = "ROWCOUNT_MISMATCH"
        return report
    ns, nd = normalize(s_cols, s_rows), normalize(d_cols, d_rows)
    if ns != nd:
        diff = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        report["status"] = "VALUE_MISMATCH"
        report["first_diffs"] = diff
        return report
    report["status"] = "OK"
    return report
