"""Triangle census + clustering coefficient — r8-session catalog query
`word_triangles`. Spark uses degree-orientation wedge generation; the
DuckDB twin enumerates a<b<c — different plans, identical exact
counts. A planted clique/path fixture pins the census by hand."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.graph import (
    triangle_census,
)
from logstream_processing_service_spark.operators.textanalysis import (
    word_triangles,
    word_triangles_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_triangles_hash_match_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "word_triangles",
        lambda s, sf: word_triangles(load_table(s, sf, "documents")),
        word_triangles_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _edges(spark, pairs):
    sym = [(a, b, 1) for a, b in pairs] + [(b, a, 1) for a, b in pairs]
    return spark.createDataFrame(sym, "src string, dst string, w long")


def test_hand_computed_clique_and_path(spark):
    """K4 on {a,b,c,d} (4 triangles, every node in 3, clustering 1.0)
    plus a path e-f-g (no triangle, f has degree 2 and clustering 0).
    Node degrees in K4 are equal, so orientation falls back to the node
    tie-break — the census must still count each triangle once."""
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    path = [("e", "f"), ("f", "g")]
    rows = triangle_census(_edges(spark, k4 + path)).collect()
    got = {r["word"]: r for r in rows}
    for n in "abcd":
        assert got[n]["degree"] == 3
        assert got[n]["n_triangles"] == 3
        assert got[n]["clustering"] == 1.0
    assert got["f"]["n_triangles"] == 0 and got["f"]["clustering"] == 0.0
    assert "e" not in got and "g" not in got  # degree-1 nodes excluded
    total = sum(r["n_triangles"] for r in rows)
    assert total == 4 * 3  # 4 triangles x 3 corners


def test_hub_generates_no_wedges_plan(spark):
    """The scale claim: wedge formation routes through LOW-degree
    endpoints. Star hub h with 50 leaves + one closing edge: exactly
    one triangle, and the plan is equi-joins only."""
    star = [("h", f"l{i}") for i in range(50)] + [("l0", "l1")]
    df = triangle_census(_edges(spark, star))
    rows = {r["word"]: r for r in df.collect()}
    assert rows["h"]["n_triangles"] == 1
    assert rows["l0"]["n_triangles"] == 1 and rows["l1"]["n_triangles"] == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
