"""Greedy submodular source ordering — rehearsed r13 catalog candidate
`greedy_coverage_order`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.curation import (
    greedy_coverage_order,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_greedy_order_hash_matches_unrolled_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        greedy_coverage_oracle_sql,
        q_greedy_coverage_order,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "greedy_coverage_order", q_greedy_coverage_order,
        greedy_coverage_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
    spark.catalog.clearCache()


def test_greedy_picks_cover_max_first_and_mirror_scores_zero(spark):
    """Planted fixture: source A holds 6 distinct shingles, B holds 3
    (disjoint), M is a verbatim mirror of A. Greedy must pick A first
    (max inventory), then B (3 new), then M with marginal_gain 0 (its
    pool emptied when A was taken) — the submodular property the
    one-shot report cannot express."""
    a = "a b c d e f g h"            # 6 distinct 3-gram shingles
    b = "p q r s t"                  # 3 distinct
    docs = spark.createDataFrame(
        [(1, "A", a), (2, "M", a), (3, "B", b)],
        "doc_id long, source string, text string",
    )
    rows = greedy_coverage_order(docs, k=3).collect()
    assert [r["source"] for r in rows] == ["A", "B", "M"]
    assert rows[0]["marginal_gain"] == 6
    assert rows[1]["marginal_gain"] == 3
    assert rows[2]["marginal_gain"] == 0
    assert rows[2]["cum_covered"] == 9
    assert rows[2]["cum_share"] == 1.0
    # cumulative coverage is the running sum of marginals (gains count
    # only NEW shingles)
    assert [r["cum_covered"] for r in rows] == [6, 9, 9]
    spark.catalog.clearCache()


def test_tie_breaks_by_source_name(spark):
    """Equal marginal gains must break by source ASC on both engines
    (the deterministic argmax the unrolled oracle's ORDER BY pins)."""
    x = "one two three four five"
    y = "six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, "zeta", x), (2, "alpha", y)],
        "doc_id long, source string, text string",
    )
    rows = greedy_coverage_order(docs, k=2).collect()
    assert [r["source"] for r in rows] == ["alpha", "zeta"]
    spark.catalog.clearCache()
