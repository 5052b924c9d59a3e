"""Leave-one-out source coverage — rehearsed r12 catalog candidate
`source_coverage_report`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.curation import (
    source_coverage_report,
    source_coverage_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_source_coverage_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        q_source_coverage_report,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "source_coverage_report", q_source_coverage_report,
        source_coverage_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
    spark.catalog.clearCache()


def test_mirror_scores_zero_marginal(spark):
    """A source that verbatim-mirrors another contributes ZERO unique
    shingles (the cut-the-mirror signal); a source with its own text is
    the only provider of its shingles."""
    rows = [
        (1, "feedA", "alpha beta gamma delta epsilon zeta"),
        (2, "mirror", "alpha beta gamma delta epsilon zeta"),
        (3, "feedB", "one two three four five six seven"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_coverage_report(docs).collect()}
    assert out["mirror"]["n_unique"] == 0
    assert out["mirror"]["uniqueness"] == 0.0
    assert out["mirror"]["marginal_share"] == 0.0
    assert out["feedA"]["n_unique"] == 0  # mirrored by `mirror`
    assert out["feedB"]["n_unique"] == out["feedB"]["n_shingles"]
    assert out["feedB"]["uniqueness"] == 1.0
    # coverage shares: feedA and mirror cover the same 4 shingles,
    # feedB covers 5 of the 9 distinct corpus shingles
    assert out["feedB"]["coverage_share"] == round(5 / 9, 6)
    assert out["feedA"]["coverage_share"] == round(4 / 9, 6)
    spark.catalog.clearCache()


def test_marginal_shares_bounded_by_coverage(spark, sf_dir):
    """Real data invariants: n_unique <= n_shingles, marginal_share <=
    coverage_share, and summed coverage >= 1 (sources overlap)."""
    from logstream_processing_service_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = source_coverage_report(docs).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_shingles"]
        assert r["marginal_share"] <= r["coverage_share"] + 1e-9
    assert sum(r["coverage_share"] for r in rows) >= 0.999
    spark.catalog.clearCache()
