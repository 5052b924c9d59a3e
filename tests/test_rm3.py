"""RM3 pseudo-relevance-feedback query expansion — rehearsed r10
catalog candidate `rm3_expanded_search` (registration coordinates in
ROADMAP's r10 queue)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.retrieval import (
    rm3_expanded_search,
    rm3_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_rm3_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "rm3_expanded_search",
        lambda s, sf: rm3_expanded_search(load_table(s, sf, "documents")),
        rm3_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_expansion_recalls_related_doc(spark):
    """Planted corpus: the query 'alpha' directly hits docs 1/2; doc 3
    shares no query term but is saturated with 'beta', the strongest
    term of the feedback docs -> RM3's second pass must pull doc 3 into
    the ranking (plain BM25 cannot: zero query-term overlap)."""
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta delta"),
        (3, "beta beta beta epsilon"),
        (4, "zeta eta theta iota"),
        # filler keeps beta's df at n_docs/2, under the stopword cutoff
        (5, "zeta eta kappa"),
        (6, "theta iota kappa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = rm3_expanded_search(
        docs, queries=("alpha",), k=4, fb_docs=2, fb_terms=1
    ).collect()
    ranked = [r["doc_id"] for r in got]
    assert set(ranked[:3]) == {1, 2, 3}  # doc 3 recalled via 'beta'
    assert 4 not in ranked  # no shared vocabulary, still absent


def test_tf_persisted_once(spark):
    """The (doc, tok) tf table feeds four consumers; the plan must read
    the cache (InMemoryTableScan), never re-tokenize per branch."""
    docs = load_table(spark, SF_DIR, "documents")
    df = rm3_expanded_search(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 3
    spark.catalog.clearCache()
