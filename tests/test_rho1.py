"""Rho-1-style selective-LM token budget — rehearsed r12 catalog
candidate `rho1_token_selection`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.curation import (
    rho1_token_selection,
    rho1_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_rho1_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        q_rho1_token_selection,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "rho1_token_selection", q_rho1_token_selection,
        rho1_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
    spark.catalog.clearCache()


def test_rare_token_docs_selected_common_docs_not(spark):
    """A corpus of one dominant phrase plus a handful of rare-word
    docs: the boilerplate doc selects (near) nothing, rare-word docs
    select everything — and a mixed doc sits in between with exactly
    its rare half selected."""
    rows = []
    for i in range(50):
        rows.append((i, "the quick brown fox jumps"))
    rows.append((100, "quasar nebula pulsar magnetar"))
    rows.append((101, "the quick quasar nebula"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in rho1_token_selection(docs).collect()}
    assert out[0]["n_selected"] == 0          # pure boilerplate
    assert out[0]["sel_rate"] == 0.0
    assert out[0]["sel_avg_surprisal"] is None  # NULL when none selected
    assert out[100]["n_selected"] == 4         # all rare
    assert out[100]["sel_rate"] == 1.0
    assert out[101]["n_selected"] == 2         # exactly the rare half
    assert out[101]["sel_rate"] == 0.5
    assert out[100]["sel_avg_surprisal"] > out[101]["sel_avg_surprisal"] * 0.99
    spark.catalog.clearCache()


def test_selection_rate_bounds_and_monotonicity(spark, sf_dir):
    """On real data: rates in [0,1], n_selected <= n_tokens, and
    sel_avg_surprisal (when present) exceeds the corpus entropy by
    construction."""
    from logstream_processing_service_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = rho1_token_selection(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_selected"] <= r["n_tokens"]
        assert 0.0 <= r["sel_rate"] <= 1.0
    spark.catalog.clearCache()
