"""DoReMi weights -> sampling plan composition — rehearsed r14 catalog
candidate `doremi_to_mix_pipeline`."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_doremi_to_mix_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        doremi_to_mix_query_oracle_sql,
        q_doremi_to_mix_pipeline,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "doremi_to_mix_pipeline", q_doremi_to_mix_pipeline,
        doremi_to_mix_query_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_mix_plan_carries_doremi_weights_and_respects_budget(spark):
    """The plan's target_share column IS doremi_iterated's
    domain_weight; sample_rate is capped at 1; the expected token
    total never exceeds the full corpus (each domain ships at most its
    own tokens)."""
    from logstream_processing_service_spark.operators.curation import (
        doremi_iterated,
        doremi_to_mix_pipeline,
    )

    rows = (
        [(i, "alpha beta gamma " * 5, "web") for i in range(10)]
        + [(100 + i, "delta epsilon " * 3, "books") for i in range(3)]
        + [(200 + i, "zeta " * 2, "code") for i in range(2)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {r["source"]: r["domain_weight"] for r in doremi_iterated(docs).collect()}
    plan = doremi_to_mix_pipeline(docs).collect()
    assert {r["source"]: r["target_share"] for r in plan} == w
    total = sum(r["n_tokens"] for r in plan)
    for r in plan:
        assert 0.0 <= r["sample_rate"] <= 1.0
        assert r["expected_tokens"] <= r["n_tokens"] + 1e-6
    assert sum(r["expected_tokens"] for r in plan) <= total
