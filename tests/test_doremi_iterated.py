"""Full DoReMi multiplicative-weights loop (re-weighted mixture per
round) — rehearsed r13 catalog candidate `doremi_iterated`."""

from __future__ import annotations

import math

import pytest

from logstream_processing_service_spark.operators.curation import (
    doremi_iterated,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_iterated_hash_matches_unrolled_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        doremi_iterated_query_oracle_sql,
        q_doremi_iterated,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "doremi_iterated", q_doremi_iterated,
        doremi_iterated_query_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
    spark.catalog.clearCache()


def test_mixture_reweighting_shrinks_outlier_excess(spark):
    """The whole point of iterating: as the mixture moves toward the
    upweighted outlier domain, the outlier's excess against the
    round-T mixture must be SMALLER than its round-1 (uniform-mixture)
    excess — the static signal the one-shot tilt uses. Weights still
    favour the outlier, and sum to ~1."""
    rows = []
    for i in range(40):
        rows.append((i, "news", "the market rose today on steady trade volume"))
    for i in range(40, 80):
        rows.append((i, "blogs", "the market fell today on steady trade volume"))
    for i in range(80, 100):
        rows.append((i, "code", "def f x return x plus one end def"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    one = {r["source"]: r for r in doremi_iterated(docs, t_rounds=1).collect()}
    three = {r["source"]: r for r in doremi_iterated(docs, t_rounds=3).collect()}
    spark.catalog.clearCache()
    # outlier still the heaviest domain after 3 rounds
    assert three["code"]["domain_weight"] > three["news"]["domain_weight"]
    assert three["code"]["domain_weight"] > three["blogs"]["domain_weight"]
    # the re-weighted mixture moved TOWARD code: its final-round excess
    # is below its uniform-mixture excess
    assert three["code"]["excess_kl"] < one["code"]["excess_kl"]
    assert math.isclose(
        sum(r["domain_weight"] for r in three.values()), 1.0, abs_tol=3e-6
    )


def test_uniform_corpus_is_a_fixed_point(spark):
    """Identical domains: zero excess every round, weights pinned at
    exactly 1/nd through all T rounds (the MW fixed point survives the
    smoothing and the micro-unit snaps exactly)."""
    rows = [(i, f"s{i % 4}", "alpha beta gamma delta") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = doremi_iterated(docs, t_rounds=3).collect()
    spark.catalog.clearCache()
    for r in out:
        assert r["excess_kl"] == 0.0
        assert r["domain_weight"] == 0.25
