"""Readability + token-entropy quality signals — r9 catalog candidates
`readability_scores` and `token_entropy`. Readability is unrounded
per-row double formulas (the quality_scores convention) with DuckDB
constants CAST AS DOUBLE; entropy follows the vocab_divergence 6-dp
post-aggregation rounding."""

from __future__ import annotations

import math

import pytest

from logstream_processing_service_spark.operators.textanalysis import (
    readability_oracle_sql,
    readability_scores,
    token_entropy,
    token_entropy_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_readability_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "readability_scores",
        lambda s, sf: readability_scores(load_table(s, sf, "documents")),
        readability_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_entropy_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "token_entropy",
        lambda s, sf: token_entropy(load_table(s, sf, "documents")),
        token_entropy_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_readability_hand_computed(spark):
    # "see the cat. run far!" -> words 5, sentences 2,
    # vowel runs: see(ee->2? 's-ee' = 1 run) the(e) cat(a) run(u) far(a)
    # lower: "see the cat. run far!" runs: ee, e, a, u, a = 5
    rows = readability_scores(
        _docs(spark, ["see the cat. run far!", ""])
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    r0 = got[0]
    assert r0["n_words"] == 5 and r0["n_sentences"] == 2
    assert r0["n_syllables"] == 5
    assert r0["syll_per_word"] == 1.0
    assert r0["flesch"] == 206.835 - 1.015 * 2.5 - 84.6 * 1.0
    # empty text: zero words, sentence floor 1, flesch collapses to the
    # constant (0/1 words-per-sentence, 0 syllables-per-word)
    r1 = got[1]
    assert r1["n_words"] == 0 and r1["n_sentences"] == 1
    assert r1["flesch"] == 206.835


def test_entropy_hand_computed(spark):
    # "a a a a" -> H = 0; "a b c d" -> H = ln 4, norm 1.0
    # "a a b" -> H = ln3 - (2 ln2)/3
    rows = token_entropy(
        _docs(spark, ["a a a a", "a b c d", "a a b"])
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    assert got[0]["entropy"] == 0.0 and got[0]["norm_entropy"] == 0.0
    assert got[1]["entropy"] == round(math.log(4), 6)
    assert got[1]["norm_entropy"] == 1.0
    h = math.log(3) - (2 * math.log(2)) / 3
    assert got[2]["entropy"] == round(h, 6)
    assert got[2]["norm_entropy"] == round(h / math.log(2), 6)


def test_readability_plan_zero_shuffle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        readability_scores(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_entropy_plan_partial_agg_no_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        token_entropy(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # map-side combine on the (doc, token) aggregate: partial+final
    assert "partial_count" in plan or "HashAggregate" in plan
