"""KWIC snippet extraction — r9 catalog candidate `kwic_snippets`.
Same RE2-safe pattern on both engines; fixtures pin the window
arithmetic, word-boundary exactness, and non-overlap absorption."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.retrieval import (
    kwic_oracle_sql,
    kwic_snippets,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_kwic_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "kwic_snippets",
        lambda s, sf: kwic_snippets(load_table(s, sf, "documents")),
        kwic_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_window_boundary_and_word_exactness(spark):
    rows = kwic_snippets(
        _docs(
            spark,
            [
                "a b c table d e f",       # full ±2 window
                "table x",                  # window truncated at edges
                "fastable notable tables",  # substrings must NOT match
                "no hits here",
            ],
        ),
        term="table",
        window=2,
    ).collect()
    got = {r["doc_id"]: r for r in rows}
    assert got[0]["n_matches"] == 1
    assert got[0]["first_snippet"] == "b c table d e"
    assert got[1]["first_snippet"] == "table x"
    assert got[2]["n_matches"] == 0 and got[2]["first_snippet"] is None
    assert got[3]["n_matches"] == 0


def test_nonoverlap_absorption_and_last_snippet(spark):
    # the first window consumes "x table y table" (suffix reps " y",
    # " table" — the second hit is absorbed); the distant third hit is
    # a separate match
    txt = "x table y table z q w e r table u v"
    r = kwic_snippets(_docs(spark, [txt]), term="table", window=2).first()
    assert r["n_matches"] == 2
    assert r["first_snippet"] == "x table y table"
    assert r["last_snippet"] == "e r table u v"


def test_kwic_plan_zero_shuffle_single_scan(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = kwic_snippets(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert plan.count("FileScan parquet") == 1
