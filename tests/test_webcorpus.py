"""curate_web_corpus — r8 catalog candidate: the composed
crawl-to-training-data funnel over the HTML + URL lanes with a
closed-form composed oracle. Planted fixtures prove every gate can
fire (the synthetic corpus leaves exact-dedup vacuous — dup texts get
distinct link suffixes — so the fixture pins it)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.webcorpus import (
    curate_web_corpus,
    curate_web_corpus_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_web_funnel_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "curate_web_corpus",
        lambda s, sf: curate_web_corpus(load_table(s, sf, "documents")),
        curate_web_corpus_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_every_gate_fires_on_planted_corpus(spark):
    """doc 0: short text (boilerplate-dominated -> 01 drops it);
    doc 5: 10 words (quality gate -> 02);
    docs 10/15: identical text AND identical doc_id%5 (same link
    suffix -> exact dup, 03 keeps the lower id);
    docs 20..45 step 5: six more distinct docs on the SAME registered
    domain as 10 (doc_id%5==0 -> example.com upper), cap=3 -> 04 drops."""
    long = " ".join(f"w{i}" for i in range(30))
    # doc 5: char-heavy but word-light, so it clears the content-ratio
    # gate and falls to the WORD gate specifically
    fifteen_fat_words = " ".join("wordzilla" for _ in range(15))
    rows = (
        [(0, "tiny", "s"), (5, fifteen_fat_words, "s")]
        + [(10, long, "s"), (15, long, "s")]
        + [(20 + 5 * i, long + f" tail{i}", "s") for i in range(6)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        r["stage"]: r["kept"]
        for r in curate_web_corpus(docs, domain_cap=3).collect()
    }
    assert out["00_raw"] == 10
    assert out["01_extracted"] == 9   # doc 0 boilerplate-dominated
    assert out["02_quality"] == 8     # doc 5 only 10 words
    assert out["03_deduped"] == 7     # doc 15 exact-dup of doc 10
    assert out["04_domain_cap"] == 3  # all on example.com, cap 3


def test_funnel_is_three_exchanges(spark):
    """The whole composed pipeline costs exactly the windows it needs:
    dedup hash window + domain window (+ their sort exchanges) — the
    extraction/parsing stages add none."""
    docs = load_table(spark, SF_DIR, "documents")
    from pyspark.sql import functions as F
    from logstream_processing_service_spark.operators.htmlextract import (
        html_text_extract,
        with_synthetic_html_payload,
    )
    from logstream_processing_service_spark.operators.urls import (
        parse_urls,
        with_synthetic_url_column,
    )

    base = html_text_extract(
        with_synthetic_html_payload(docs), include_text=True
    ).join(parse_urls(with_synthetic_url_column(docs)), "doc_id")
    plan = base._jdf.queryExecution().executedPlan().toString()
    # the join of two zero-shuffle lanes on doc_id: no pre-join exchange
    # beyond the join's own requirement
    assert "CartesianProduct" not in plan
