"""URL parse/normalize + registered-domain rollup — r8 catalog
candidates `url_parse` and `url_domain_report`. Closed-form oracle (no
URL parsed on the DuckDB side); adversarial fixtures pin the
normalization rules individually."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.urls import (
    parse_urls,
    url_domain_report,
    url_domain_report_oracle_sql,
    url_parse_oracle_sql,
    with_synthetic_url_column,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_url_parse_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "url_parse",
        lambda s, sf: parse_urls(
            with_synthetic_url_column(load_table(s, sf, "documents"))
        ).orderBy("doc_id"),
        url_parse_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_url_domain_report_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "url_domain_report",
        lambda s, sf: url_domain_report(
            with_synthetic_url_column(load_table(s, sf, "documents"))
        ),
        url_domain_report_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _parse_one(spark, url):
    df = spark.createDataFrame([(0, url)], "doc_id long, url string")
    return parse_urls(df).first()


def test_normalization_rules_individually(spark):
    # case + www + default https port + fragment + query order
    r = _parse_one(
        spark, "HTTPS://WWW.Blog.News.CO.UK:443/a/b?z=1&a=2#frag"
    )
    assert r["host"] == "blog.news.co.uk"
    assert r["port"] is None  # 443 is default for https
    assert r["registered_domain"] == "news.co.uk"  # two-level suffix
    assert r["norm_url"] == "https://blog.news.co.uk/a/b?a=2&z=1"

    # non-default port survives; plain .com registered domain
    r = _parse_one(spark, "http://data.example.com:8080/x?b=1")
    assert r["port"] == 8080
    assert r["registered_domain"] == "example.com"
    assert r["norm_url"] == "http://data.example.com:8080/x?b=1"

    # http default port 80 dropped; no query
    r = _parse_one(spark, "http://example.com:80/x")
    assert r["port"] is None and r["norm_url"] == "http://example.com/x"

    # www is stripped only as a leading label
    r = _parse_one(spark, "https://wwwx.example.com/x")
    assert r["host"] == "wwwx.example.com"

    # single-label host: registered domain falls back to the host
    r = _parse_one(spark, "https://localhost/x")
    assert r["registered_domain"] == "localhost"


def test_parser_plan_is_zero_shuffle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = parse_urls(with_synthetic_url_column(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
