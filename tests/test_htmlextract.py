"""HTML text-extraction lane — r8 catalog candidate
`html_text_extract`. Generator and extractor are both pure JVM string
expressions; the DuckDB twin recomputes expected outputs closed-form
from (doc_id, text) without parsing HTML, so a hash match proves the
extractor reverses the generator byte-exactly."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.htmlextract import (
    html_extract_oracle_sql,
    html_text_extract,
    with_synthetic_html_payload,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_html_extract_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "html_text_extract",
        lambda s, sf: html_text_extract(
            with_synthetic_html_payload(load_table(s, sf, "documents"))
        ).orderBy("doc_id"),
        html_extract_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_script_angle_bracket_requires_script_first_removal(spark):
    """The generated <script> body contains `x < 2`: stripping tags
    BEFORE removing scripts would leave `x  2) { x++; }` fragments in
    the text. The extractor must produce exactly the original words."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta", "s")],
        "doc_id long, text string, source string",
    )
    page = with_synthetic_html_payload(docs)
    row = html_text_extract(page).first()
    assert row["title"] == "alpha beta gamma"
    assert row["n_links"] == 0  # doc 0: doc_id % 5 == 0
    assert row["main_chars"] == len("alpha beta gamma delta")
    import hashlib

    assert row["text_md5"] == hashlib.md5(
        b"alpha beta gamma delta"
    ).hexdigest()


def test_links_counted_and_in_main_text(spark):
    docs = spark.createDataFrame(
        [(3, "a b c d e f g h i j k l", "s")],
        "doc_id long, text string, source string",
    )
    row = html_text_extract(with_synthetic_html_payload(docs)).first()
    assert row["n_links"] == 3
    import hashlib

    want = "a b c d e f g h i j k l link 1 link 2 link 3"
    assert row["text_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert row["boiler_chars"] == len("home about products contact (c) example")


def test_oracle_normalizes_whitespace_like_extractor(spark):
    """r7 ADVICE regression: the closed-form oracle must collapse+trim
    main_text exactly like the Spark side's ``_strip``. Planted edge
    docs — empty text (expected main text = the bare link anchors, no
    leading space) and a doubled inner space — must hash-match."""
    import duckdb
    import pandas as pd

    from .oracle_harness import normalize

    rows = [
        (1, "", "s"),  # doc_id%5=1 -> main text is exactly "link 1"
        (2, "alpha  beta gamma", "s"),  # doubled space collapses
        (7, "x y", "s"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    sdf = html_text_extract(with_synthetic_html_payload(docs)).orderBy(
        "doc_id"
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "source"]),
    )
    rel = con.sql(html_extract_oracle_sql())
    assert sorted(sdf.columns) == sorted(rel.columns)
    s = normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    d = normalize(list(rel.columns), rel.fetchall())
    assert s == d
    # and the empty-text doc's expectation is the trimmed anchor text
    import hashlib

    got = {r["doc_id"]: r["text_md5"] for r in sdf.collect()}
    assert got[1] == hashlib.md5(b"link 1").hexdigest()
    assert got[2] == hashlib.md5(
        b"alpha beta gamma link 1 link 2"
    ).hexdigest()


def test_extractor_plan_is_zero_shuffle_single_scan(spark):
    docs = load_table(spark, SF_DIR, "documents")
    df = html_text_extract(with_synthetic_html_payload(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan  # per-row JVM expressions only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
