"""Unicode normalization lane — r8 catalog candidate `normalize_text`.
The injector's noise is exactly reversible, so the closed-form oracle
compares md5(normalized) against md5(ORIGINAL) and derives the
removed-char count from word arithmetic — no Unicode on the DuckDB
side."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.textnorm import (
    normalize_string,
    normalize_text,
    normalize_text_oracle_sql,
    with_noisy_text,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_normalize_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "normalize_text",
        lambda s, sf: normalize_text(
            with_noisy_text(load_table(s, sf, "documents"))
        ),
        normalize_text_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_normalize_string_rules():
    # fullwidth -> ASCII (NFKC)
    assert normalize_string("ａｂｃ") == "abc"
    # zero-width family stripped
    assert normalize_string("a​b‌c‍d﻿e") == "abcde"
    # NBSP -> space (NFKC), whitespace collapsed, CRLF/tabs too
    assert normalize_string("a b") == "a b"
    assert normalize_string("  a \t b\r\nc  ") == "a b c"
    # compatibility ligature (NFKC): ﬁ -> fi
    assert normalize_string("ﬁn") == "fin"
    # idempotent
    s = "a b c"
    assert normalize_string(normalize_string(s)) == normalize_string(s)


def test_injection_is_reversible_and_nontrivial(spark):
    docs = load_table(spark, SF_DIR, "documents")
    noisy = with_noisy_text(docs)
    out = normalize_text(noisy)
    # every multi-word doc was actually changed by the injector
    n_changed = out.filter("changed").count()
    assert n_changed == docs.filter("text like '% %'").count() > 0
    # and the normalizer removed characters where injections added them
    assert out.filter("n_removed > 0").count() == n_changed
