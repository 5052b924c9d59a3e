"""Exact char-grain substring duplication profile — rehearsed r11
catalog candidate `char_window_dup_profile` (the Lee et al. 2022
exact-substring complement of the word-grain shingle family)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    char_window_dup_profile,
    char_window_dup_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_char_window_dup_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "char_window_dup_profile",
        lambda s, sf: char_window_dup_profile(load_table(s, sf, "documents")),
        char_window_dup_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_verbatim_substring(spark):
    """Docs 1 and 2 share one EXACT 61-char run inside otherwise
    unrelated text (a 59-char planted block, extended 1 char on each
    side because both docs flank it with spaces); doc 3 shares
    nothing. At window=40 the run contributes exactly 61-40+1 = 22
    shared windows to each of docs 1/2 and zero to doc 3 — stride-1
    exactness, cross-checked against a pure-Python window recount."""
    shared = " ".join(f"tok{i:02d}" for i in range(10))  # 59 chars
    d1 = "aaaa bbbb cccc " + shared + " dddd eeee"
    d2 = "ffff gggg " + shared + " hhhh iiii jjjj"
    d3 = "kkkk llll mmmm nnnn oooo pppp qqqq rrrr ssss tttt uuuu vvvv"
    rows = [(1, d1), (2, d2), (3, d3)]

    def wins(t):
        return {t[i:i + 40] for i in range(len(t) - 40 + 1)}

    assert len(wins(d1) & wins(d2)) == 22
    assert not wins(d1) & wins(d3) and not wins(d2) & wins(d3)

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in char_window_dup_profile(docs, window=40).collect()
    }
    assert got[1]["n_dup_windows"] == 22
    assert got[2]["n_dup_windows"] == 22
    assert got[3]["n_dup_windows"] == 0
    assert got[1]["max_window_df"] == 2
    assert got[3]["dup_ratio"] == 0.0


def test_short_doc_zero_windows_null_ratio(spark):
    """A doc shorter than the window emits no windows: zeros and a
    NULL ratio, but the doc stays in the doc-grain spine."""
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "w" * 80)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in char_window_dup_profile(docs).collect()}
    assert got[1]["n_windows"] == 0
    assert got[1]["dup_ratio"] is None
    assert got[1]["max_window_df"] is None
    # the 80-char constant run has 41 windows but array_distinct
    # collapses them to ONE distinct window, unshared -> not a dup
    assert got[2]["n_windows"] == 1
    assert got[2]["n_dup_windows"] == 0


def test_hash_keys_variant_is_value_identical(spark):
    """The 100-TB shuffle lever (hash_keys=True: xxhash64 8-byte longs
    through the analytic exchange instead of 40-char strings) must be
    VALUE-identical to the raw-key form — the profile only ever
    aggregates window equality, and xxhash64 collisions are 2^-64 per
    pair (none at test scale by construction)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw = char_window_dup_profile(docs).collect()
    hashed = char_window_dup_profile(docs, hash_keys=True).collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in hashed]
