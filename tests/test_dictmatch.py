"""Aho–Corasick dictionary matching (operators/dictmatch.py) — r7
catalog candidate `dictionary_match_counts`.

The automaton's merged suffix-link outputs are the risky part
(overlaps, nested terms, shared prefixes), so scan_text is checked
against a brute-force all-offsets counter, hypothesis-fuzzed, and the
Spark operator hash-matches the brute-force DuckDB oracle at both SFs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logstream_processing_service_spark.operators.dictmatch import (
    DICT_TERMS,
    build_automaton,
    dictionary_match_counts,
    dictionary_match_oracle_sql,
    scan_text,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


def _brute(text: str, terms: list[str]) -> dict[int, int]:
    out = {}
    for ti, t in enumerate(terms):
        n = sum(
            1
            for i in range(len(text) - len(t) + 1)
            if text[i : i + len(t)] == t
        )
        if n:
            out[ti] = n
    return out


def test_overlaps_and_nesting():
    terms = ["aba", "a", "aa", "ab"]
    auto = build_automaton(terms)
    got = scan_text("ababa", auto)
    assert got == {0: 2, 1: 3, 3: 2}  # "aba" overlaps itself
    got = scan_text("aaa", auto)
    assert got == {1: 3, 2: 2}  # nested "a" inside "aa"


def test_shared_prefix_and_suffix_links():
    terms = ["she", "he", "hers", "his"]
    auto = build_automaton(terms)
    got = scan_text("ushers", auto)
    # "she" at 1, "he" at 2 (inside "she"), "hers" at 2
    assert got == {0: 1, 1: 1, 2: 1}


@settings(max_examples=80, deadline=None)
@given(
    st.text(alphabet="abc", min_size=0, max_size=200),
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=1,
        max_size=8,
        unique=True,
    ),
)
def test_fuzz_matches_bruteforce(text, terms):
    auto = build_automaton(terms)
    assert scan_text(text, auto) == _brute(text, terms)


def test_empty_term_rejected():
    with pytest.raises(ValueError):
        build_automaton(["ok", ""])


def test_oracle_sql_escapes_quoted_terms():
    """Terms containing single quotes must not break (or inject into)
    the DuckDB oracle text (ADVICE r6): the generated SQL parses and
    counts the quoted term correctly."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id,"
        " 'it''s o''brien''s, it''s true' AS text"
    )
    sql = dictionary_match_oracle_sql(("it's", "o'brien", "absent'q"))
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(sql).fetchall()
    }
    assert got["it's"] == (1, 2)
    assert got["o'brien"] == (1, 1)
    assert got["absent'q"] == (0, 0)


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_dictionary_match_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "dictionary_match_counts",
        lambda s, sf: dictionary_match_counts(
            load_table(s, sf, "documents"), list(DICT_TERMS)
        ),
        dictionary_match_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="ab ", min_size=0, max_size=120),
    st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=6).filter(
            lambda t: t.strip("") != "" and t != ""
        ),
        min_size=1,
        max_size=6,
        unique=True,
    ),
)
def test_fuzz_phrase_terms_with_spaces(text, terms):
    """Terms containing spaces (phrases) walk the same automaton as
    single words — the space is just another symbol; fuzzed against
    brute force over a space-heavy alphabet."""
    auto = build_automaton(terms)
    assert scan_text(text, auto) == _brute(text, terms)
