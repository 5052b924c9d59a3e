"""Shared prefix/suffix ladder profile — rehearsed r12 catalog
candidate `shared_affix_profile`."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from logstream_processing_service_spark.operators.dedup import (
    shared_affix_profile,
    shared_affix_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_affix_profile_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_text import (
        q_shared_affix_profile,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "shared_affix_profile", q_shared_affix_profile,
        shared_affix_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_header_footer(spark):
    """Three docs share a 16-char header (a, b, c); two of them share a
    32-char-plus footer (a, b); d is unrelated and short. The profile
    must report rung 16 with 2 sharers on the prefix side for a/b/c,
    rung 32 with 1 sharer on the suffix side for a/b, and zeros for d
    (too short for every rung above 4)."""
    header = "LICENSE-HDR-2024 "          # chars 1..16 identical
    footer = " END-OF-FILE-FOOTER-COMMON-BLOCK!"  # > 32 chars
    rows = [
        (1, header + "alpha body text one two three four five six" + footer),
        (2, header + "beta body words entirely different here now" + footer),
        (3, header + "gamma third doc shares only the header part."),
        (4, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in shared_affix_profile(docs).collect()}
    assert len(out) == 4
    for d in (1, 2, 3):
        assert out[d]["max_prefix_len"] == 16
    assert out[1]["n_prefix_sharers"] == 2
    assert out[1]["max_suffix_len"] == 32
    assert out[1]["n_suffix_sharers"] == 1
    assert out[2]["max_suffix_len"] == 32
    assert out[3]["max_suffix_len"] == 0
    assert out[4]["max_prefix_len"] == 0  # len 4 >= rung 4 but unique
    assert out[4]["n_prefix_sharers"] == 0
    assert out[4]["max_suffix_len"] == 0


def test_short_docs_cannot_share_long_rungs(spark):
    """Two identical 10-char docs share rungs 4 and 8 but are too short
    for 16/32/64 — the profile must cap at 8, not treat the whole text
    as a longer affix."""
    rows = [(1, "same-text!"), (2, "same-text!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in shared_affix_profile(docs).collect()}
    for d in (1, 2):
        assert out[d]["max_prefix_len"] == 8
        assert out[d]["n_prefix_sharers"] == 1
        assert out[d]["max_suffix_len"] == 8
