"""Exact capped-LCP neighbor profile — rehearsed r12 catalog candidate
`lcp_neighbor_profile`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    lcp_neighbor_profile,
    lcp_neighbor_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_lcp_neighbor_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_text import (
        q_lcp_neighbor_profile,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "lcp_neighbor_profile", q_lcp_neighbor_profile,
        lcp_neighbor_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_exact_lcp_values_vs_brute_force(spark):
    """Planted corpus where the true max-LCP of every doc is known by
    construction AND verified against an all-pairs brute force —
    including the sorted-neighbor subtlety that the best partner is NOT
    always adjacent in doc_id order, ties on the key, and the no-shared
    -first-char zero."""
    rows = [
        (1, "abcdef one shared header"),
        (2, "abcdXYZ different tail"),          # lcp with 1 = 4
        (3, "abc totally else"),                # lcp with 1/2 = 3(pre "abc")
        (4, "zzz unique start"),
        (5, "qq"),
        (6, "qq"),                              # identical short docs: lcp 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["max_lcp"] for r in lcp_neighbor_profile(docs).collect()}

    # brute force ground truth (capped at 64)
    def lcp(a, b):
        n = 0
        for x, y in zip(a[:64], b[:64]):
            if x != y:
                break
            n += 1
        return n

    texts = dict(rows)
    for d, t in texts.items():
        want = max(
            (lcp(t, u) for e, u in texts.items() if e != d), default=0
        )
        assert out[d] == want, (d, out[d], want)
    assert out[4] == 0
    assert out[5] == 2 and out[6] == 2


def test_cap_bounds_long_common_prefixes(spark):
    """Two docs sharing a 100-char prefix report exactly cap (64)."""
    shared = "x" * 100
    rows = [(1, shared + "tail-a"), (2, shared + "tail-b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["max_lcp"] for r in lcp_neighbor_profile(docs).collect()}
    assert out[1] == 64 and out[2] == 64
