"""DoReMi-style excess-loss domain reweighting — rehearsed r12 catalog
candidate `doremi_domain_weights`."""

from __future__ import annotations

import math

import pytest

from logstream_processing_service_spark.operators.curation import (
    doremi_domain_weights,
    doremi_oracle_sql,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_doremi_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        q_doremi_domain_weights,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "doremi_domain_weights", q_doremi_domain_weights,
        doremi_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
    spark.catalog.clearCache()


def test_outlier_domain_upweighted(spark):
    """A domain whose vocabulary diverges from the mixture must get a
    LARGER weight than two near-identical mainstream domains — the
    DoReMi direction (worst-case domain up), with weights summing to 1
    and excess_kl >= 0 (KL non-negativity)."""
    rows = []
    for i in range(40):
        rows.append((i, "news", "the market rose today on steady trade volume"))
    for i in range(40, 80):
        rows.append((i, "blogs", "the market fell today on steady trade volume"))
    for i in range(80, 100):
        rows.append((i, "code", "def f x return x plus one end def"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in doremi_domain_weights(docs).collect()}
    assert set(out) == {"news", "blogs", "code"}
    for r in out.values():
        assert r["excess_kl"] >= 0.0
    assert out["code"]["excess_kl"] > out["news"]["excess_kl"]
    assert out["code"]["domain_weight"] > out["news"]["domain_weight"]
    assert out["code"]["domain_weight"] > out["blogs"]["domain_weight"]
    assert math.isclose(
        sum(r["domain_weight"] for r in out.values()), 1.0, abs_tol=3e-6
    )
    assert math.isclose(
        sum(r["smoothed_weight"] for r in out.values()), 1.0, abs_tol=3e-6
    )
    # smoothing pulls every weight toward uniform (1/3)
    for r in out.values():
        toward = (r["smoothed_weight"] - r["domain_weight"]) * (
            1.0 / 3.0 - r["domain_weight"]
        )
        assert toward >= 0
    spark.catalog.clearCache()


def test_excess_is_micro_nat_exact_sum_of_snapped_terms(spark):
    """r11-advice regression (curation.py doremi_domain_weights): the
    excess must be an order-independent INTEGER sum of per-term
    micro-nat snaps, not a 6-dp round of an order-dependent double
    sum. Pins (a) exact agreement with a per-term-snapped Python
    reference on a fixed fixture, and (b) the 1e-6 quantization of the
    output (a rounded double sum would only be quantized by luck).

    The reference snaps each term with Decimal HALF_UP on the exact
    binary double — the same rule Spark's round(col, 0) applies — so
    any return to sum-then-round flips assertion (a)."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    rows = []
    texts = {
        "news": "the market rose today on steady trade volume",
        "blogs": "the market fell today on steady trade volume",
        "code": "def f x return x plus one end def",
    }
    for i in range(40):
        rows.append((i, "news", texts["news"]))
    for i in range(40, 80):
        rows.append((i, "blogs", texts["blogs"]))
    for i in range(80, 100):
        rows.append((i, "code", texts["code"]))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in doremi_domain_weights(docs).collect()}

    # Python reference with identical per-term micro-nat snapping.
    dom_counts: dict[str, Counter] = {}
    for _, src, text in rows:
        dom_counts.setdefault(src, Counter()).update(text.split())
    corpus: Counter = Counter()
    for c in dom_counts.values():
        corpus.update(c)
    big_n = sum(corpus.values())
    for src, cnts in dom_counts.items():
        n = sum(cnts.values())
        micro = 0
        for tok, c in cnts.items():
            term = c / n * math.log((c * big_n) / (n * corpus[tok]))
            micro += int(
                Decimal(term * 1e6).quantize(Decimal(1), ROUND_HALF_UP)
            )
        expected = micro / 1e6
        got = out[src]["excess_kl"]
        assert got == expected, (src, got, expected)
        # (b) quantization pin: the output is an exact-integer ratio.
        assert abs(got * 1e6 - round(got * 1e6)) < 1e-3, (src, got)
    spark.catalog.clearCache()


def test_uniform_corpus_gives_uniform_weights(spark):
    """Identical domains -> zero excess everywhere -> exactly uniform
    weights (the fixed point)."""
    rows = [(i, f"s{i % 4}", "alpha beta gamma delta") for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = doremi_domain_weights(docs).collect()
    for r in out:
        assert r["excess_kl"] == 0.0
        assert r["domain_weight"] == 0.25
        assert r["smoothed_weight"] == 0.25
    spark.catalog.clearCache()
