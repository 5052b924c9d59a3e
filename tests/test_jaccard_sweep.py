"""Pair-similarity decile histogram (dedup-threshold picking audit) —
rehearsed r11 catalog candidate `jaccard_threshold_sweep`."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    jaccard_threshold_sweep,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_jaccard_sweep_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_text import (
        _jaccard_sweep_oracle,
        q_jaccard_threshold_sweep,
    )

    from logstream_processing_service_spark.operators.dedup import (
        ADAPTIVE_SWEEP_TARGET,
    )

    con = duckdb_conn(sf_dir)
    # The catalog entry is the N-ADAPTIVE sampled form (r11 verdict:
    # the fixed 0.3 fraction measured alpha_100x 1.6); the oracle must
    # derive the identical threshold from its own count(*).
    r = compare_one(
        spark, con, "jaccard_threshold_sweep", q_jaccard_threshold_sweep,
        _jaccard_sweep_oracle(adaptive_target=ADAPTIVE_SWEEP_TARGET), sf_dir,
    )
    assert r["status"] == "OK", r


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_exact_sweep_hash_matches_oracle(spark, sf_dir):
    """The exact all-pairs form (operator default, small-corpus
    diagnostic) still hash-matches its exact oracle."""
    from logstream_processing_service_spark.queries_text import (
        _jaccard_sweep_oracle,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "jaccard_threshold_sweep_exact",
        lambda s, sf: jaccard_threshold_sweep(load_table(s, sf, "documents")),
        _jaccard_sweep_oracle(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_bimodal_histogram(spark):
    """A verbatim duplicate pair (jaccard 1.0 → decile-9 band via the
    floor clamp) plus a pair sharing exactly one 3-gram out of many
    (low band): the histogram is bimodal and cum_pairs_ge counts down
    correctly (top band 1 pair, bottom band all pairs)."""
    body = " ".join(f"w{i}" for i in range(20))
    low_a = "shared one two " + " ".join(f"a{i}" for i in range(15))
    low_b = "shared one two " + " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, low_a), (4, low_b)],
        "doc_id long, text string",
    )
    rows = {r["band_lo"]: r for r in jaccard_threshold_sweep(docs).collect()}
    assert rows[0.9]["n_pairs"] == 1          # the verbatim pair
    assert rows[0.9]["cum_pairs_ge"] == 1
    low = min(rows)                            # the one-shingle pair
    assert low < 0.2
    assert rows[low]["n_pairs"] == 1
    assert rows[low]["cum_pairs_ge"] == 2      # both pairs at-or-above


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_sampled_sweep_hash_matches_oracle(sf_dir, spark):
    """The scale path: a deterministic keyed-hash 50% doc sample on
    BOTH engines — the sampled histogram hash-matches (same hash48
    predicate), proving the knob is oracle-portable, not Spark-only."""
    from logstream_processing_service_spark.queries_text import (
        _jaccard_sweep_oracle,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "jaccard_threshold_sweep_sampled",
        lambda s, sf: jaccard_threshold_sweep(
            load_table(s, sf, "documents"), sample_fraction=0.5
        ),
        _jaccard_sweep_oracle(sample_fraction=0.5),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_sample_fraction_validation(spark):
    import pyspark.sql.functions as F  # noqa: F401

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sample_fraction"):
        jaccard_threshold_sweep(docs, sample_fraction=0.0)
    with pytest.raises(ValueError, match="sample_fraction"):
        jaccard_threshold_sweep(docs, sample_fraction=1.5)


def test_sample_threshold_rounds_not_truncates():
    """r10-advice regression: int(0.3 * 10000) truncates to 2999 —
    systematically under-sampling any fraction whose ·10000 is not
    exactly representable. The shared helper (used by BOTH the operator
    and the oracle builder) must round."""
    from logstream_processing_service_spark.operators.dedup import (
        sample_threshold,
    )

    assert sample_threshold(0.3) == 3000
    assert sample_threshold(0.29) == 2900
    assert sample_threshold(0.1) == 1000
    assert sample_threshold(1.0) == 10000
    with pytest.raises(ValueError, match="sample_fraction"):
        sample_threshold(0.0)
    with pytest.raises(ValueError, match="sample_fraction"):
        sample_threshold(1.5)


def test_operator_and_oracle_share_threshold_helper(spark):
    """The oracle builder must embed the SAME per-10000 threshold the
    operator filters with — probe a fraction where round != int."""
    from logstream_processing_service_spark.queries_text import (
        _jaccard_sweep_oracle,
    )

    assert "% 10000 < 3000" in _jaccard_sweep_oracle(sample_fraction=0.3)


def test_adaptive_threshold_fragment_agrees_across_engines(spark):
    """r11-verdict fix pin: the N-adaptive per-10000 threshold
    (least(10000, round(1e4·sqrt(target/N)))) must evaluate to the
    IDENTICAL integer on Spark and DuckDB for corpus sizes across the
    decades (the all-DOUBLE shared fragment — no decimal-division
    scale rules, no engine-local rounding mode). 5000 docs (the sf0.1
    bench point) must land at exactly the r11-registered 3000, and any
    N <= target clamps to the full sweep."""
    import duckdb

    from logstream_processing_service_spark.operators.dedup import (
        ADAPTIVE_SWEEP_TARGET,
        adaptive_sweep_threshold_sql,
    )

    con = duckdb.connect()
    expected = {450: 10000, 500: 9487, 5000: 3000}
    for n in (1, 100, 449, 450, 451, 500, 5000, 50000, 500000, 5000000):
        frag = adaptive_sweep_threshold_sql(str(n), ADAPTIVE_SWEEP_TARGET)
        s = spark.sql(f"SELECT {frag} AS t").collect()[0]["t"]
        d = con.execute(f"SELECT {frag} AS t").fetchone()[0]
        assert s == d, (n, s, d)
        if n <= ADAPTIVE_SWEEP_TARGET:
            assert s == 10000, (n, s)
        if n in expected:
            assert s == expected[n], (n, s)
    con.close()


def test_adaptive_clamps_to_exact_sweep_on_small_corpus(spark):
    """N <= target ⇒ threshold 10000 ⇒ every doc sampled: the adaptive
    form must reproduce the EXACT sweep bit-for-bit on a small corpus
    (the audit loses nothing where exactness is affordable)."""
    body = " ".join(f"w{i}" for i in range(20))
    low_a = "shared one two " + " ".join(f"a{i}" for i in range(15))
    low_b = "shared one two " + " ".join(f"b{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, low_a), (4, low_b)],
        "doc_id long, text string",
    )
    exact = jaccard_threshold_sweep(docs).collect()
    adaptive = jaccard_threshold_sweep(docs, adaptive_target=450).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in adaptive]


def test_adaptive_and_fixed_are_mutually_exclusive(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="not both"):
        jaccard_threshold_sweep(
            docs, sample_fraction=0.3, adaptive_target=450
        )
