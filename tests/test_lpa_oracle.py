"""Deterministic label propagation (graph.label_propagation /
textanalysis.token_communities) — r7 catalog candidate
`token_communities`.

The DuckDB twin unrolls the synchronous iterations into chained CTEs
(the pagerank/textrank pattern); every quantity is an exact BIGINT
weight mass and the argmax tie order is total (mass desc, label asc),
so the driver-harness hash must match exactly. A planted two-cluster
graph pins the semantic difference from connected components: a weak
bridge must NOT fuse the communities.
"""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.textanalysis import (
    token_communities_oracle_sql,  # hoisted for the r7 catalog slot
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn

@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_token_communities_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.textanalysis import (
        token_communities,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "token_communities",
        lambda s, sf: token_communities(load_table(s, sf, "documents")),
        token_communities_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_lpa_keeps_weakly_bridged_clusters_apart(spark):
    """Two 3-cliques joined by ONE weight-1 bridge: connected components
    would fuse them; LPA must keep two communities because the bridge
    mass never beats the in-cluster mass."""
    from logstream_processing_service_spark.operators.graph import (
        label_propagation,
    )

    und = [
        ("a1", "a2", 5), ("a1", "a3", 5), ("a2", "a3", 5),
        ("b1", "b2", 5), ("b1", "b3", 5), ("b2", "b3", 5),
        ("a3", "b1", 1),  # the weak bridge
    ]
    edges = spark.createDataFrame(
        [(s, d, w) for s, d, w in und] + [(d, s, w) for s, d, w in und],
        "src string, dst string, w long",
    )
    out = {r["node"]: r["community"] for r in label_propagation(edges).collect()}
    a = {out["a1"], out["a2"], out["a3"]}
    b = {out["b1"], out["b2"], out["b3"]}
    assert len(a) == 1 and len(b) == 1, out
    assert a != b, out


def test_lpa_matches_naive_python(spark):
    """Synchronous-update parity with a literal Python recomputation on
    a small random-ish deterministic graph."""
    und = [
        ("w1", "w2", 3), ("w2", "w3", 2), ("w3", "w4", 4),
        ("w4", "w5", 1), ("w5", "w1", 2), ("w2", "w5", 5),
    ]
    sym = und + [(d, s, w) for s, d, w in und]
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d, w in sym:
        adj[d].append((s, w))
    labels = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for node, ins in adj.items():
            mass = defaultdict(int)
            for src, w in ins:
                mass[labels[src]] += w
            best = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[node] = best
        labels = new

    from logstream_processing_service_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(sym, "src string, dst string, w long")
    got = {r["node"]: r["community"] for r in label_propagation(edges).collect()}
    assert got == labels


# ---------------------------------------------------------------------------
# vocab_divergence (same rehearsal file: both are corpus-structure
# diagnostics over the token stream)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_vocab_divergence_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.textanalysis import (
        vocab_divergence,
        vocab_divergence_oracle_sql,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "vocab_divergence",
        lambda s, sf: vocab_divergence(load_table(s, sf, "documents")),
        vocab_divergence_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_vocab_divergence_properties(spark):
    """JS is symmetric, bounded by ln 2, zero for identical sources;
    KL(p||q) ≥ 0 with equality iff p == q — pinned on planted corpora
    (two identical sources + one shifted)."""
    import math

    from logstream_processing_service_spark.operators.textanalysis import (
        vocab_divergence,
    )

    rows = [
        (0, "alpha beta gamma delta alpha beta", "same1"),
        (1, "alpha beta gamma delta alpha beta", "same2"),
        (2, "omega psi chi phi omega psi", "shifted"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in vocab_divergence(docs).collect()
    }
    same = out[("same1", "same2")]
    assert same["kl_ab"] == 0.0 and same["kl_ba"] == 0.0 and same["js"] == 0.0
    for key in (("same1", "shifted"), ("same2", "shifted")):
        r = out[key]
        assert r["kl_ab"] > 0 and r["kl_ba"] > 0
        assert 0 < r["js"] <= math.log(2) + 1e-9


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_zipf_fit_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.textanalysis import (
        zipf_fit,
        zipf_fit_oracle_sql,
    )
    from logstream_processing_service_spark.sources import load_table

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "zipf_fit",
        lambda s, sf: zipf_fit(load_table(s, sf, "documents")),
        zipf_fit_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_zipf_discriminates_zipfian_from_uniform(spark):
    """A synthetic Zipf corpus (freq ∝ 1/rank) fits slope ≈ −1 with
    high r²; a uniform corpus (all tokens equally frequent) fits slope
    ≈ 0. The one-number language-vs-noise diagnostic, pinned."""
    from logstream_processing_service_spark.operators.textanalysis import (
        zipf_fit,
    )

    zipf_words = []
    for rank in range(1, 101):
        zipf_words.extend([f"w{rank:03d}"] * max(1, 1000 // rank))
    uniform_words = [f"u{r:03d}" for r in range(100)] * 50
    z = spark.createDataFrame(
        [(0, " ".join(zipf_words))], "doc_id long, text string"
    )
    u = spark.createDataFrame(
        [(0, " ".join(uniform_words))], "doc_id long, text string"
    )
    rz = zipf_fit(z, top_n=100).collect()[0]
    ru = zipf_fit(u, top_n=100).collect()[0]
    assert -1.15 <= rz["zipf_slope"] <= -0.85, rz
    assert rz["r2"] > 0.95
    assert abs(ru["zipf_slope"]) < 0.05, ru
