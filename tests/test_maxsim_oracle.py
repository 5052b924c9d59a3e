"""Cross-engine parity rehearsal for ColBERT-style maxsim retrieval —
an r7 catalog candidate (operators/retrieval.py maxsim_topk).

The risky surface is float determinism: per-token hash embeddings are
normalized with /sqrt(Σ r²) and the per-doc score sums per-query-token
maxima. The operator floors each max into 1e-12 integer units before the
sum (associative BIGINT adds), so this rehearsal must hash-match through
the driver's own harness at BOTH test SFs. Semantic properties (unit
norm ⇒ score ≤ |query tokens|; self-query dominance) are pinned
separately against a numpy recomputation.
"""

from __future__ import annotations

import hashlib
import math

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from logstream_processing_service_spark.operators.retrieval import (
    MAXSIM_DIM,
    maxsim_oracle_sql,
    maxsim_topk,
)

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_maxsim_hash_matches_duckdb_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "maxsim_search",
        lambda s, sf: maxsim_topk(
            s.read.parquet(f"{sf}/documents.parquet")
        ),
        maxsim_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def _np_embed(tok: str) -> list[float]:
    """Pure-float twin of the hash featurizer, replicating the ENGINES'
    left-associative expression order exactly (np.dot/np.sum use pairwise
    summation and drift a ulp — enough to flip a floor at an integer
    boundary, e.g. the self-match dot of exactly 1.0). hash48 = first 12
    nibbles of the md5 hex digest, big-endian (functions/text.py)."""
    raw = []
    for j in range(MAXSIM_DIM):
        hx = hashlib.md5(f"embv1:{tok}:{j}".encode()).hexdigest()
        raw.append(int(hx[:12], 16) / 140737488355328.0 - 1.0)
    sq = raw[0] * raw[0]
    for j in range(1, MAXSIM_DIM):
        sq = sq + raw[j] * raw[j]
    den = math.sqrt(sq)
    if den == 0.0:
        den = 1.0
    return [r / den for r in raw]


def _dot(a: list[float], b: list[float]) -> float:
    s = a[0] * b[0]
    for j in range(1, MAXSIM_DIM):
        s = s + a[j] * b[j]
    return s


def test_maxsim_matches_numpy_recompute(spark):
    """End-to-end score check vs a straight numpy maxsim over the same
    distinct-token sets, on a tiny literal corpus."""
    docs = spark.createDataFrame(
        [
            (0, "fast table scan fast"),
            (1, "window agg join table"),
            (2, "stream batch merge"),
        ],
        "doc_id long, text string",
    )
    queries = ("fast table", "merge stream")
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in maxsim_topk(docs, queries=queries, k=10).collect()
    }
    texts = {0: "fast table scan fast", 1: "window agg join table", 2: "stream batch merge"}
    for qid, qtext in enumerate(queries):
        want = []
        qtoks = sorted(set(qtext.split()))
        for did, t in texts.items():
            dvecs = [_np_embed(tok) for tok in sorted(set(t.split()))]
            units = 0
            for qt in qtoks:
                qv = _np_embed(qt)
                m = max(_dot(qv, dv) for dv in dvecs)
                units += math.floor(m * 1e12)
            want.append((did, units))
        want.sort(key=lambda p: (-p[1], p[0]))
        for rank, (did, units) in enumerate(want, start=1):
            grank, gscore = got[(qid, did)]
            assert grank == rank, (qid, did)
            assert gscore == pytest.approx(units / 1e12, abs=1e-12)


def test_maxsim_score_bounded_by_query_len(spark):
    """Unit-norm embeddings ⇒ every max-dot ≤ 1 ⇒ score ≤ |qtokens|."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for r in maxsim_topk(docs, queries=("fast table scan",), k=5).collect():
        assert r["score"] <= 3.0 + 1e-9
        assert r["score"] >= -3.0 - 1e-9


def test_maxsim_self_query_is_perfect(spark):
    """A query that IS a doc's token set scores |qtokens| on that doc
    (every max hits the identical unit vector, dot == 1)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    rows = maxsim_topk(docs, queries=("alpha beta gamma",), k=2).collect()
    top = rows[0]
    assert top["doc_id"] == 0 and top["rank"] == 1
    assert top["score"] == pytest.approx(3.0, abs=1e-9)


def test_routed_full_probe_equals_exact(spark):
    """With n_probe == n_anchors every bucket is probed, so the routed
    operator must reproduce the exact maxsim ranking AND scores
    bit-for-bit (the ann_ivf exactness-degeneration pin at token
    grain)."""
    from logstream_processing_service_spark.operators.retrieval import (
        maxsim_topk_routed,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = [
        tuple(r)
        for r in maxsim_topk(docs, k=10).collect()
    ]
    routed = [
        tuple(r)
        for r in maxsim_topk_routed(
            docs, k=10, n_anchors=16, n_probe=16
        ).collect()
    ]
    assert routed == exact


def test_routed_recall_floor(spark):
    """Partial probing (8 of 32 buckets) must keep ≥ 0.5 top-10 recall
    vs the exact ranking on the real corpus — the accuracy/cost dial
    documented for the PLAID shape."""
    from logstream_processing_service_spark.operators.retrieval import (
        maxsim_topk_routed,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {}
    for r in maxsim_topk(docs, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["doc_id"])
    routed = {}
    for r in maxsim_topk_routed(docs, k=10, n_anchors=32, n_probe=8).collect():
        routed.setdefault(r["query_id"], set()).add(r["doc_id"])
    recalls = [
        len(exact[q] & routed.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_fuzz_maxsim_vs_python_recompute(spark):
    """Random small corpora and queries: ranking and scores must match
    the pure-float recomputation (generalizes the fixed-corpus test —
    catches any corpus-shape dependence in the distinct/join/floor
    pipeline)."""
    import math
    import random

    vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op"]
    for seed in range(4):
        rng = random.Random(70 + seed)
        texts = {
            did: " ".join(rng.choices(vocab, k=rng.randint(1, 6)))
            for did in range(5)
        }
        queries = tuple(
            " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
            for _ in range(2)
        )
        docs = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            (r["query_id"], r["doc_id"]): r["rank"]
            for r in maxsim_topk(docs, queries=queries, k=10).collect()
        }
        for qid, qtext in enumerate(queries):
            want = []
            for did, t in texts.items():
                dvecs = [_np_embed(tok) for tok in sorted(set(t.split()))]
                units = sum(
                    math.floor(
                        max(_dot(_np_embed(qt), dv) for dv in dvecs) * 1e12
                    )
                    for qt in sorted(set(qtext.split()))
                )
                want.append((did, units))
            want.sort(key=lambda p: (-p[1], p[0]))
            for rank, (did, _) in enumerate(want, start=1):
                assert got[(qid, did)] == rank, (seed, qid, did)
