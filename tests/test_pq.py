"""Product-quantization ANN: determinism and recall vs exact L2."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logstream_processing_service_spark.operators import similarity as S
from logstream_processing_service_spark.sources.tables import load_table


def _exact_l2_topk(X, ids, qid, k):
    q = X[ids.index(qid)]
    d2 = ((X - q) ** 2).sum(1)
    order = sorted(range(len(ids)), key=lambda i: (d2[i], ids[i]))
    return [ids[i] for i in order if ids[i] != qid][:k]


def test_ann_pq_recall_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out1 = S.ann_pq(emb, queries, k=5)
    rows1 = sorted(map(tuple, out1.collect()))
    rows2 = sorted(map(tuple, S.ann_pq(emb, queries, k=5).collect()))
    assert rows1 == rows2, "PQ pipeline must be deterministic"

    data = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in data]
    X = np.asarray([r["embedding"] for r in data], dtype=np.float64)
    got = {}
    for q_id, rank, vec_id, _ in rows1:
        got.setdefault(q_id, set()).add(vec_id)
    hits = total = 0
    for q_id in got:
        exact = set(_exact_l2_topk(X, ids, q_id, 5))
        hits += len(exact & got[q_id])
        total += 5
    recall = hits / total
    # 16x256 codebooks on 64-dim vectors (~0.68 measured); the exact
    # value is pinned loosely so codebook-training tweaks don't flake
    assert recall >= 0.5, f"PQ recall@5 too low: {recall}"


def test_ann_ivf_pq_probe_and_quantization(spark, sf_dir):
    """IVF+PQ: deterministic, and PQ-on-residuals quantization within the
    probed buckets matches flat PQ quality. Global recall is bounded by the
    probe on this weakly-clustered synthetic corpus (~0.36 at nprobe=2/5),
    so the assertion targets the probe-restricted exact-L2 oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out1 = S.ann_ivf_pq(emb, queries, k=5, nprobe=2)
    rows1 = sorted(map(tuple, out1.collect()))
    rows2 = sorted(map(tuple, S.ann_ivf_pq(emb, queries, k=5, nprobe=2).collect()))
    assert rows1 == rows2, "IVF+PQ pipeline must be deterministic"

    data = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in data]
    X = np.asarray([r["embedding"] for r in data], dtype=np.float64)
    crows = sorted(S.label_centroids(emb).collect(), key=lambda r: r["label"])
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    bucket = S._sq_dists(X, C).argmin(1)
    qidx = {ids[i]: i for i in range(len(ids))}
    got = {}
    for q_id, rank, vec_id, _ in rows1:
        got.setdefault(q_id, set()).add(vec_id)
    assert len(got) == 10, "every query must produce results"
    hits = total = 0
    for q_id in got:
        qi = qidx[q_id]
        qd = S._sq_dists(X[qi][None, :], C)[0]
        probed = set(np.argsort(qd, kind="stable")[:2])
        cand = [i for i in range(len(ids)) if bucket[i] in probed and ids[i] != q_id]
        d2 = ((X[cand] - X[qi]) ** 2).sum(1)
        order = sorted(range(len(cand)), key=lambda j: (d2[j], ids[cand[j]]))
        exact = {ids[cand[j]] for j in order[:5]}
        hits += len(exact & got[q_id])
        total += 5
    recall = hits / total
    # ~0.68 measured (same as flat PQ on raw vectors); pinned loosely
    assert recall >= 0.55, f"IVF+PQ probe-restricted recall@5 too low: {recall}"


def test_pq_query_cap_guards(spark, sf_dir):
    """The O(|Q|·m·k) LUT closure bound must fail loudly, not OOM."""
    import pytest

    from logstream_processing_service_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(3)
    with pytest.raises(ValueError, match="max_queries"):
        S.ann_pq(emb, q, k=2, max_queries=2)
    with pytest.raises(ValueError, match="max_queries"):
        S.ann_ivf_pq(emb, q, k=2, max_queries=2)


def test_ivfpq_materialized_index_matches_inmemory(spark, sf_dir, tmp_path):
    """The materialized codes index must (a) partition-prune unprobed
    buckets and (b) return exactly the in-memory ann_ivf_pq results
    (same centroids, same deterministic codebook training)."""
    from logstream_processing_service_spark.operators.similarity import (
        ann_ivf_pq,
        build_ivfpq_index,
        label_centroids,
        search_ivfpq_index,
    )
    from logstream_processing_service_spark.plans import partition_filters

    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb)
    queries = emb.filter(F.col("vec_id") < 6)
    path = str(tmp_path / "ivfpq")
    books = build_ivfpq_index(emb, cents, path, m=8, n_centroids=16)
    got = search_ivfpq_index(
        spark, path, cents, books, queries, k=3, nprobe=2
    )
    assert "bucket" in partition_filters(got)
    want = ann_ivf_pq(
        emb, queries, k=3, m=8, n_centroids=16, nprobe=2, coarse=cents
    )
    got_m = {(r["q_id"], r["rank"]): r["vec_id"] for r in got.collect()}
    want_m = {(r["q_id"], r["rank"]): r["vec_id"] for r in want.collect()}
    assert got_m == want_m
    # codes table is skinny: no embedding column in the index schema
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"vec_id", "codes", "bucket"}
