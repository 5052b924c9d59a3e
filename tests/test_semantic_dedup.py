"""SemDeDup: determinism + an exact numpy replica of the full pipeline
(centroid training, assignment, priority order, one-pass drop rule)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from logstream_processing_service_spark.operators import similarity as S
from logstream_processing_service_spark.sources.tables import load_table

N_CLUSTERS = 16
THRESHOLD = 0.4


def _replica(X, ids, sample_n=2048):
    # mirror the operator's portable-md5 deterministic sample (r7
    # VERDICT #4): order by md5('semdedup-centroids-v1:' || vec_id)
    # hex, tie-break vec_id, take sample_n
    import hashlib

    def bucket(v):
        return hashlib.md5(
            f"semdedup-centroids-v1:{int(v)}".encode()
        ).hexdigest()

    order = sorted(range(len(ids)), key=lambda i: (bucket(ids[i]), ids[i]))
    Xs = X[order][:sample_n]
    C = S._train_pq_numpy(Xs, 1, N_CLUSTERS)[0]
    d2 = S._sq_dists(X, C)
    cl = d2.argmin(1)
    cdist = np.sqrt(d2[np.arange(len(cl)), cl])
    nrm = np.sqrt((X**2).sum(1))
    keep = {}
    for c in set(cl.tolist()):
        mem = [i for i in range(len(ids)) if cl[i] == c]
        # priority: centroid_dist DESC, vec_id ASC
        mem.sort(key=lambda i: (-cdist[i], ids[i]))
        for pos, i in enumerate(mem):
            dropped = False
            for j in mem[:pos]:
                cos = round(float(X[i] @ X[j] / (nrm[i] * nrm[j])), 6)
                if cos >= THRESHOLD:
                    dropped = True
                    break
            keep[ids[i]] = not dropped
    return cl, keep


def test_semantic_dedup_planted_duplicates(spark):
    """Hand-computable fixture: 4 well-separated direction groups, each
    with one exact duplicate pair planted (cos=1 within the pair, ≈0
    across groups, threshold 0.9). Exactly one member of each pair must
    be dropped, every singleton kept — the expected drop SET is knowable
    without running any part of the pipeline."""
    import itertools

    rows = []
    vid = 0
    for axis in range(4):
        base = [0.0] * 8
        base[axis] = 1.0
        # two exact duplicates along the axis + one near-orthogonal single
        rows.append((vid, [v * 2.0 for v in base])); vid += 1
        rows.append((vid, [v * 3.0 for v in base])); vid += 1  # same direction
        single = [0.05] * 8
        single[axis + 4] = 1.0
        rows.append((vid, single)); vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.semantic_dedup(emb, n_clusters=4, threshold=0.9, sample_n=12)
    got = {r["vec_id"]: r["keep"] for r in out.collect()}
    assert len(got) == 12
    # each planted pair (3k, 3k+1) loses exactly one member
    for k in range(4):
        a, b = got[3 * k], got[3 * k + 1]
        assert a != b, f"pair {3*k},{3*k+1}: exactly one must drop, got {a},{b}"
        assert got[3 * k + 2], f"singleton {3*k+2} must be kept"
    assert sum(1 for v in got.values() if not v) == 4


def test_semantic_dedup_matches_numpy_replica(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(emb, n_clusters=N_CLUSTERS, threshold=THRESHOLD)
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(
        map(
            tuple,
            S.semantic_dedup(emb, n_clusters=N_CLUSTERS, threshold=THRESHOLD).collect(),
        )
    )
    assert rows1 == rows2, "semantic_dedup must be deterministic"

    data = emb.select("vec_id", "embedding").collect()
    ids = np.asarray([r["vec_id"] for r in data])
    X = np.asarray([r["embedding"] for r in data], dtype=np.float64)
    cl, keep = _replica(X, ids)
    by_id = {int(ids[i]): i for i in range(len(ids))}
    assert len(rows1) == len(ids)
    n_dropped = 0
    for vec_id, cluster, centroid_dist, k in rows1:
        i = by_id[vec_id]
        assert cluster == cl[i], f"cluster mismatch for {vec_id}"
        assert k == keep[vec_id], f"keep mismatch for {vec_id}"
        n_dropped += 0 if k else 1
    assert n_dropped > 0, "fixture must exercise the drop path"
