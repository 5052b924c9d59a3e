"""Native exact t-SNE: separation, convergence, determinism, guard."""

from __future__ import annotations

import numpy as np
import pytest

from logstream_processing_service_spark.ml import tsne as TS


def _three_blobs(seed=9, n=40, d=10):
    rng = np.random.default_rng(seed)
    out, labels = [], []
    for i, c in enumerate((0.0, 6.0, -6.0)):
        out.append(rng.normal(0, 0.3, size=(n, d)) + c)
        labels += [i] * n
    return np.vstack(out), np.asarray(labels)


def test_blobs_separate_in_2d():
    X, labels = _three_blobs()
    Y = TS.tsne_exact(X, perplexity=15.0, n_iter=400)
    # intra-cluster spread ≪ inter-cluster separation in the projection
    centers = np.stack([Y[labels == i].mean(axis=0) for i in range(3)])
    intra = max(
        float(np.linalg.norm(Y[labels == i] - centers[i], axis=1).mean())
        for i in range(3)
    )
    inter = min(
        float(np.linalg.norm(centers[a] - centers[b]))
        for a in range(3)
        for b in range(a + 1, 3)
    )
    assert inter > 3.0 * intra, (inter, intra)


def test_objective_decreases():
    X, _ = _three_blobs(n=30)
    y0 = TS._pca_init(X, seed=42)
    kl_init = TS.kl_divergence(X, y0, perplexity=15.0)
    Y = TS.tsne_exact(X, perplexity=15.0, n_iter=400)
    kl_final = TS.kl_divergence(X, Y, perplexity=15.0)
    assert kl_final < kl_init


def test_deterministic_and_guarded():
    X, _ = _three_blobs(n=20)
    a = TS.tsne_exact(X, n_iter=120)
    b = TS.tsne_exact(X, n_iter=120)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="bounded"):
        TS.tsne_exact(np.zeros((6000, 3)))


def test_perplexity_calibration_hits_target_entropy():
    X, _ = _three_blobs(n=25)
    D = TS._pairwise_sq_dists(X)
    perp = 10.0
    P = TS._calibrate_p(D, perp)
    # every row's conditional distribution has entropy ≈ log(perplexity)
    for i in range(len(P)):
        p = P[i][P[i] > 0]
        h = float(-(p * np.log(p)).sum())
        assert abs(h - np.log(perp)) < 1e-3


def test_driver_projection_path(spark):
    from logstream_processing_service_spark.ml.visualize import tsne_projection

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(_three_blobs(n=15)[0])]
    df = spark.createDataFrame(rows, "id bigint, embedding array<double>")
    Y = tsne_projection(df, sample=100)
    assert Y.shape == (45, 2)
