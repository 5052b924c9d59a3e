"""Native exact t-SNE (van der Maaten & Hinton 2008) — no sklearn.

Closes the M13 seam the sklearn gate left open: the reference projects a
≤1000-row embedding sample to 2-D for its cluster plot
(scripts/visualise_results.py:49-63, perplexity=30, init='pca',
seed=42). A visualization sample is small by construction, so the EXACT
O(n²) algorithm is the right one — no Barnes-Hut approximation needed at
this size, and the loud ``max_n`` guard keeps it honest.

Implementation is the paper's: perplexity-calibrated conditional
Gaussians (per-point binary search on sigma), symmetrized P with the p/4
early-exaggeration phase, Student-t low-dimensional affinities, gradient
descent with momentum (0.5 → 0.8 at iter 250) and the deterministic PCA
init the reference requests. Seeded → bit-reproducible.
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(X: np.ndarray) -> np.ndarray:
    s = (X * X).sum(axis=1)
    d = s[:, None] + s[None, :] - 2.0 * (X @ X.T)
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def _calibrate_p(D: np.ndarray, perplexity: float, tol: float = 1e-5) -> np.ndarray:
    """Per-row binary search for sigma hitting log(perplexity) entropy."""
    n = len(D)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        beta, lo, hi = 1.0, 0.0, np.inf
        di = np.delete(D[i], i)
        for _ in range(60):
            p = np.exp(-di * beta)
            s = p.sum()
            if s <= 0:
                h = 0.0
                p = np.zeros_like(p)
            else:
                p /= s
                nz = p > 0
                h = float(-(p[nz] * np.log(p[nz])).sum())
            if abs(h - target) < tol:
                break
            if h > target:
                lo = beta
                beta = beta * 2.0 if hi is np.inf or np.isinf(hi) else (beta + hi) / 2.0
            else:
                hi = beta
                beta = (beta + lo) / 2.0
        P[i, np.arange(n) != i] = p
    return P


def _pca_init(X: np.ndarray, seed: int) -> np.ndarray:
    Xc = X - X.mean(axis=0)
    # deterministic eigensolve with sign normalization (largest-|.| coord
    # positive), same convention as operators/similarity.py's PCA
    cov = (Xc.T @ Xc) / max(len(X) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    W = vecs[:, order]
    for j in range(W.shape[1]):
        k = int(np.abs(W[:, j]).argmax())
        if W[k, j] < 0:
            W[:, j] = -W[:, j]
    Y = Xc @ W
    # the reference's sklearn call scales PCA init to 1e-4 std
    Y = Y / max(Y[:, 0].std(), 1e-12) * 1e-4
    return Y.astype(np.float64)


def tsne_exact(
    X: np.ndarray,
    perplexity: float = 30.0,
    n_iter: int = 500,
    seed: int = 42,
    learning_rate: float = 200.0,
    max_n: int = 5000,
) -> np.ndarray:
    """2-D embedding of X (n ≤ max_n — loud guard; this is the exact
    O(n²) form for visualization samples)."""
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n > max_n:
        raise ValueError(
            f"tsne_exact is O(n²) and bounded to {max_n} rows; sample "
            f"before projecting (got {n})"
        )
    if n < 3:
        return np.zeros((n, 2))
    perplexity = min(perplexity, (n - 1) / 3.0)
    D = _pairwise_sq_dists(X)
    P = _calibrate_p(D, perplexity)
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)
    Y = _pca_init(X, seed)
    dY = np.zeros_like(Y)
    exaggeration = 4.0
    momentum = 0.5
    for it in range(n_iter):
        if it == 100:
            exaggeration = 1.0
        if it == 250:
            momentum = 0.8
        num = 1.0 / (1.0 + _pairwise_sq_dists(Y))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (exaggeration * P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(axis=1)) - PQ) @ Y)
        dY = momentum * dY - learning_rate * grad
        Y = Y + dY
        Y = Y - Y.mean(axis=0)
    return Y


def kl_divergence(X: np.ndarray, Y: np.ndarray, perplexity: float = 30.0) -> float:
    """Objective value for convergence assertions in tests."""
    n = len(X)
    P = _calibrate_p(_pairwise_sq_dists(X), min(perplexity, (n - 1) / 3.0))
    P = np.maximum((P + P.T) / (2.0 * n), 1e-12)
    num = 1.0 / (1.0 + _pairwise_sq_dists(Y))
    np.fill_diagonal(num, 0.0)
    Q = np.maximum(num / num.sum(), 1e-12)
    return float((P * np.log(P / Q)).sum())
