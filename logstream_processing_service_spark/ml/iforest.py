"""Native Isolation Forest (Liu, Ting & Zhou 2008) — no sklearn.

Closes the M9 parity seam without the gated dependency: the reference
scores its per-cluster feature rows with sklearn's IsolationForest
(src/ml/volume_analyzer.py:17-24). This is the same algorithm from the
paper, implemented on numpy: n_trees random isolation trees, each grown
on a ``subsample`` of rows with uniform split features and uniform split
values between the subsample's min/max, depth-capped at ceil(log2(psi));
anomaly score s(x) = 2^(−E[h(x)]/c(psi)) with the standard average-BST
normalizer c(n). Seeded → bit-reproducible.

Scale shape (the PQ-codebook pattern): FIT is driver-side on a bounded
sample — the model is a few KB of arrays and isolation forests are
defined on subsamples anyway (psi=256 in the paper regardless of corpus
size). SCORE is distributed: the tree arrays ride an Arrow-batched
pandas UDF closure and every executor scores its partitions napkin-free
— no shuffle, no driver round-trips, vectorized level-order traversal.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

EULER_GAMMA = 0.5772156649015329


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes."""
    if n <= 1.0:
        return 0.0
    return 2.0 * (math.log(n - 1.0) + EULER_GAMMA) - 2.0 * (n - 1.0) / n


class _Tree:
    """Array-encoded isolation tree: internal nodes split, external nodes
    carry their subsample size (path length continues by c(size))."""

    __slots__ = ("feature", "threshold", "left", "right", "size")

    def __init__(self) -> None:
        self.feature: list[int] = []
        self.threshold: list[float] = []
        self.left: list[int] = []
        self.right: list[int] = []
        self.size: list[int] = []

    def _add(self) -> int:
        self.feature.append(-1)
        self.threshold.append(0.0)
        self.left.append(-1)
        self.right.append(-1)
        self.size.append(0)
        return len(self.feature) - 1

    def build(self, X: np.ndarray, rng: np.random.Generator, depth_cap: int) -> None:
        self._grow(X, rng, 0, depth_cap)
        self.feature = np.asarray(self.feature, dtype=np.int64)  # type: ignore[assignment]
        self.threshold = np.asarray(self.threshold, dtype=np.float64)  # type: ignore[assignment]
        self.left = np.asarray(self.left, dtype=np.int64)  # type: ignore[assignment]
        self.right = np.asarray(self.right, dtype=np.int64)  # type: ignore[assignment]
        self.size = np.asarray(self.size, dtype=np.int64)  # type: ignore[assignment]

    def _grow(self, X: np.ndarray, rng: np.random.Generator, depth: int, cap: int) -> int:
        node = self._add()
        n = len(X)
        if depth >= cap or n <= 1:
            self.size[node] = n
            return node
        spans = X.max(axis=0) - X.min(axis=0)
        usable = np.nonzero(spans > 0)[0]
        if len(usable) == 0:  # all duplicate rows — cannot isolate
            self.size[node] = n
            return node
        f = int(rng.choice(usable))
        lo, hi = float(X[:, f].min()), float(X[:, f].max())
        t = float(rng.uniform(lo, hi))
        mask = X[:, f] < t
        self.feature[node] = f
        self.threshold[node] = t
        self.left[node] = self._grow(X[mask], rng, depth + 1, cap)
        self.right[node] = self._grow(X[~mask], rng, depth + 1, cap)
        return node

    def path_lengths(self, X: np.ndarray) -> np.ndarray:
        """Vectorized: walk all rows down the tree together."""
        out = np.zeros(len(X), dtype=np.float64)
        node = np.zeros(len(X), dtype=np.int64)
        depth = np.zeros(len(X), dtype=np.float64)
        active = np.arange(len(X))
        while len(active):
            cur = node[active]
            internal = self.feature[cur] >= 0
            done = active[~internal]
            if len(done):
                sz = self.size[node[done]].astype(np.float64)
                out[done] = depth[done] + np.array([_c(s) for s in sz])
            act = active[internal]
            if not len(act):
                break
            cur = node[act]
            f = self.feature[cur]
            goes_left = X[act, f] < self.threshold[cur]
            node[act] = np.where(goes_left, self.left[cur], self.right[cur])
            depth[act] += 1.0
            active = act
        return out


def fit_iforest(
    X: np.ndarray, n_trees: int = 100, subsample: int = 256, seed: int = 42
) -> dict:
    """Fit on a numpy matrix (driver-side, bounded). Returns the model
    dict {trees, psi} — a few KB, closure-shippable."""
    X = np.asarray(X, dtype=np.float64)
    psi = min(subsample, len(X))
    cap = max(1, math.ceil(math.log2(max(psi, 2))))
    rng = np.random.default_rng(seed)
    trees = []
    for _ in range(n_trees):
        idx = rng.choice(len(X), size=psi, replace=False)
        t = _Tree()
        t.build(X[idx], rng, cap)
        trees.append(t)
    return {"trees": trees, "psi": psi}


def iforest_scores_np(model: dict, X: np.ndarray) -> np.ndarray:
    """s(x) = 2^(−E[h]/c(psi)) ∈ (0,1); > 0.5 ⇒ shorter-than-average
    isolation paths ⇒ anomalous."""
    X = np.asarray(X, dtype=np.float64)
    h = np.zeros(len(X), dtype=np.float64)
    for t in model["trees"]:
        h += t.path_lengths(X)
    h /= len(model["trees"])
    return np.power(2.0, -h / _c(float(model["psi"])))


def iforest_score_df(features, feature_cols, n_trees=100, subsample=256,
                     seed=42, max_fit_rows=100_000):
    """Spark integration: bounded driver-side fit, distributed Arrow
    scoring. ``max_fit_rows`` is the loud-guard collect bound (the model
    only ever sees ``subsample`` rows per tree regardless)."""
    from pyspark.sql import functions as F

    fit_pdf = (
        features.select(*feature_cols).na.fill(0.0).limit(max_fit_rows).toPandas()
    )
    model = fit_iforest(fit_pdf.to_numpy(), n_trees, subsample, seed)

    @F.pandas_udf("double")
    def score_batch(s: pd.DataFrame) -> pd.Series:
        X = s[list(feature_cols)].to_numpy(dtype=np.float64)
        return pd.Series(iforest_scores_np(model, X))

    filled = features.na.fill(0.0, subset=list(feature_cols))
    return filled.withColumn(
        "iforest_score",
        F.round(score_batch(F.struct(*[F.col(c) for c in feature_cols])), 6),
    )
