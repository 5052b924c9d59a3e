"""DenStream (Cao et al., SDM 2006): density-based streaming clustering
with fading micro-clusters — the reference's actual M7 algorithm
(it drives river.cluster.DenStream inside its training loop,
src/ml/model.py:9-14, scripts/run_training_batch.py). Round-2 shipped a
distributed KMeans refit as the scalable substitute and quantified the
divergence (Rand 0.9726); this module closes the semantic gap with a
faithful implementation: exponential decay 2^(−λΔt), ε-radius merge,
β·μ outlier buffer with promotion, periodic pruning, and a DBSCAN-style
offline pass over the potential micro-clusters.

Scale design: a DenStream instance is SEQUENTIAL by definition (each
point updates shared micro-cluster state), so the distributed form
partitions the stream BY KEY and runs one instance per key inside an
Arrow batch (`denstream_assign`, applyInPandas) — per-key state is
O(#micro-clusters), never O(#points). The streaming twin packs the
micro-cluster list into applyInPandasWithState JSON state and carries
it across micro-batches; batch-replay vs micro-batch-replay parity is
asserted in tests/test_denstream.py. The KMeans refit remains the right
choice when one global clustering over billions of points is wanted —
these are complementary, and both are now available.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd

# reference hyper-parameters (src/ml/model.py:12): decaying_factor λ,
# core-weight μ, outlier fraction β, radius ε
LAMBDA = 0.0005
MU = 2.5
BETA = 0.6
EPS = 0.35


class MicroCluster:
    __slots__ = ("w", "ls", "ss", "t0", "last")

    def __init__(self, x: np.ndarray, t: float):
        self.w = 1.0
        self.ls = x.copy()
        self.ss = x * x
        self.t0 = t
        self.last = t

    def fade(self, t: float, lam: float) -> None:
        if t > self.last:
            f = 2.0 ** (-lam * (t - self.last))
            self.w *= f
            self.ls = self.ls * f
            self.ss = self.ss * f
            self.last = t

    def center(self) -> np.ndarray:
        return self.ls / self.w

    def radius(self) -> float:
        c = self.ss / self.w - (self.ls / self.w) ** 2
        return float(math.sqrt(max(float(c.sum()), 0.0)))

    def radius_if_added(self, x: np.ndarray) -> float:
        w = self.w + 1.0
        ls = self.ls + x
        ss = self.ss + x * x
        c = ss / w - (ls / w) ** 2
        return float(math.sqrt(max(float(c.sum()), 0.0)))

    def add(self, x: np.ndarray) -> None:
        self.w += 1.0
        self.ls = self.ls + x
        self.ss = self.ss + x * x


class DenStream:
    def __init__(self, lam=LAMBDA, mu=MU, beta=BETA, eps=EPS):
        self.lam, self.mu, self.beta, self.eps = lam, mu, beta, eps
        self.p: list[MicroCluster] = []
        self.o: list[MicroCluster] = []
        # prune period T_p from the paper: ceil((1/λ)·log(βμ/(βμ−1)))
        bm = beta * mu
        self.t_p = (
            math.ceil((1.0 / lam) * math.log(bm / (bm - 1.0), 2))
            if bm > 1.0
            else 1000.0
        )
        self._last_prune = 0.0

    def _nearest(self, mcs: list[MicroCluster], x: np.ndarray) -> int:
        if not mcs:
            return -1
        d = [float(np.linalg.norm(m.center() - x)) for m in mcs]
        return int(np.argmin(d))

    def learn(self, x: np.ndarray, t: float) -> str:
        """Process one point; returns 'core'|'outlier' placement."""
        for m in self.p:
            m.fade(t, self.lam)
        for m in self.o:
            m.fade(t, self.lam)
        i = self._nearest(self.p, x)
        if i >= 0 and self.p[i].radius_if_added(x) <= self.eps:
            self.p[i].add(x)
            placed = "core"
        else:
            j = self._nearest(self.o, x)
            if j >= 0 and self.o[j].radius_if_added(x) <= self.eps:
                self.o[j].add(x)
                if self.o[j].w > self.beta * self.mu:  # promotion
                    self.p.append(self.o.pop(j))
                    placed = "core"
                else:
                    placed = "outlier"
            else:
                self.o.append(MicroCluster(x, t))
                placed = "outlier"
        if t - self._last_prune >= self.t_p:
            self.prune(t)
            self._last_prune = t
        return placed

    def prune(self, t: float) -> None:
        self.p = [m for m in self.p if m.w >= self.beta * self.mu]
        keep = []
        for m in self.o:
            horizon = t - m.t0 + self.t_p
            xi = (2.0 ** (-self.lam * horizon) - 1.0) / (
                2.0 ** (-self.lam * self.t_p) - 1.0
            )
            if m.w >= xi:
                keep.append(m)
        self.o = keep

    def offline_clusters(self) -> list[int]:
        """DBSCAN-style offline pass: connect p-micro-clusters whose
        centers lie within 2ε; returns a cluster label per p-cluster."""
        n = len(self.p)
        label = list(range(n))

        def find(a):
            while label[a] != a:
                label[a] = label[label[a]]
                a = label[a]
            return a

        for a in range(n):
            for b in range(a + 1, n):
                if (
                    float(np.linalg.norm(self.p[a].center() - self.p[b].center()))
                    <= 2.0 * self.eps
                ):
                    label[find(a)] = find(b)
        roots = sorted({find(a) for a in range(n)})
        remap = {r: i for i, r in enumerate(roots)}
        return [remap[find(a)] for a in range(n)]

    # ---- state (de)serialization for the streaming twin ----
    def to_json(self) -> str:
        def enc(mcs):
            return [
                {
                    "w": m.w,
                    "ls": m.ls.tolist(),
                    "ss": m.ss.tolist(),
                    "t0": m.t0,
                    "last": m.last,
                }
                for m in mcs
            ]

        return json.dumps(
            {"p": enc(self.p), "o": enc(self.o), "lp": self._last_prune}
        )

    @classmethod
    def from_json(cls, s: str, **kw) -> "DenStream":
        obj = json.loads(s)
        ds = cls(**kw)

        def dec(items):
            out = []
            for d in items:
                m = MicroCluster(np.asarray(d["ls"], dtype=float), d["t0"])
                m.w = d["w"]
                m.ls = np.asarray(d["ls"], dtype=float)
                m.ss = np.asarray(d["ss"], dtype=float)
                m.last = d["last"]
                out.append(m)
            return out

        ds.p = dec(obj["p"])
        ds.o = dec(obj["o"])
        ds._last_prune = obj["lp"]
        return ds


def run_sequence(
    X: np.ndarray, ts: np.ndarray, model: DenStream | None = None, **kw
) -> tuple[DenStream, list[str]]:
    """Feed (ts-ordered) points through one DenStream instance."""
    ds = model or DenStream(**kw)
    placements = [ds.learn(X[i], float(ts[i])) for i in range(len(X))]
    return ds, placements


def denstream_assign(
    df, key_col: str, vec_col: str, ts_col: str = "ts_s", **kw
):
    """Distributed batch form: one DenStream per key via applyInPandas;
    emits the final micro-cluster summary table per key (center digest,
    weight, offline cluster label). Per-key Arrow batch is sequential —
    the algorithm's own contract; keys run in parallel."""

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        X = np.stack(pdf[vec_col].to_numpy())
        ds, _ = run_sequence(X, pdf[ts_col].to_numpy(dtype=float), **kw)
        labels = ds.offline_clusters()
        rows = []
        for m, lab in zip(ds.p, labels):
            c = m.center()
            rows.append(
                {
                    "key": pdf[key_col].iloc[0],
                    "kind": "core",
                    "offline_cluster": lab,
                    "weight": round(m.w, 6),
                    "radius": round(m.radius(), 6),
                    "center_norm": round(float(np.linalg.norm(c)), 6),
                }
            )
        for m in ds.o:
            rows.append(
                {
                    "key": pdf[key_col].iloc[0],
                    "kind": "outlier",
                    "offline_cluster": -1,
                    "weight": round(m.w, 6),
                    "radius": round(m.radius(), 6),
                    "center_norm": round(float(np.linalg.norm(m.center())), 6),
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                "key", "kind", "offline_cluster", "weight", "radius",
                "center_norm",
            ],
        )

    schema = (
        "key string, kind string, offline_cluster int, weight double, "
        "radius double, center_norm double"
    )
    return df.groupBy(key_col).applyInPandas(per_key, schema)
