"""Native Isolation Forest: separation, determinism, distributed parity."""

from __future__ import annotations

import numpy as np

from logstream_processing_service_spark.ml import iforest as IF


def _planted(seed=7, n=500, k=8):
    rng = np.random.default_rng(seed)
    normal = rng.normal(0, 1, size=(n, 4))
    outliers = rng.uniform(8, 12, size=(k, 4)) * rng.choice([-1, 1], size=(k, 4))
    return normal, outliers


def test_outliers_score_higher_than_all_normals():
    normal, outliers = _planted()
    model = IF.fit_iforest(np.vstack([normal, outliers]))
    s_n = IF.iforest_scores_np(model, normal)
    s_o = IF.iforest_scores_np(model, outliers)
    # every planted extreme isolates faster than every inlier
    assert s_o.min() > s_n.max()
    assert (s_o > 0.6).all()  # canonical "clear anomaly" band from the paper
    assert 0.0 < s_n.mean() < 0.55


def test_deterministic_given_seed():
    normal, outliers = _planted()
    X = np.vstack([normal, outliers])
    a = IF.iforest_scores_np(IF.fit_iforest(X, seed=42), X)
    b = IF.iforest_scores_np(IF.fit_iforest(X, seed=42), X)
    assert np.array_equal(a, b)
    c = IF.iforest_scores_np(IF.fit_iforest(X, seed=43), X)
    assert not np.array_equal(a, c)


def test_duplicate_rows_do_not_crash_or_isolate():
    X = np.ones((300, 3))
    model = IF.fit_iforest(X, n_trees=20)
    s = IF.iforest_scores_np(model, X)
    # identical rows cannot be isolated: path = c(psi) → score ≈ 0.5
    assert np.allclose(s, 0.5, atol=0.05)


def test_distributed_scoring_matches_local(spark):
    normal, outliers = _planted()
    X = np.vstack([normal, outliers])
    rows = [(i, *map(float, X[i])) for i in range(len(X))]
    df = spark.createDataFrame(
        rows, "id bigint, f0 double, f1 double, f2 double, f3 double"
    )
    cols = ["f0", "f1", "f2", "f3"]
    out = {
        r["id"]: r["iforest_score"]
        for r in IF.iforest_score_df(df, cols).collect()
    }
    # the fit sample is driver-collected via limit() — order differs from X,
    # so refit locally on the same frame to compare scoring only
    fit_pdf = df.select(*cols).limit(100_000).toPandas()
    model = IF.fit_iforest(fit_pdf.to_numpy())
    local = np.round(IF.iforest_scores_np(model, X), 6)
    for i in range(len(X)):
        assert abs(out[i] - local[i]) < 1e-9
