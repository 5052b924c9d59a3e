"""Distributed PCA: exact parity with in-memory numpy PCA at test scale,
plus the invariances that make the report trustworthy at any scale."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from .conftest import SF_DIR
from logstream_processing_service_spark.sources.tables import load_table


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_pca_matches_inmemory_numpy(spark):
    from logstream_processing_service_spark.operators.similarity import (
        pca_model,
    )

    emb = _emb(spark)
    mean, comps, eigvals, var_exp = pca_model(emb, k=8)
    X = np.stack([r["embedding"] for r in emb.select("embedding").collect()])
    X = X.astype(np.float64)
    ref_mean = X.mean(axis=0)
    ref_cov = np.cov(X, rowvar=False, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(ref_cov)
    ref_vals = ref_vals[::-1]
    assert np.allclose(mean, ref_mean, atol=1e-9)
    assert np.allclose(eigvals, np.maximum(ref_vals, 0), atol=1e-9)
    # components span the same subspaces: |cos| of each pair ≈ 1
    ref_top = ref_vecs[:, ::-1][:, :8]
    cos = np.abs((comps @ ref_top).diagonal())
    assert np.all(cos > 1 - 1e-8), cos
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-9)
    # sign convention: largest-|coord| entry positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0


def test_pca_report_shape_and_monotonicity(spark):
    from logstream_processing_service_spark.operators.similarity import (
        embedding_pca_report,
    )

    rows = embedding_pca_report(_emb(spark), k=8).collect()
    assert [r["component"] for r in rows] == list(range(8))
    # cumulative variance is nondecreasing, rmse nonincreasing
    cums = [r["cum_var"] for r in rows]
    rmses = [r["recon_rmse"] for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:], strict=False))
    assert all(b <= a + 1e-9 for a, b in zip(rmses, rmses[1:], strict=False))
    assert all(0 <= r["var_explained"] <= 1 for r in rows)


def test_pca_partitioning_invariance(spark):
    """The rounded report must not depend on the partition layout (the
    moment pass runs per-task; rounding absorbs float summation order)."""
    from logstream_processing_service_spark.operators.similarity import (
        embedding_pca_report,
    )

    emb = _emb(spark)
    a = [tuple(r) for r in embedding_pca_report(emb, k=4).collect()]
    b = [
        tuple(r)
        for r in embedding_pca_report(emb.repartition(7), k=4).collect()
    ]
    assert a == b
