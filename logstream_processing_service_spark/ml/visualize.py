"""Driver-side visualization (SURVEY M13 — scripts/visualise_results.py).

Both plots operate on a bounded sample collected to the driver — they are
inspection tools, not engine operators. matplotlib/sklearn are not in this
container, so both are import-gated; the DATA PREPARATION (sampling,
contingency) is engine-side Spark and runs everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purity_heatmap_data(assigned: DataFrame, truth_col: str, cluster_col: str, top_k: int = 20) -> DataFrame:
    """Engine-side prep for the purity heatmap (visualise_results.py:13-39):
    contingency counts restricted to the top-k clusters by volume."""
    top = (
        assigned.groupBy(cluster_col)
        .count()
        .orderBy(F.desc("count"), cluster_col)
        .limit(top_k)
        .select(cluster_col)
    )
    return (
        assigned.join(F.broadcast(top), cluster_col, "left_semi")
        .groupBy(truth_col, cluster_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tsne_projection(assigned: DataFrame, emb_col: str = "embedding", sample: int = 1000, seed: int = 42):
    """t-SNE 2-D projection of a ≤``sample`` driver-side sample
    (visualise_results.py:49-63: perplexity=30, init='pca', seed 42).
    Uses sklearn when installed (reference parity mode); otherwise the
    native exact implementation in ``ml.tsne`` — same perplexity/init/
    seed contract, tested in tests/test_tsne.py. M13 no longer requires
    sklearn."""
    import numpy as np

    pdf = assigned.select(emb_col).limit(sample).toPandas()
    mat = np.asarray([list(v) for v in pdf[emb_col]])
    try:
        from sklearn.manifold import TSNE  # noqa: F401

        return TSNE(
            n_components=2, perplexity=30, init="pca", random_state=seed
        ).fit_transform(mat)  # pragma: no cover - needs sklearn
    except ImportError:
        from .tsne import tsne_exact

        return tsne_exact(mat, perplexity=30.0, seed=seed)
