"""Volume anomaly detection (SURVEY M8-M11; src/ml/volume_analyzer.py).

Native path (default): the rolling z-score features W2-W5 ARE the anomaly
signal — `operators.relational.volume_zscore` + `flag_anomalies` reproduce
the reference's flag rule (z < −1 vs batch, cap 3, ratio guard 0.3,
volume_analyzer.py:126-147 + incident_ops.py:87-97) without any model.

Parity path: the reference scores features with an IsolationForest
(volume_analyzer.py:17-24). Two implementations exist — the sklearn
wrapper below (import-gated, absent here) and ``ml.iforest``, a native
numpy Isolation Forest (Liu/Ting/Zhou 2008: subsampled random trees,
2^(−E[h]/c(psi)) scoring, seeded/deterministic) with driver-side bounded
fit and Arrow-distributed scoring — no dependency, tested in
tests/test_iforest.py. M9 no longer requires sklearn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.relational import flag_anomalies, volume_zscore

__all__ = ["volume_zscore", "flag_anomalies", "isolation_forest_scores"]

ISOFOREST_PARAMS = dict(
    n_estimators=100, contamination=0.05, random_state=42, n_jobs=-1
)  # reference values: src/ml/volume_analyzer.py:19-24


def isolation_forest_scores(features: DataFrame) -> DataFrame:
    """Score [log_count, velocity, rolling_avg, deviation] rows with an
    IsolationForest (reference parity mode). Import-gated: raises
    NotImplementedError when sklearn is absent (this container)."""
    try:
        from sklearn.ensemble import IsolationForest  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "sklearn is not installed here; use the native z-score path "
            "(volume_zscore + flag_anomalies) which needs no model"
        ) from exc

    import pandas as pd  # pragma: no cover - exercised only with sklearn

    cols = ["log_count", "velocity", "rolling_avg", "deviation"]
    pdf: pd.DataFrame = features.select("cluster_id", *cols).toPandas()
    if len(pdf) < 10:  # min-training gate, volume_analyzer.py:82-86
        pdf["score"] = 0.0
    else:
        forest = IsolationForest(**ISOFOREST_PARAMS)
        forest.fit(pdf[cols])
        pdf["score"] = forest.score_samples(pdf[cols])
    return features.sparkSession.createDataFrame(pdf[["cluster_id", "score"]])
