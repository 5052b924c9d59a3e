"""Clustering-quality audit (SURVEY M12; scripts/validate_quality.py).

The reference computes homogeneity/completeness vs the derived truth
``source + "_" + level`` (validate_quality.py:17, 21-25) on a ≤2000-row
sample, plus silhouette (:56).

Here homogeneity/completeness are computed EXACTLY, distributed, in pure
Spark SQL from the contingency table (A7) and entropy formulas — no sklearn,
no sample cap. Silhouette goes through MLlib's ClusteringEvaluator when
vectors are at hand (squared-euclidean, distributed) — no O(N²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency(df: DataFrame, truth_col: str, cluster_col: str) -> DataFrame:
    return df.groupBy(
        F.col(truth_col).alias("truth"), F.col(cluster_col).alias("cluster")
    ).agg(F.count(F.lit(1)).alias("n"))


# One SQL template, shared VERBATIM by the Spark implementation and the
# DuckDB oracle (the arithmetic cannot drift). {src} must expose columns
# (truth, cluster).
HC_SQL_TEMPLATE = """
    WITH ct AS (SELECT truth, cluster, count(*) AS n FROM {src} GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total FROM ct),
    bt AS (SELECT truth, sum(n) AS n_t FROM ct GROUP BY truth),
    bc AS (SELECT cluster, sum(n) AS n_c FROM ct GROUP BY cluster),
    h_t AS (SELECT -sum((n_t / n_total) * ln(n_t / n_total)) AS H_t FROM bt, tot),
    h_c AS (SELECT -sum((n_c / n_total) * ln(n_c / n_total)) AS H_c FROM bc, tot),
    h_tc AS (
        SELECT -sum((ct.n / tot.n_total) * ln(ct.n * 1.0 / bc.n_c)) AS H_t_c
        FROM ct JOIN bc USING (cluster), tot
    ),
    h_ct AS (
        SELECT -sum((ct.n / tot.n_total) * ln(ct.n * 1.0 / bt.n_t)) AS H_c_t
        FROM ct JOIN bt USING (truth), tot
    )
    SELECT round(h, 6) AS homogeneity, round(c, 6) AS completeness,
           round(CASE WHEN h + c > 0 THEN 2 * h * c / (h + c) ELSE 0.0 END, 6)
               AS v_measure
    FROM (
        SELECT CASE WHEN H_t > 0 THEN 1 - H_t_c / H_t ELSE 1.0 END AS h,
               CASE WHEN H_c > 0 THEN 1 - H_c_t / H_c ELSE 1.0 END AS c
        FROM h_t, h_c, h_tc, h_ct
    )
"""


def homogeneity_completeness(
    df: DataFrame, truth_col: str, cluster_col: str
) -> DataFrame:
    """Exact homogeneity & completeness (+ v-measure) via entropy SQL.

    h = 1 - H(truth|cluster)/H(truth); c = 1 - H(cluster|truth)/H(cluster)
    (sklearn definitions, natural log). One shuffle for the contingency
    table; everything after operates on |truth|×|cluster| rows.
    """
    import uuid

    view = f"_hc_{uuid.uuid4().hex[:8]}"
    df.select(
        F.col(truth_col).alias("truth"), F.col(cluster_col).alias("cluster")
    ).createOrReplaceTempView(view)
    return df.sparkSession.sql(HC_SQL_TEMPLATE.format(src=view))


def silhouette(assigned: DataFrame, emb_col: str = "embedding", cluster_col: str = "assigned_label") -> float:
    """Distributed silhouette (squared euclidean) via MLlib — replaces the
    reference's O(N²) sklearn call on a 2000-row sample
    (validate_quality.py:56)."""
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.functions import array_to_vector

    data = assigned.select(
        array_to_vector(F.col(emb_col).cast("array<double>")).alias("features"),
        F.col(cluster_col).cast("double").alias("prediction"),
    )
    return float(
        ClusteringEvaluator(
            predictionCol="prediction", metricName="silhouette"
        ).evaluate(data)
    )


def quality_report(
    df: DataFrame,
    truth_col: str,
    cluster_col: str,
    h_pass: float = 0.8,
    h_warn: float = 0.5,
) -> DataFrame:
    """The reference's PASS/WARN/FAIL audit (validate_quality.py:84-89) as a
    one-row DataFrame."""
    hc = homogeneity_completeness(df, truth_col, cluster_col)
    return hc.select(
        "homogeneity",
        "completeness",
        "v_measure",
        F.when(F.col("homogeneity") > h_pass, F.lit("PASS"))
        .when(F.col("homogeneity") > h_warn, F.lit("WARN"))
        .otherwise(F.lit("FAIL"))
        .alias("verdict"),
    )
