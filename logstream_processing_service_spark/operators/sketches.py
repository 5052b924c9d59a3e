"""Mergeable-sketch operators (Apache DataSketches via Spark SQL builtins).

The 100 TB pattern these enable: distinct-count questions are answered
from PRE-AGGREGATED sketch tables, never by re-scanning raw events. A
daily job reduces each (key, day) slice to a KB-sized HLL sketch; any
later rollup — per key over a year, global over everything — is a
sketch UNION, milliseconds over megabytes instead of a shuffle over
terabytes. Sketches are commutative+associative (true map-side combine)
and closed under union, which exact distinct sets are not.

Reference parity: the reference computes ``nunique()`` driver-side over
fetched frames (src/ml/volume_analyzer.py:111, src/db/incident_ops.py:88)
— the sketch registry is its scale-correct replacement, with
``relational.distinct_actors`` as the exact twin the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_daily_registry(
    events: DataFrame,
    key_col: str = "event_type",
    actor_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """The incremental state table: one HLL sketch per (key, day).

    One shuffle keyed on (key, day) with full map-side partial
    aggregation; each output row is ~2^lg_k bytes regardless of row
    count. Persist this table daily; never rebuild history.
    """
    return (
        events.groupBy(
            F.col(key_col).alias("key"), F.to_date("ts").alias("day")
        )
        .agg(F.expr(f"hll_sketch_agg({actor_col}, {lg_k})").alias("sketch"))
    )


def hll_rollup(registry: DataFrame) -> DataFrame:
    """Roll the registry up to per-key distinct estimates + a grand total
    row (key = NULL) — pure sketch unions over the tiny registry, no raw
    data touched. ``allowDifferentLgConfigK=true`` lets registries built
    at different precisions merge (union degrades to the coarser one).
    """
    per_key = registry.groupBy("key").agg(
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sketch, true))"
        ).cast("bigint").alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    total = registry.agg(
        F.lit(None).cast("string").alias("key"),
        F.expr(
            "hll_sketch_estimate(hll_union_agg(sketch, true))"
        ).cast("bigint").alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_sketches"),
    )
    return per_key.unionByName(total).orderBy(F.col("key").asc_nulls_last())


def kll_daily_registry(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    k: int = 200,
) -> DataFrame:
    """Quantile twin of ``hll_daily_registry``: one KLL sketch of
    ``value_col`` per (key, day). Same contract — KB-sized rows,
    commutative/associative map-side combine, closed under merge — so
    percentile questions over any key/time slice are answered from the
    registry, never by re-sorting raw events (an exact percentile is a
    global sort; a KLL merge is milliseconds over megabytes).

    KLL (Karnin-Lang-Liberty 2016) gives rank error ~1.65/k at k=200 ≈
    0.8% — tails included, which reservoir sampling cannot promise.
    """
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), F.to_date("ts").alias("day"))
        .agg(
            F.expr(
                f"kll_sketch_agg_double({value_col}, {k})"
            ).alias("sketch")
        )
    )


def kll_rollup(
    registry: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Merge the registry to per-key quantile estimates + a grand-total
    row (key = NULL) — sketch merges over the tiny registry only."""
    qcols = [
        F.round(
            F.expr(f"kll_sketch_get_quantile_double(_m, {q}d)"), 6
        ).alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    per_key = (
        registry.groupBy("key")
        .agg(
            F.expr("kll_merge_agg_double(sketch)").alias("_m"),
            F.count(F.lit(1)).alias("n_sketches"),
        )
        .select(
            "key",
            F.expr("kll_sketch_get_n_double(_m)").alias("n_values"),
            *qcols,
            "n_sketches",
        )
    )
    total = (
        registry.agg(
            F.expr("kll_merge_agg_double(sketch)").alias("_m"),
            F.count(F.lit(1)).alias("n_sketches"),
        )
        .select(
            F.lit(None).cast("string").alias("key"),
            F.expr("kll_sketch_get_n_double(_m)").alias("n_values"),
            *qcols,
            "n_sketches",
        )
    )
    return per_key.unionByName(total).orderBy(F.col("key").asc_nulls_last())


def theta_daily_registry(
    events: DataFrame, actor_col: str = "user_id", lg_k: int = 12
) -> DataFrame:
    """Set-operation twin of the HLL registry: one Theta sketch of active
    actors per day. Theta sketches estimate INTERSECTIONS and DIFFERENCES,
    not just unions — the primitive behind retention / churn / overlap
    questions that HLL cannot answer (HLL only unions)."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr(f"theta_sketch_agg({actor_col}, {lg_k})").alias("sketch")
    )


def retention_report(registry: DataFrame) -> DataFrame:
    """Day-over-day actor retention from the theta registry alone: for
    each consecutive day pair, |active(d)|, |active(d+1)|, the estimated
    intersection, and the retention rate — a self-join of KB-sized sketch
    rows, no raw-event rescans. The exact form of this query is a
    COUNT(DISTINCT) over a self-joined event table — two shuffles of the
    full actor stream; this reads a registry thousands of times smaller.
    """
    a = registry.select(
        F.col("day").alias("day"), F.col("sketch").alias("s_a")
    )
    b = registry.select(
        F.date_sub(F.col("day"), 1).alias("day"), F.col("sketch").alias("s_b")
    )
    return (
        a.join(b, "day")
        .select(
            "day",
            F.expr("cast(theta_sketch_estimate(s_a) as bigint)").alias(
                "n_day"
            ),
            F.expr("cast(theta_sketch_estimate(s_b) as bigint)").alias(
                "n_next"
            ),
            F.expr(
                "cast(theta_sketch_estimate("
                "theta_intersection(s_a, s_b)) as bigint)"
            ).alias("n_retained"),
        )
        .withColumn(
            "retention",
            F.round(
                F.col("n_retained") / F.greatest(F.col("n_day"), F.lit(1)), 4
            ),
        )
        .orderBy("day")
    )
