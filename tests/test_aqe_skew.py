"""AQE skew-join demonstration: the session factory enables adaptive
execution, and this pin proves Spark's runtime skew split actually
fires on a hot-key join under it — the ADAPTIVE half of the skew
story (salted_join_twin is the explicit, known-up-front half)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_partition(spark):
    """90%-hot-key fact ⋈ dim with thresholds scaled to test data: the
    final adaptive plan must mark the sort-merge join skew=true (the
    hot partition was split across tasks at runtime), and results must
    equal the plain join."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        n = 60_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = fact.join(dim, "k")
        # the adaptive FINAL plan belongs to this Dataset's OWN
        # QueryExecution — collect() drives exactly that one (count()
        # and writes spawn fresh executions and the inspected plan
        # would still print isFinalPlan=false)
        rows = joined.collect()
        assert len(rows) == n  # every fact row matches one dim
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
