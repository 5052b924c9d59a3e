"""Theta-sketch join-overlap estimation: accuracy vs the exact twin, and
the runtime bloom-filter join the optimizer injects for selective joins."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_join_overlap_estimate_accuracy(spark):
    from logstream_processing_service_spark.operators.sketches import (
        join_key_overlap_estimate,
    )

    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_partkey")
    pt = (
        spark.read.parquet(f"{sf}/part.parquet")
        .filter("p_brand = 'Brand#1'")
        .select("p_partkey")
    )
    est = join_key_overlap_estimate(li, "l_partkey", pt, "p_partkey").collect()[0]
    exact_l = li.distinct().count()
    exact_r = pt.distinct().count()
    exact_o = li.distinct().join(
        pt.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey"
    ).count()
    assert exact_o > 0
    for got, want in (
        (est["n_left_keys"], exact_l),
        (est["n_right_keys"], exact_r),
        (est["n_overlap_est"], exact_o),
    ):
        assert abs(got - want) <= max(0.05 * want, 2), (got, want)
    assert 0.0 <= est["overlap_frac"] <= 1.0


def test_runtime_bloom_filter_join_injected(spark):
    """The optimizer's runtime row-level filtering: a selective dim
    filter should inject a bloom filter on the fact side so the big scan
    drops non-joining rows BEFORE the shuffle — the runtime complement
    of the static broadcast/DPP pruning this suite already pins."""
    sf = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        pt = spark.read.parquet(f"{sf}/part.parquet").filter(
            "p_brand = 'Brand#1'"
        )
        joined = li.join(pt, li.l_partkey == pt.p_partkey).groupBy(
            "p_brand"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "mightcontain" in plan.lower(), plan
        # and the filtered result is still correct
        n = joined.collect()
        assert len(n) == 1
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
