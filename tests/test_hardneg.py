"""Contrastive hard-negative/-positive mining — r9 catalog candidate
`hard_negative_mining`."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_hardneg_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_vector import (
        q_hard_negative_mining,
    )
    from logstream_processing_service_spark.catalog import all_specs

    sql = {s.name: s.oracle for s in all_specs()}["hard_negative_mining"]
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "hard_negative_mining", q_hard_negative_mining, sql,
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_hand_planted_geometry(spark):
    """Query [1,0]: same-label [0.9,0.1] (close) and [0,1] (orthogonal
    -> hard positive rank 1); other-label [1,0.05] (nearest impostor ->
    hard negative rank 1) and [-1,0] (easy negative, last)."""
    from logstream_processing_service_spark.operators.similarity import (
        hard_negative_mining,
    )

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),
        (2, [0.0, 1.0], 1),
        (3, [1.0, 0.05], 2),
        (4, [-1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = emb.filter("vec_id = 0")
    out = hard_negative_mining(emb, q, k=2).collect()
    neg = [r for r in out if r["kind"] == "neg"]
    pos = [r for r in out if r["kind"] == "pos"]
    assert neg[0]["vec_id"] == 3 and neg[1]["vec_id"] == 4
    assert pos[0]["vec_id"] == 2 and pos[1]["vec_id"] == 1


def test_one_exchange_two_windows(spark):
    """Both rankings share the (q_id, same) partitioning: the plan has
    ONE hashpartitioning exchange on the scored frame (plus the
    broadcast), never two sorts' worth of reshuffling."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.similarity import (
        hard_negative_mining,
    )
    from logstream_processing_service_spark.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    df = hard_negative_mining(emb, emb.filter(F.col("vec_id") < 5))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the two window branches re-use the same (q_id, same) exchange
    assert plan.count("Exchange hashpartitioning") <= 2
