"""Shard-grain anti-entropy repair planning — rehearsed r14 catalog
candidate `merkle_repair_plan` (the rsync planner on top of
merkle_integrity_diff)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_merkle_repair_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        merkle_repair_query_oracle_sql,
        q_merkle_repair_plan,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "merkle_repair_plan", q_merkle_repair_plan,
        merkle_repair_query_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_repair_plan_covers_exactly_the_divergent_shards(spark):
    """Planted divergence: identical corpora except one changed doc,
    one added doc, and one shard emptied entirely — the plan must
    contain exactly those shards with the right actions, and applying
    it (fetch the listed shards from the source, drop the dropped
    ones) must reconcile the trees to zero differs rows."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.curation import (
        merkle_corpus_tree,
        merkle_integrity_diff,
        merkle_repair_plan,
    )
    from logstream_processing_service_spark.functions import text as T

    rows = [(i, f"doc body number {i} with words") for i in range(1, 41)]
    old = spark.createDataFrame(rows, "doc_id long, text string")

    # shard assignment must match the operator's keyed hash
    shard_of = {
        r["doc_id"]: r["shard"]
        for r in old.select(
            "doc_id",
            (
                F.expr(
                    T.hash48_sql("concat('manifest-v1:', cast(doc_id as string))")
                )
                % 64
            ).cast("int").alias("shard"),
        ).collect()
    }
    changed_id = 7
    dropped_shard = shard_of[13]
    dropped_ids = {d for d, s in shard_of.items() if s == dropped_shard}
    added_id = 1001
    new_rows = [
        (d, t) for d, t in rows
        if d not in dropped_ids and d != changed_id
    ]
    new_rows += [(changed_id, "REWRITTEN body"), (added_id, "brand new doc")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    # compute the added doc's shard from the new side
    shard_added = new.filter(F.col("doc_id") == added_id).select(
        (
            F.expr(
                T.hash48_sql("concat('manifest-v1:', cast(doc_id as string))")
            )
            % 64
        ).cast("int").alias("shard")
    ).collect()[0]["shard"]

    plan = {r["shard"]: r for r in merkle_repair_plan(old, new).collect()}
    want_fetch = {shard_of[changed_id], shard_added}
    want_drop = {dropped_shard} - want_fetch
    assert set(plan) == want_fetch | want_drop
    for s in want_fetch:
        assert plan[s]["action"] == "fetch_shard"
        assert plan[s]["bytes_est"] > 0
    for s in want_drop:
        assert plan[s]["action"] == "drop_shard"
        assert plan[s]["n_docs_src"] == 0
        assert plan[s]["bytes_est"] == 0

    # apply the plan: repaired = old minus planned shards, plus the
    # source's rows for fetched shards
    shard_col = (
        F.expr(
            T.hash48_sql("concat('manifest-v1:', cast(doc_id as string))")
        )
        % 64
    ).cast("int")
    planned = set(plan)
    repaired = old.filter(~shard_col.isin(planned)).unionByName(
        new.filter(shard_col.isin(want_fetch))
    )
    post = merkle_integrity_diff(repaired, new)
    assert post.filter("differs").count() == 0
    # sanity: the repaired tree IS the source tree
    a = sorted(tuple(r) for r in merkle_corpus_tree(repaired).collect())
    b = sorted(tuple(r) for r in merkle_corpus_tree(new).collect())
    assert a == b
