"""Shard-grain corpus manifest diff — rehearsed r11 catalog candidate
`shard_manifest_diff` (which output shards must an incremental
re-materialization rewrite)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_manifest_diff_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_curation import (
        manifest_diff_oracle_sql,
        q_shard_manifest_diff,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "shard_manifest_diff", q_shard_manifest_diff,
        manifest_diff_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_planted_transitions(spark):
    """One shard (n_shards=1) so every transition lands in one row:
    old = {1, 2, 3}, new = {2 (unchanged), 3 (text changed), 4 (added)}
    -> added 1, removed 1, changed 1, needs_rewrite true. A second run
    with identical snapshots -> all deltas 0, needs_rewrite false."""
    from logstream_processing_service_spark.operators.curation import (
        shard_manifest_diff,
    )

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA"), (4, "delta")], "doc_id long, text string"
    )
    row = shard_manifest_diff(old, new, n_shards=1).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_docs_old"], r["n_docs_new"]) == (3, 3)
    assert (r["n_added"], r["n_removed"], r["n_changed"]) == (1, 1, 1)
    assert r["chars_old"] == len("alphabetagamma")
    assert r["needs_rewrite"] is True

    same = shard_manifest_diff(old, old, n_shards=1).collect()[0]
    assert (same["n_added"], same["n_removed"], same["n_changed"]) == (0, 0, 0)
    assert same["needs_rewrite"] is False


def test_shard_assignment_is_stable_across_snapshots(spark):
    """A doc's shard id depends only on (salt, doc_id) — the old and
    new side of the SAME doc always meet in the same shard row, so the
    per-shard totals balance: sum(n_docs_old) == |old|,
    sum(n_docs_new) == |new| with no doc double-counted."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.curation import (
        shard_manifest_diff,
    )
    from logstream_processing_service_spark.sources import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 2 != 0).select("doc_id", "text")
    out = shard_manifest_diff(old, new)
    agg = out.groupBy().sum("n_docs_old", "n_docs_new").collect()[0]
    assert agg[0] == old.count()
    assert agg[1] == new.count()


def test_null_text_doc_counts_as_present_empty(spark):
    """A NULL-text doc is a PRESENT (empty) doc: it must appear in the
    counts and diff as text '' would — never vanish (md5(NULL) is NULL
    on both engines; the operator hashes coalesce(text, ''))."""
    from pyspark.sql import types as Ty

    from logstream_processing_service_spark.operators.curation import (
        shard_manifest_diff,
    )

    schema = Ty.StructType([
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("text", Ty.StringType()),
    ])
    old = spark.createDataFrame([(1, None), (2, "beta")], schema)
    new = spark.createDataFrame([(1, ""), (2, "beta")], schema)
    r = shard_manifest_diff(old, new, n_shards=1).collect()[0]
    assert (r["n_docs_old"], r["n_docs_new"]) == (2, 2)
    # NULL and '' hash identically under the coalesce -> unchanged
    assert (r["n_added"], r["n_removed"], r["n_changed"]) == (0, 0, 0)
    assert r["needs_rewrite"] is False


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_manifest_timetravel_twin_hash_matches_oracle(spark, sf_dir):
    """The txlog composition: the SAME oracle as the snapshot diff,
    but the Spark side reads both snapshots back through time-travel
    over an overwrite commit — version isolation proven by the hash."""
    from logstream_processing_service_spark.queries_curation import (
        manifest_diff_oracle_sql,
        q_manifest_timetravel_twin,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "manifest_timetravel_twin", q_manifest_timetravel_twin,
        manifest_diff_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r
