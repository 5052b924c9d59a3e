"""End-to-end pipeline tests (SURVEY §3: the three reference entry points).

Training → incremental scoring → quality validation chained over one tmp
work dir, exercising model persistence (S10), blue/green promote (T8), CSV
staging (S4/S5/F6), idempotent upserts (S6/T2), and incident creation (J2).
"""

from __future__ import annotations

import json
import os

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from logstream_processing_service_spark import pipelines as P

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def work_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline_run"))


@pytest.fixture(scope="module")
def trained(spark, work_dir):
    return P.run_training_batch(spark, SF_DIR, work_dir, limit=800, k=5)


def test_training_batch(spark, work_dir, trained):
    assert trained["trained"] > 0
    assert trained["patterns"] > 0
    # blue/green: model landed in production, staging gone
    assert os.path.exists(os.path.join(work_dir, "models", "production", "manifest.json"))
    assert not os.path.exists(os.path.join(work_dir, "models", "staging"))
    store = P.ModelStore(os.path.join(work_dir, "models"))
    cents = store.load_centroids(spark)
    assert cents.count() == 5
    assert store.load_manifest()["k"] == 5
    # embeddings landed with cluster assignments
    emb = spark.read.parquet(os.path.join(work_dir, "log_embeddings"))
    assert emb.filter("cluster_id IS NULL").count() == 0
    assert emb.count() == trained["trained"]


def test_training_promote_keeps_backup(spark, work_dir, trained):
    # a second training run must back up the previous production state
    P.run_training_batch(spark, SF_DIR, work_dir, limit=400, k=4)
    store = P.ModelStore(os.path.join(work_dir, "models"))
    assert store.load_manifest()["k"] == 4
    backup = os.path.join(work_dir, "models", "backup", "manifest.json")
    with open(backup) as fh:
        assert json.load(fh)["k"] == 5


def test_incremental_batch(spark, work_dir, trained):
    before = spark.read.parquet(os.path.join(work_dir, "log_embeddings")).count()
    out = P.run_incremental_batch(spark, SF_DIR, work_dir, start_id=1, end_id=2000)
    assert out["scored"] > 0
    after = spark.read.parquet(os.path.join(work_dir, "log_embeddings")).count()
    # idempotent upsert: rows already scored by training are not duplicated
    assert after - before < out["scored"]
    status = json.load(open(os.path.join(work_dir, "batch_status.json")))
    assert status["status"] == "COMPLETED"
    # re-run is a near-no-op on the embeddings table (T2 effective-once)
    P.run_incremental_batch(spark, SF_DIR, work_dir, start_id=1, end_id=2000)
    again = spark.read.parquet(os.path.join(work_dir, "log_embeddings")).count()
    assert again == after


def test_incremental_empty_slice(spark, work_dir, trained):
    out = P.run_incremental_batch(
        spark, SF_DIR, work_dir, start_id=10**12, end_id=10**12 + 10
    )
    assert out == {"scored": 0, "incidents": 0}


def test_quality_validation(spark, work_dir, trained):
    report = P.run_quality_validation(spark, work_dir, sample=500)
    assert 0.0 <= report["homogeneity"] <= 1.0
    assert 0.0 <= report["completeness"] <= 1.0
    assert -1.0 <= report["silhouette"] <= 1.0
    assert report["purity_verdict"] in {"PASS", "WARN", "FAIL"}
    assert report["silhouette_verdict"] in {"PASS", "WARN", "FAIL"}


def test_csv_staging_round_trip(spark, work_dir, tmp_path):
    # S4/S5/F6: array survives the CSV hop bit-for-bit
    from logstream_processing_service_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").limit(50)
    emb = P.embed_events(ev)
    path = str(tmp_path / "stage_csv")
    P.stage_to_csv(emb, path)
    back = P.read_staged_csv(spark, path)
    orig = {r["event_id"]: r["embedding"] for r in emb.select("event_id", "embedding").collect()}
    round_tripped = {r["event_id"]: r["embedding"] for r in back.collect()}
    assert set(orig) == set(round_tripped)
    for k, v in orig.items():
        assert round_tripped[k] == pytest.approx(v, abs=1e-6)


def test_merge_parquet_upsert_semantics(spark, tmp_path):
    """MERGE: matched rows take the source version, unmatched insert, and
    re-running the same merge is idempotent."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.sources import load_table
    from logstream_processing_service_spark.sources.tables import merge_parquet

    target = str(tmp_path / "merged")
    base = (
        load_table(spark, SF_DIR, "events")
        .limit(100)
        .select("event_id", "event_type", "value")
    )
    merge_parquet(spark, target, base, key="event_id")
    n0 = spark.read.parquet(target).count()
    assert n0 == 100

    updates = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_id").between(50, 149))
        .select("event_id", F.lit("merged").alias("event_type"), "value")
    )
    merge_parquet(spark, target, updates, key="event_id")
    after = spark.read.parquet(target)
    assert after.count() == after.select("event_id").distinct().count()
    # matched rows updated, inserts present
    assert after.filter("event_id BETWEEN 50 AND 149 AND event_type <> 'merged'").count() == 0
    assert after.filter("event_id < 50 AND event_type = 'merged'").count() == 0
    n1 = after.count()
    # idempotent re-run
    merge_parquet(spark, target, updates, key="event_id")
    assert spark.read.parquet(target).count() == n1
