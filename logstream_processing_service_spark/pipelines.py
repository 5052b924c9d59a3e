"""End-to-end pipelines: the reference's three entry points as thin
drivers over the operator layers (SURVEY §3, §7 step 5).

Reference entry points:
- ``scripts/run_training_batch.py:76-257``  → :func:`run_training_batch`
- ``scripts/run_incremental_batch.py:28-112`` → :func:`run_incremental_batch`
- ``scripts/validate_quality.py:59-112``    → :func:`run_quality_validation`

Each reference step keeps its SURVEY §2 operator id in comments so the
mapping is auditable. The reference's per-row loops become one declarative
plan per stage; its per-row DB transactions become set-oriented parquet
upserts; its pickled model state becomes a versioned parquet model store
with the same blue/green promote semantics (T8,
run_training_batch.py:243-257).

Table mapping (TESTDATA ``events`` plays the reference's ``logs``):
log_id→event_id, level→event_type (interesting levels = error/signup),
message+parsed_data→props, cluster_id→assigned cluster label.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from .ml.clustering import fit_kmeans_centroids
from .ml.embedding import hash_featurizer
from .operators import relational as R
from .operators.similarity import assign_nearest_centroid
from .sources import load_table

INTERESTING_TYPES = ("error", "signup")  # reference: level IN ('error','warning')
CENTROID_THRESHOLD = 0.35  # src/ml/vector_engine.py:8
EMBED_DIM = 64  # test stand-in for the 384-dim MiniLM space


def compose_text(df: DataFrame) -> DataFrame:
    """F3: the reference's '{message}. Parsed: {parsed_data}' template
    (scripts/run_incremental_batch.py:77)."""
    return df.withColumn(
        "text",
        F.format_string(
            "%s. Parsed: %s", F.col("event_type"), F.coalesce("props", F.lit(""))
        ),
    )


def embed_events(df: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """M1/M2: embedding column via Arrow-batched pandas_udf."""
    return compose_text(df).withColumn("embedding", hash_featurizer(dim)(F.col("text")))


# ---------------------------------------------------------------------------
# Model store: S10 persistence + T8 blue/green promote
# ---------------------------------------------------------------------------


class ModelStore:
    """Versioned model state on parquet with atomic blue/green promotion.

    Reference: joblib pickles under ``scripts/models/{staging,production}``
    with an ``os.rename`` swap + backup (run_training_batch.py:30-36,
    243-257; src/ml/model.py:18-46). Same layout here; the artifacts are
    parquet tables (centroids) + a JSON manifest instead of pickles, so
    they are readable by any Spark cluster, not one Python process.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self.staging = os.path.join(root, "staging")
        self.production = os.path.join(root, "production")
        self.backup = os.path.join(root, "backup")

    def save_centroids(self, centroids: DataFrame, stage: bool = True) -> None:
        target = self.staging if stage else self.production
        centroids.write.mode("overwrite").parquet(os.path.join(target, "centroids"))

    def save_manifest(self, meta: dict, stage: bool = True) -> None:
        target = self.staging if stage else self.production
        os.makedirs(target, exist_ok=True)
        with open(os.path.join(target, "manifest.json"), "w") as fh:
            json.dump({**meta, "saved_at": time.time()}, fh)

    def load_centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.production, "centroids"))

    def load_manifest(self) -> dict:
        with open(os.path.join(self.production, "manifest.json")) as fh:
            return json.load(fh)

    def promote(self) -> None:
        """Atomic blue/green swap: production→backup, staging→production
        (run_training_batch.py:243-257)."""
        if os.path.exists(self.production):
            if os.path.exists(self.backup):
                shutil.rmtree(self.backup)
            os.rename(self.production, self.backup)
        os.rename(self.staging, self.production)


# ---------------------------------------------------------------------------
# CSV staging: S4 (append sink) / S5 (scan) / F6 (array<->json round trip)
# ---------------------------------------------------------------------------


def stage_to_csv(df: DataFrame, path: str) -> None:
    """Crash-safe staging buffer (run_training_batch.py:109-152). The
    embedding array is JSON-encoded per the reference's CSV serialization
    (run_training_batch.py:143-145, F6)."""
    df.select(
        "event_id",
        "event_type",
        "text",
        F.to_json("embedding").alias("embedding_json"),
    ).write.mode("overwrite").option("header", True).csv(path)


def read_staged_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 + F6 decode (run_training_batch.py:156, 163)."""
    df = spark.read.option("header", True).csv(
        path, schema="event_id bigint, event_type string, text string, embedding_json string"
    )
    return df.withColumn(
        "embedding", F.from_json("embedding_json", ArrayType(FloatType()))
    ).drop("embedding_json")


def upsert_parquet(
    spark: SparkSession, new: DataFrame, target: str, key: str = "event_id"
) -> None:
    """S6: ON CONFLICT DO NOTHING as anti-join append (idempotent sink)."""
    deduped = new.dropDuplicates([key])
    try:
        existing = spark.read.parquet(target).select(key)
        deduped = deduped.join(existing, key, "left_anti")
    except Exception:
        pass  # first write: no target yet
    deduped.write.mode("append").parquet(target)


# ---------------------------------------------------------------------------
# Entry point 1: training batch (SURVEY §3.2)
# ---------------------------------------------------------------------------


def run_training_batch(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    limit: int = 5000,
    k: int = 8,
    dim: int = EMBED_DIM,
) -> dict:
    """Initial training: scan → embed → fit → assign → bulk load → patterns
    → volume features → promote model (run_training_batch.py:76-257).

    The reference's sequential learn_one loop (:121-150) becomes fit (one
    distributed KMeans) + transform (one broadcast nearest-centroid pass);
    its CSV buffer + bulk txn (:109-191) stays as a real CSV staging hop to
    exercise S4/S5, then one set-oriented upsert.
    """
    store = ModelStore(os.path.join(work_dir, "models"))

    # Scan: P3 filter + O1 order + O2 limit (run_training_batch.py:87)
    events = load_table(spark, sf_dir, "events")
    batch = (
        events.filter(F.col("event_type").isin(*INTERESTING_TYPES))
        .orderBy("event_id")
        .limit(limit)
    )

    # M1/M2 embed → S4 CSV staging → S5 read-back (crash-safe buffer)
    staged_path = os.path.join(work_dir, "staging_csv")
    stage_to_csv(embed_events(batch, dim), staged_path)
    staged = read_staged_csv(spark, staged_path)

    # M7 fit: distributed KMeans refit as the global-clustering path;
    # ml/denstream.py provides the reference's actual fading-micro-cluster
    # algorithm (per-key applyInPandas / applyInPandasWithState)
    centroids = fit_kmeans_centroids(staged, k=k)

    # score path: broadcast nearest-centroid (M3 batch form)
    assigned = assign_nearest_centroid(
        staged.select(F.col("event_id").alias("vec_id"), "embedding"),
        centroids,
        threshold=None,
    )

    # S6/S7 bulk load: embeddings + assignments in ONE set-oriented upsert
    emb_table = (
        staged.join(
            assigned.select(
                F.col("vec_id").alias("event_id"),
                F.col("assigned_label").alias("cluster_id"),
            ),
            "event_id",
        )
    )
    upsert_parquet(spark, emb_table, os.path.join(work_dir, "log_embeddings"))

    # J1/A2 pattern mining over the clustered slice (run_training_batch.py:211)
    clustered = emb_table.select(
        "event_id", F.col("cluster_id").alias("user_id"), "event_type",
        F.col("text").alias("props"), F.lit(None).cast("timestamp_ntz").alias("ts"),
    )
    patterns = R.mine_patterns(clustered)
    patterns.write.mode("overwrite").parquet(os.path.join(work_dir, "log_patterns"))

    # A4/F5 volume history + M8 rolling features (run_training_batch.py:213-241)
    volume = R.batch_volume(clustered.select("user_id", "event_id"))
    volume.write.mode("overwrite").parquet(os.path.join(work_dir, "volume_history"))
    features = R.volume_zscore(volume)
    features.write.mode("overwrite").parquet(os.path.join(work_dir, "volume_features"))

    # S10 persist to staging + T8 blue/green promote
    store.save_centroids(centroids, stage=True)
    store.save_manifest({"k": k, "dim": dim, "trained_on": limit}, stage=True)
    store.promote()

    # materialize counts BEFORE dropping the CSV buffer (their plans read it)
    n_trained, n_patterns = staged.count(), patterns.count()
    shutil.rmtree(staged_path)  # run_training_batch.py:194

    return {
        "trained": n_trained,
        "clusters": k,
        "patterns": n_patterns,
        "model_dir": store.production,
    }


# ---------------------------------------------------------------------------
# Entry point 2: incremental scoring batch (SURVEY §3.1)
# ---------------------------------------------------------------------------


def run_incremental_batch(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    start_id: int,
    end_id: int,
    dim: int = EMBED_DIM,
) -> dict:
    """Incremental scoring: load state → slice scan → embed → assign →
    upsert → pattern refresh → incident detection → commit
    (run_incremental_batch.py:28-112). The per-row loop (:76-93) is one
    declarative plan; the per-row write txn (:66-81 in log_ops) is one
    idempotent upsert.
    """
    store = ModelStore(os.path.join(work_dir, "models"))
    centroids = store.load_centroids(spark)  # state load, §3.1 step 2

    # P3/P4/P5 + O1 slice scan (run_incremental_batch.py:59-65)
    events = load_table(spark, sf_dir, "events")
    batch = R.scan_slice(
        events, lo=start_id, hi=end_id, levels=INTERESTING_TYPES, limit=None
    )
    if batch.isEmpty():  # empty-batch early exit (:69-71)
        return {"scored": 0, "incidents": 0}

    # embed + nearest-centroid with the 0.35 mint threshold (M3); batch
    # semantics: beyond-threshold rows stay unassigned (-1) — matching the
    # reference's scoring path, which discards minted centroids (§3.1 step 7)
    emb = embed_events(batch, dim)
    assigned = assign_nearest_centroid(
        emb.select(F.col("event_id").alias("vec_id"), "embedding"),
        centroids,
        threshold=CENTROID_THRESHOLD,
    )
    scored = emb.join(
        assigned.select(
            F.col("vec_id").alias("event_id"),
            F.col("assigned_label").alias("cluster_id"),
        ),
        "event_id",
    )

    # T2/S6 idempotent sink (vs per-row txn log_ops.py:66-81)
    upsert_parquet(spark, scored, os.path.join(work_dir, "log_embeddings"))

    # pattern refresh above the watermark (S8 + P6, pattern_ops.py:12-46)
    clustered = scored.select(
        "event_id", F.col("cluster_id").alias("user_id"), "event_type",
        F.col("text").alias("props"), "ts",
    ).filter(F.col("user_id") >= 0)
    patterns = R.mine_patterns(clustered)
    upsert_parquet(
        spark, patterns, os.path.join(work_dir, "log_patterns_incr"), key="cluster_id"
    )

    # anomaly pass (incident_ops.py:44-105): A1 count → history append →
    # W1-W5 features → M10 flag → J2 incident upsert split
    volume = R.batch_volume(clustered.select("user_id", "event_id"))
    hist_path = os.path.join(work_dir, "volume_history")
    volume.write.mode("append").parquet(hist_path)
    history = spark.read.parquet(hist_path)
    flagged = R.flag_anomalies(R.volume_zscore(history))

    inc_path = os.path.join(work_dir, "incidents")
    try:
        incidents = spark.read.parquet(inc_path)
    except Exception:
        incidents = spark.createDataFrame(
            [], "cluster_id bigint, status string, created_at timestamp"
        )
    actions = R.open_incident_upsert(
        flagged.select("cluster_id"), incidents
    )
    new_incidents = (
        actions.filter(F.col("action") == "insert")
        .select(
            "cluster_id",
            F.lit("NEW").alias("status"),
            F.current_timestamp().alias("created_at"),
        )
    )
    # Count BEFORE appending: the plan's `incidents` input reads inc_path,
    # so re-executing it after the write would anti-join the just-inserted
    # rows away (and re-evaluate current_timestamp). localCheckpoint
    # materializes the rows once; the write and the count both reuse them.
    new_incidents = new_incidents.localCheckpoint()
    n_new = new_incidents.count()
    new_incidents.write.mode("append").parquet(inc_path)

    # S9 commit marker (vs UPDATE batch_order, run_incremental_batch.py:103-110)
    n_scored = scored.count()
    with open(os.path.join(work_dir, "batch_status.json"), "w") as fh:
        json.dump(
            {
                "start_id": start_id,
                "end_id": end_id,
                "status": "COMPLETED",
                "scored": n_scored,
                "ts": time.time(),
            },
            fh,
        )
    return {"scored": n_scored, "incidents": n_new}


# ---------------------------------------------------------------------------
# Entry point 3: quality validation (SURVEY §3.3)
# ---------------------------------------------------------------------------


def run_quality_validation(
    spark: SparkSession, work_dir: str, sample: int = 2000
) -> dict:
    """Clustering-quality audit (validate_quality.py:59-112): purity
    (homogeneity/completeness vs source+'_'+level truth) exactly +
    distributed silhouette — no 2000-row cap needed, kept as an optional
    sample for reference parity."""
    from .ml.quality import quality_report, silhouette

    scored = spark.read.parquet(os.path.join(work_dir, "log_embeddings"))
    if sample:
        scored = scored.orderBy("event_id").limit(sample)
    # truth = source+"_"+level (validate_quality.py:17); events have one
    # categorical, so truth = event_type
    audit = quality_report(
        scored.withColumn("truth", F.col("event_type")), "truth", "cluster_id"
    ).first()
    sil = silhouette(scored, emb_col="embedding", cluster_col="cluster_id")
    sil_verdict = "PASS" if sil > 0.4 else ("WARN" if sil > 0.1 else "FAIL")
    return {
        "homogeneity": audit["homogeneity"],
        "completeness": audit["completeness"],
        "v_measure": audit["v_measure"],
        "purity_verdict": audit["verdict"],
        "silhouette": round(sil, 6),
        "silhouette_verdict": sil_verdict,
    }
