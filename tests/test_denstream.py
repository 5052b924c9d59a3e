"""DenStream semantics: separation, decay (the property KMeans refit
cannot express), outlier buffering, batch/micro-batch parity, and the
distributed per-key form."""

from __future__ import annotations

import numpy as np

from logstream_processing_service_spark.ml import denstream as DS


def _blob(rng, center, n, sigma=0.08):
    return rng.normal(0, sigma, size=(n, 2)) + np.asarray(center, dtype=float)


def test_two_blobs_two_offline_clusters():
    rng = np.random.default_rng(3)
    a = _blob(rng, (0, 0), 150)
    b = _blob(rng, (5, 5), 150)
    X = np.vstack([a, b])
    order = rng.permutation(len(X))
    ts = np.linspace(0, 300, len(X))
    ds, placed = DS.run_sequence(X[order], ts)
    labels = ds.offline_clusters()
    assert len(set(labels)) == 2
    # most points land in core micro-clusters
    assert placed.count("core") > 0.8 * len(X)
    # the two offline clusters sit at the two blob centers
    centers = {}
    for m, lab in zip(ds.p, labels):
        centers.setdefault(lab, []).append(m.center() * m.w)
    sums = {
        lab: np.sum(v, axis=0) / sum(m.w for m, l in zip(ds.p, labels) if l == lab)
        for lab, v in centers.items()
    }
    got = sorted(round(float(c[0])) for c in sums.values())
    assert got == [0, 5]


def test_stale_cluster_decays_away():
    rng = np.random.default_rng(4)
    early = _blob(rng, (0, 0), 60)
    late = _blob(rng, (5, 5), 200)
    X = np.vstack([early, late])
    # early blob lives t∈[0,100]; the late blob streams t∈[30k,60k] —
    # with λ=5e-4 the early cluster's weight fades 2^(-15) by the end
    ts = np.concatenate([np.linspace(0, 100, 60), np.linspace(30_000, 60_000, 200)])
    ds, _ = DS.run_sequence(X, ts)
    ds.prune(60_000)
    centers = [m.center() for m in ds.p]
    assert centers, "late cluster must survive"
    for c in centers:
        assert np.linalg.norm(c - np.array([5.0, 5.0])) < 1.0, c
    # KMeans-refit over the full history would still place a centroid at
    # the origin; DenStream's fading forgets it — the M7 semantic


def test_sparse_noise_stays_in_outlier_buffer():
    rng = np.random.default_rng(5)
    core = _blob(rng, (1, 1), 120)
    noise = rng.uniform(-50, 50, size=(10, 2))
    X = np.vstack([core, noise])
    ts = np.linspace(0, 120, len(X))
    order = rng.permutation(len(X))
    ds, _ = DS.run_sequence(X[order], ts)
    # noise points are isolated: none may promote to a potential cluster
    for m in ds.p:
        assert np.linalg.norm(m.center() - np.array([1.0, 1.0])) < 1.0


def test_microbatch_replay_equals_one_shot():
    rng = np.random.default_rng(6)
    X = np.vstack([_blob(rng, (0, 0), 90), _blob(rng, (4, 4), 90)])
    order = rng.permutation(len(X))
    X = X[order]
    ts = np.linspace(0, 500, len(X))
    one, _ = DS.run_sequence(X, ts)
    # same stream in 4 chunks with JSON state carried between batches
    model = None
    state = None
    for lo in range(0, len(X), 45):
        model = DS.DenStream() if state is None else DS.DenStream.from_json(state)
        model, _ = DS.run_sequence(X[lo : lo + 45], ts[lo : lo + 45], model=model)
        state = model.to_json()
    assert model.to_json() == one.to_json()


def test_denstream_assign_distributed_matches_local(spark):
    rng = np.random.default_rng(7)
    rows = []
    for key in ("error", "signup"):
        shift = 0.0 if key == "error" else 3.0
        pts = np.vstack(
            [_blob(rng, (0 + shift, 0), 60), _blob(rng, (5 + shift, 5), 60)]
        )
        ts = np.linspace(0, 120, len(pts))
        for i in range(len(pts)):
            rows.append((key, [float(pts[i][0]), float(pts[i][1])], float(ts[i])))
    df = spark.createDataFrame(rows, "key string, vec array<double>, ts_s double")
    out = DS.denstream_assign(df, "key", "vec", "ts_s").collect()
    for key in ("error", "signup"):
        sub = [r for r in out if r["key"] == key and r["kind"] == "core"]
        assert len({r["offline_cluster"] for r in sub}) == 2
        # distributed result == local sequential run on the same key slice
        local_rows = [r for r in rows if r[0] == key]
        X = np.stack([r[1] for r in local_rows])
        ts = np.array([r[2] for r in local_rows])
        ds, _ = DS.run_sequence(X, ts)
        assert len(sub) == len(ds.p)
        got_w = sorted(round(r["weight"], 6) for r in sub)
        exp_w = sorted(round(m.w, 6) for m in ds.p)
        assert got_w == exp_w


def test_denstream_streaming_microbatches(spark, tmpdir):
    """applyInPandasWithState wiring: 3 file-source micro-batches carry
    JSON micro-cluster state; the final census matches the one-shot
    sequential replay."""
    import pyspark.sql.functions as F

    from logstream_processing_service_spark.streaming.state import (
        denstream_stream,
    )

    rng = np.random.default_rng(11)
    pts = np.vstack([_blob(rng, (0, 0), 90), _blob(rng, (5, 5), 90)])
    order = rng.permutation(len(pts))
    pts = pts[order]
    ts = np.linspace(0, 360, len(pts))
    src = f"{tmpdir}/denstream_src"
    for b in range(3):  # one file per micro-batch, time-ordered slices
        rows = [
            ("error", [float(x) for x in pts[i]], float(ts[i]))
            for i in range(b * 60, (b + 1) * 60)
        ]
        spark.createDataFrame(
            rows, "key string, vec array<double>, ts_s double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/batch={b}")
    stream = (
        spark.readStream.schema("key string, vec array<double>, ts_s double")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/batch=*")
    )
    q = (
        denstream_stream(stream)
        .writeStream.format("memory")
        .queryName("denstream_census")
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/_ckpt_ds")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT * FROM denstream_census ORDER BY total_weight"
    ).collect()
    assert len(got) >= 1  # at least the final census row
    final = got[-1]
    assert final["n_offline_clusters"] == 2
    one, _ = DS.run_sequence(pts, ts)
    assert abs(final["total_weight"] - sum(m.w for m in one.p)) < 1e-3
    assert final["n_core"] == len(one.p)
