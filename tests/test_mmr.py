"""MMR diversified rerank — r8-session catalog candidate `mmr_rerank`
(rows-only: greedy loop, no SQL twin). An exact numpy replica pins the
distributed form bit-for-bit; a planted redundant-passage fixture pins
the semantic difference from pure top-k."""

from __future__ import annotations

import numpy as np
import pytest

from logstream_processing_service_spark.operators import similarity as S
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR


def _replica_greedy(cand_ids, rel, Xc, k=10, lam=0.7):
    """Exact replica of the operator's greedy pass over a candidate set
    sorted by vec_id. rel comes from the SAME ann_bruteforce output the
    operator consumes (the exact baseline is oracle-checked on its own;
    re-deriving cosines here would re-test Spark-vs-numpy rounding, not
    the greedy logic)."""
    rel = np.asarray(rel, dtype=np.float64)
    nrm = np.linalg.norm(Xc, axis=1)
    nrm[nrm == 0.0] = 1.0
    U = Xc / nrm[:, None]
    Sm = np.round(U @ U.T, 9)
    chosen, best, out = [], np.full(len(cand_ids), -np.inf), []
    for r in range(min(k, len(cand_ids))):
        sc = lam * rel - (1 - lam) * best if chosen else lam * rel
        sc = np.round(sc, 9)
        sc[chosen] = -np.inf
        i = int(np.argmax(sc))
        out.append((r + 1, int(cand_ids[i]), float(rel[i]), float(sc[i])))
        chosen.append(i)
        best = np.maximum(best, Sm[:, i])
    return out


def test_mmr_matches_numpy_replica(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    got = S.mmr_rerank(emb, q, k=10, pool=50, lam=0.7).collect()
    cand = S.ann_bruteforce(emb, q, k=50).collect()
    data = emb.select("vec_id", "embedding").collect()
    emb_by_id = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in data
    }
    by_q, cand_by_q = {}, {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(r)
    for r in cand:
        cand_by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        cs = sorted(cand_by_q[qid], key=lambda r: r["vec_id"])
        ids = [r["vec_id"] for r in cs]
        rel = [r["cos"] for r in cs]
        Xc = np.asarray([emb_by_id[i] for i in ids])
        want = _replica_greedy(ids, rel, Xc)
        assert [
            (r["mmr_rank"], r["vec_id"], r["rel"], r["score"])
            for r in rows
        ] == want, f"q_id {qid}"


def test_mmr_demotes_redundant_passage(spark):
    """d1 highly relevant (cos 0.9), d2 an exact duplicate direction of
    d1, d3 moderately relevant (cos 0.6) but diverse vs d1 (sim 0.54).
    Pure top-2 = {d1, d2}; MMR at λ=0.5 picks d1 then d3: the
    duplicate scores 0.5·0.9 − 0.5·1.0 = −0.05, the diverse doc
    0.5·0.6 − 0.5·0.54 = +0.03."""
    e1 = [1.0, 0.0, 0.0, 0.0]
    d1 = [0.9, 0.4358898943540674, 0.0, 0.0]  # unit: cos(q)=0.9
    rows = [
        (100, e1),                      # the query
        (1, d1),                        # d1: rel 0.9
        (2, [x * 2.0 for x in d1]),     # d2: duplicate direction of d1
        (3, [0.6, 0.0, 0.8, 0.0]),      # d3: rel 0.6, sim(d1)=0.54
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") == 100)
    out = S.mmr_rerank(emb, q, k=2, pool=3, lam=0.5).collect()
    picked = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert picked == [1, 3], picked
    # while pure top-k would have returned the duplicate:
    topk = S.ann_bruteforce(emb, q, k=2).collect()
    assert sorted(r["vec_id"] for r in topk) == [1, 2]


def test_mmr_plan_arrow_grouped_no_collect(spark):
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    df = S.mmr_rerank(emb, q, k=5, pool=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # Arrow-batched grouped pass
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan
