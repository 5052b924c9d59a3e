"""ANN recall report — r8 catalog candidate `ann_recall_report`
(rows-only): the accuracy dashboard for the ANN family, floors pinned."""

from __future__ import annotations

from logstream_processing_service_spark.queries_vector import (
    q_ann_recall_report,
)

from .conftest import SF_DIR, SF_DIR_ORACLE


def test_recall_floors_both_sfs(spark):
    for sf in (SF_DIR, SF_DIR_ORACLE):
        rows = {r["method"]: r for r in q_ann_recall_report(spark, sf).collect()}
        assert rows["bruteforce"]["recall_at_k"] == 1.0
        # the nprobe ladder must be monotone and end high
        r2 = rows["ivf_nprobe2"]["recall_at_k"]
        r4 = rows["ivf_nprobe4"]["recall_at_k"]
        r8 = rows["ivf_nprobe8"]["recall_at_k"]
        assert r2 <= r4 <= r8, rows
        assert r2 >= 0.25 and r4 >= 0.5 and r8 >= 0.85, rows
        assert rows["hnsw_ef60"]["recall_at_k"] >= 0.85, rows
        assert all(r["n_queries"] == 20 and r["k"] == 10 for r in rows.values())
