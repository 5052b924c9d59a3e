"""Streaming search index: batch-twin equality, replay idempotence,
incremental freshness."""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return {(r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in df.collect()}


def test_index_equals_full_corpus_and_replay_idempotent(spark, tmp_path):
    from logstream_processing_service_spark.operators.retrieval import bm25_topk
    from logstream_processing_service_spark.streaming.search_index import (
        bm25_from_index,
        index_sink,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "idx")
    sink = index_sink(out)
    for b in range(3):
        sink(docs.filter(F.col("doc_id") % 3 == b), b)
    got = _rows(bm25_from_index(spark, out))
    want = _rows(bm25_topk(docs))
    assert got == want
    # replaying batch 1 (crash-recovery) changes nothing
    sink(docs.filter(F.col("doc_id") % 3 == 1), 1)
    assert _rows(bm25_from_index(spark, out)) == want


def test_index_is_incrementally_fresh(spark, tmp_path):
    """After only 2 of 3 batches the index serves exactly the 2-batch
    corpus — stats (N, avgdl, df) track ingested documents, not stale
    snapshots."""
    from logstream_processing_service_spark.operators.retrieval import bm25_topk
    from logstream_processing_service_spark.streaming.search_index import (
        bm25_from_index,
        index_sink,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "idx2")
    sink = index_sink(out)
    sink(docs.filter(F.col("doc_id") % 3 == 0), 0)
    sink(docs.filter(F.col("doc_id") % 3 == 1), 1)
    partial = docs.filter(F.col("doc_id") % 3 != 2)
    assert _rows(bm25_from_index(spark, out)) == _rows(bm25_topk(partial))
