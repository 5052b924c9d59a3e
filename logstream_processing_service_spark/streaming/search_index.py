"""Streaming incremental search index: foreachBatch maintenance of the
BM25 posting/doc-stat registry, and serving queries from the registry
alone.

Reference parity note: the reference has no search surface — its only
ranked lookup is nearest-centroid matching over embedded templates
(src/ml/vector_engine.py:18-30); the north-star pipeline needs
a ranked index that stays fresh as documents stream in. BM25's corpus
statistics (tf, dl, df, N, avgdl) are all ADDITIVE across disjoint
batches, so an index maintained batch-by-batch serves EXACTLY the same
ranking as a full-corpus rebuild — that equivalence is the correctness
contract (the catalog twin hash-matches the full-corpus BM25 oracle).

Scale: each micro-batch writes only ITS postings partition
(``_batch=<id>`` dynamic partition overwrite — replay-idempotent, the
same discipline as streaming/dedup.py); no read-modify-write of corpus
state. df/N/avgdl are computed at query time from the registry with two
aggregations over bounded-width frames — at 100 TB the registry is a
partitioned parquet table and those aggregates are the standard
pre-computable rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.retrieval import SEARCH_QUERIES, _bm25_term_score


def index_sink(out_dir: str):
    """foreachBatch sink: tokenize the batch, write its postings
    (doc_id, tok, tc) and doc lengths (doc_id, dl) under
    ``_batch=<batch_id>`` partitions. Replay-idempotent: re-running a
    batch overwrites exactly its own partition."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        toks = batch_df.select(
            "doc_id", F.explode(T.words(F.col("text"))).alias("tok")
        )
        tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tc"))
        dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        sc = spark.conf
        prev = sc.get("spark.sql.sources.partitionOverwriteMode", "static")
        sc.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                tf.withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("_batch")
                .parquet(f"{out_dir}/postings")
            )
            (
                dl.withColumn("_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("_batch")
                .parquet(f"{out_dir}/doclens")
            )
        finally:
            sc.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def bm25_from_index(
    spark: SparkSession,
    out_dir: str,
    queries: tuple[str, ...] = SEARCH_QUERIES,
    k: int = 10,
) -> DataFrame:
    """Serve BM25 top-k from the streamed registry alone — same scoring
    expression, same tie-break contract as operators/retrieval.bm25_topk,
    so the result is bit-equal to a full-corpus build over the union of
    all ingested batches."""
    tf = spark.read.parquet(f"{out_dir}/postings").drop("_batch")
    dl = spark.read.parquet(f"{out_dir}/doclens").drop("_batch")
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    from ..operators.retrieval import _query_terms

    qterms = _query_terms(spark, queries)
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(df_, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            _bm25_term_score(
                F.col("tc"), F.col("df"), F.col("dl"),
                F.col("n_docs"), F.col("avgdl"),
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score_raw"))
        .withColumn("score", F.round(F.col("score_raw"), 6))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
