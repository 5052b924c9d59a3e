"""IR effectiveness report (recall/MRR/nDCG vs phrase pseudo-qrels) —
rehearsed r11 catalog candidate `retrieval_eval_report`."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from logstream_processing_service_spark.operators.retrieval import (
    retrieval_eval_report,
    retrieval_eval_oracle_sql,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_retrieval_eval_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "retrieval_eval_report",
        lambda s, sf: retrieval_eval_report(load_table(s, sf, "documents")),
        retrieval_eval_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_perfect_and_empty_qrels(spark):
    """Planted corpus, queries=('alpha beta', 'zzz yyy'):
    - 'alpha beta' appears verbatim in docs 1-2 only -> n_rel=2; both
      systems retrieve both in the top-10 of a 4-doc corpus, so
      recall=1.0 and (with the relevant docs at ranks 1-2) ndcg=1.0
      and mrr=1.0 for both systems.
    - 'zzz yyy' appears nowhere -> if it still RANKS docs (single
      shared token absent => no candidates at all), the (system,
      query) row is absent — matching the oracle's hits-derived grain.
    """
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "x alpha beta y z"),
        (3, "alpha gamma beta x"),  # both terms, NOT the phrase
        (4, "unrelated words only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval_eval_report(
        docs, queries=("alpha beta", "zzz yyy"), k=10
    ).collect()
    assert {r["system"] for r in out} == {"bm25", "prox"}
    assert all(r["query_id"] == 0 for r in out)  # zzz yyy: no candidates
    for r in out:
        assert r["n_rel"] == 2
        assert r["recall_at_k"] == 1.0
        assert r["mrr"] == 1.0
    # the PROXIMITY system must put the phrase docs at ranks 1-2 (doc 3
    # has both terms scattered -> min_dist 2 vs 1), so its ndcg is 1.0
    prox = [r for r in out if r["system"] == "prox"][0]
    assert prox["ndcg"] == 1.0


def test_rerank_beats_bm25_on_phrase_recall(spark):
    """The quantified second-stage win: BM25's length normalization
    puts a SHORT doc with the terms scattered (distance 7) at rank 1;
    the verbatim-phrase doc is longer and ranks 2. The proximity term
    (0.5 for adjacency vs 0.125 at distance 7) outweighs the ~0.15
    length-norm gap and promotes the phrase doc to rank 1 — prox MRR
    1.0 vs bm25 MRR 0.5, measured, not asserted by construction."""
    rows = [
        (1, "alpha x1 x2 x3 x4 x5 x6 beta"),
        (2, "alpha beta p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = retrieval_eval_report(docs, queries=("alpha beta",), k=3).collect()
    m = {r["system"]: r for r in out}
    assert m["bm25"]["n_rel"] == 1  # only doc 2 has the phrase
    assert m["bm25"]["mrr"] == 0.5  # rank 1 is the scattered doc
    assert m["prox"]["mrr"] == 1.0  # proximity promotes the phrase doc
    assert m["prox"]["ndcg"] == 1.0
