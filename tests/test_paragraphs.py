"""Paragraph-grain dedup: newline segmentation semantics on a fixture with
real multi-paragraph documents (the synthetic corpus is single-line, so the
catalog query exercises block mode; this covers the newline path)."""

from __future__ import annotations

from logstream_processing_service_spark.operators import dedup as D


def test_paragraph_dedup_newline_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (0, "intro para\n\nshared footer"),
            (1, "unique text\nshared footer"),
            (2, "shared footer"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in D.paragraph_dedup(docs, mode="newline").collect()
    }
    # doc 0 holds the first occurrence of the shared paragraph -> no dups
    assert rows[0] == {
        "doc_id": 0, "n_paras": 2, "n_dup_paras": 0, "dup_para_frac": 0.0
    }
    assert rows[1] == {
        "doc_id": 1, "n_paras": 2, "n_dup_paras": 1, "dup_para_frac": 0.5
    }
    assert rows[2] == {
        "doc_id": 2, "n_paras": 1, "n_dup_paras": 1, "dup_para_frac": 1.0
    }


def test_paragraph_dedup_block_short_doc_single_block(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in D.paragraph_dedup(docs, mode="block", block_words=10).collect()
    }
    assert rows[0]["n_paras"] == 1 and rows[0]["n_dup_paras"] == 0
    # identical short doc is a duplicate paragraph of doc 0's single block
    assert rows[1]["n_dup_paras"] == 1
    # empty doc still yields exactly one (empty) paragraph
    assert rows[2]["n_paras"] == 1
