"""WordPiece tokenizer — r8 catalog candidate `wordpiece_token_counts`
(rows-only: trained vocabulary, like the BPE/unigram lanes). The
hand-computable fixture pins the likelihood score and its tie order;
property pins relate the three tokenizer families on the real corpus."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.wordpiece import (
    _train_in_memory,
    wordpiece_encode,
    wordpiece_token_counts,
    wordpiece_train,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR


def test_hand_computed_merge_order():
    """words 'ab'x4, 'abc'x2. Initial symbols a:6, ##b:6, ##c:2; pairs
    (a,##b):6 -> 6/36 = 1/6 and (##b,##c):2 -> 2/12 = 1/6 — a TIE that
    the lexicographic rule resolves to ('##b','##c') ('#' < 'a'). After
    that merge, (a,##b):4 -> 4/24 = 1/6 ties (a,##bc):2 -> 2/12 = 1/6,
    resolved to ('a','##b'). So the first two products are '##bc' then
    'ab' — likelihood scoring visibly diverging from BPE, whose raw
    counts would pick (a,##b):6 first."""
    vocab = _train_in_memory([("ab", 4), ("abc", 2)], num_merges=2,
                             min_pair_count=1)
    assert "##bc" in vocab and "ab" in vocab
    # and the one-merge prefix is exactly {initial} + ##bc
    v1 = _train_in_memory([("ab", 4), ("abc", 2)], num_merges=1,
                          min_pair_count=1)
    assert "##bc" in v1 and "ab" not in v1


def test_greedy_longest_match_encode():
    vocab = {"a", "##b", "##c", "##bc", "ab"}
    assert wordpiece_encode("abc", vocab) == ["ab", "##c"]
    assert wordpiece_encode("ab", vocab) == ["ab"]
    assert wordpiece_encode("abq", vocab) == ["[UNK]"]  # whole-word UNK
    assert wordpiece_encode("a", vocab) == ["a"]


def test_corpus_counts_and_family_ordering(spark):
    """On the training corpus: zero UNK (every char was seen), and the
    family ordering pretokens <= wordpiece tokens <= chars holds per
    document (a trained vocab never splits below characters and never
    merges across pretoken boundaries)."""
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.textanalysis import (
        GPT2_PRETOKEN_RE,
    )

    docs = load_table(spark, SF_DIR, "documents")
    vocab = wordpiece_train(docs, num_merges=128, min_word_count=2)
    out = wordpiece_token_counts(docs, vocab)
    base = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(GPT2_PRETOKEN_RE), 0)
        ).cast("bigint").alias("pretoks"),
        F.length("text").cast("bigint").alias("chars"),
    )
    j = out.join(base, "doc_id").collect()
    assert len(j) == 500
    for r in j:
        assert r["n_unk"] == 0, r
        assert r["pretoks"] <= r["wp_tokens"] <= r["chars"], r


def test_unseen_character_is_unk(spark):
    docs = spark.createDataFrame(
        [(0, "aa ab aa ab", "s")], "doc_id long, text string, source string"
    )
    vocab = wordpiece_train(docs, num_merges=4, min_pair_count=1)
    q = spark.createDataFrame(
        [(1, "aa zz", "s")], "doc_id long, text string, source string"
    )
    r = wordpiece_token_counts(q, vocab).first()
    assert r["n_unk"] == 1  # 'zz' has unseen chars -> one [UNK] pretoken
