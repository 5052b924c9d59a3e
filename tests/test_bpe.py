"""BPE training/encoding parity vs a pure-Python reference implementation.

The distributed trainer iterates on the word-frequency table; the Python
twin consumes the SAME word table (pretokenization itself is parity-checked
against DuckDB by the subword_token_counts oracle) and re-implements pair
counting, argmax tie-break, and the leftmost-greedy merge fold with plain
dicts/lists. Merge-list equality is exact, per rank.
"""

from __future__ import annotations

from collections import Counter

from logstream_processing_service_spark.operators import bpe
from logstream_processing_service_spark.sources import load_table


def py_train(word_counts: dict[str, int], num_merges: int, min_pair_count: int):
    wf = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for syms, n in wf.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        new_wf: dict[tuple, int] = {}
        for syms, n in wf.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_wf[tuple(out)] = new_wf.get(tuple(out), 0) + n
        wf = new_wf
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wc = {
        r["word"]: r["n"]
        for r in bpe.word_frequency_table(docs).collect()
    }
    expected = py_train(wc, num_merges=24, min_pair_count=2)
    got = [
        (m.rank, m.left, m.right, m.pair_count)
        for m in bpe.bpe_train(docs, num_merges=24, min_pair_count=2)
    ]
    assert got == expected


def test_bpe_encode_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = bpe.bpe_train(docs, num_merges=16, min_pair_count=2)
    ranked = [(m.left, m.right) for m in merges]
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, merges).collect()
    }
    # python twin: re-encode every word of every doc via the word table
    import pyspark.sql.functions as F

    rows = docs.select(
        "doc_id",
        F.regexp_extract_all(
            "text", F.lit(bpe.GPT2_PRETOKEN_RE), 0
        ).alias("words"),
    ).collect()
    for r in rows:
        n = sum(len(bpe.encode_word(w, ranked)) for w in r["words"])
        assert got[r["doc_id"]] == n


def test_bpe_merge_fold_edge_cases(spark):
    """Leftmost-greedy semantics on pathological repeats, end to end."""
    docs = spark.createDataFrame(
        [(1, "aaaa abab"), (2, "the cat the hat"), (3, "thethe aaaa")],
        "doc_id bigint, text string",
    )
    m = bpe.bpe_train(docs, num_merges=6, min_pair_count=2)
    got = [(x.left, x.right, x.pair_count) for x in m]
    # hand-computed: overlap counting ("aaaa" has 3 (a,a) pairs), the
    # (h,e)/(t,h) tie at 4 breaking lexicographically, and the post-merge
    # re-count ((" ","a") drops to 1 once " aaaa" becomes [" ",aa,aa])
    assert got == [
        ("a", "a", 6),
        ("h", "e", 4),
        ("t", "he", 4),
        ("a", "b", 2),
        ("a", "t", 2),
        ("aa", "aa", 2),
    ]
    counts = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_token_counts(docs, m).collect()
    }
    assert counts == {1: 4, 2: 9, 3: 4}


def test_bpe_incremental_trainer_matches_naive_on_random_vocab():
    """The incremental (heap + affected-word) trainer is exactly the naive
    full-recount algorithm on a vocabulary two orders beyond the fuzzer's
    reach: 800 random words, 300 merges, including deep merge chains and
    count collisions that exercise the lazy-heap tie-break."""
    import random

    from logstream_processing_service_spark.operators.bpe import (
        _train_in_memory,
    )

    rng = random.Random(11)
    alphabet = "abcdef"
    vocab = {"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
             for _ in range(800)}
    word_counts = [(w, rng.randint(1, 50)) for w in sorted(vocab)]
    expected = py_train(dict(word_counts), num_merges=300, min_pair_count=2)
    got = [
        (m.rank, m.left, m.right, m.pair_count)
        for m in _train_in_memory(word_counts, 300, 2)
    ]
    assert got == expected
    assert len(got) == 300  # deep chains actually ran


def test_bpe_vocab_collect_guard(spark):
    """The driver-collect guard fails loudly and names the relief valve."""
    import pytest

    from logstream_processing_service_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="min_word_count"):
        bpe.bpe_train(docs, num_merges=4, max_vocab_rows=3)
    # min_word_count trims below the guard: words appear once each, so
    # min_word_count=2 empties the table and training returns no merges
    assert bpe.bpe_train(docs, num_merges=4, max_vocab_rows=3,
                         min_word_count=2) == []
