"""WordPiece tokenizer (BERT-family): likelihood-scored merges +
greedy longest-match encoding — the third trained-tokenizer family
next to BPE (count-ranked merges, operators/bpe.py) and unigram-LM
(EM-pruned vocabulary, operators/unigram.py).

Algorithm (public: Schuster & Nakajima 2012 as popularized by BERT and
the HuggingFace tokenizers implementation): start from characters with
``##`` continuation prefixes on non-initial symbols; repeatedly merge
the adjacent pair maximizing score = pair_count / (left_count ·
right_count) — the pointwise likelihood gain, which prefers pairs whose
parts rarely occur apart (where BPE takes the raw count). Encoding is
NOT merge-replay (BPE) but greedy longest-prefix matching against the
final vocabulary, with a whole-word [UNK] on failure.

Scale shape: identical to bpe_train — ONE distributed pass builds the
guarded (word, n) table; the merge loop is driver-side over that
vocab-grain table (KB-scale model, the k-means-codebook pattern);
encoding runs once per DISTINCT word through an Arrow-batched UDF and
joins back to the doc grain.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


def wordpiece_train(
    documents: DataFrame,
    num_merges: int = 256,
    min_pair_count: int = 2,
    min_word_count: int = 1,
    max_vocab_rows: int = 5_000_000,
    max_vocab_chars: int = 256 << 20,
) -> list[str]:
    """Learn the WordPiece vocabulary; returns the sorted vocab list
    (initial symbols + merge products). Same driver-collect guard as
    bpe_train — raise ``min_word_count`` on web-scale hapax tails."""
    from .bpe import word_frequency_table

    wf = word_frequency_table(documents)
    if min_word_count > 1:
        wf = wf.filter(F.col("n") >= min_word_count)
    sizing = wf.agg(
        F.count(F.lit(1)).alias("rows"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("chars"),
    ).collect()[0]
    if sizing["rows"] > max_vocab_rows or sizing["chars"] > max_vocab_chars:
        raise ValueError(
            f"WordPiece vocabulary table has {sizing['rows']} rows / "
            f"{sizing['chars']} chars — exceeds the driver-collect guard. "
            "Raise min_word_count to trim the hapax tail (bpe_train's "
            "documented contract), or raise the guard."
        )
    word_counts = [(r["word"], int(r["n"])) for r in wf.collect()]
    return _train_in_memory(word_counts, num_merges, min_pair_count)


def _splits(word: str) -> list[str]:
    return [word[0]] + ["##" + c for c in word[1:]] if word else []


def _merge_symbol(a: str, b: str) -> str:
    return a + (b[2:] if b.startswith("##") else b)


def _train_in_memory(
    word_counts: list[tuple[str, int]],
    num_merges: int,
    min_pair_count: int,
) -> list[str]:
    """Per-iteration recompute trainer (the reference HF algorithm): the
    likelihood score couples every pair to its PARTS' global counts, so
    a merge invalidates scores across the whole table — recomputing the
    pair/symbol counts each round over the vocab-grain word list is the
    honest form (O(num_merges · vocab chars), driver-side by the same
    guard bpe_train carries; an incremental heap would have to reheap on
    every symbol-count change anyway). Ties break on the
    lexicographically smallest (left, right) — pinned, hand-computable.
    """
    words = [( _splits(w), n) for w, n in word_counts if w]
    vocab: set[str] = set()
    for syms, _ in words:
        vocab.update(syms)
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for syms, n in words:
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + n
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
        best = None
        for (a, b), c in pair_counts.items():
            if c < min_pair_count:
                continue
            score = c / (sym_counts[a] * sym_counts[b])
            key = (-score, a, b)
            if best is None or key < best:
                best = key
        if best is None:
            break
        _, a, b = best
        merged = _merge_symbol(a, b)
        vocab.add(merged)
        for i, (syms, n) in enumerate(words):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = merged
                else:
                    out.append(x)
            words[i] = (out, n)
    return sorted(vocab)


def wordpiece_encode(word: str, vocab: set[str]) -> list[str]:
    """BERT greedy longest-match-first; whole-word [UNK] on failure."""
    out: list[str] = []
    i = 0
    while i < len(word):
        j = len(word)
        prefix = "##" if i > 0 else ""
        while j > i:
            piece = prefix + word[i:j]
            if piece in vocab:
                out.append(piece)
                break
            j -= 1
        else:
            return [UNK]
        i = j
    return out


def wordpiece_token_counts(
    documents: DataFrame, vocab: list[str]
) -> DataFrame:
    """Per-document (wp_tokens, n_unk) under the trained vocabulary —
    the bpe_token_counts / unigram_token_counts shape: encode each
    DISTINCT pretoken once (Arrow UDF, KB-scale vocab closure), join
    back, sum."""
    from .textanalysis import GPT2_PRETOKEN_RE

    vset = set(vocab)

    @F.pandas_udf("struct<toks: bigint, unk: bigint>")
    def enc(ws: pd.Series) -> pd.DataFrame:
        def one(w: str) -> tuple[int, int]:
            pieces = wordpiece_encode(w, vset)
            unk = sum(1 for p in pieces if p == UNK)
            return len(pieces), unk

        res = ws.map(one)
        return pd.DataFrame(
            {"toks": res.map(lambda t: t[0]), "unk": res.map(lambda t: t[1])}
        )

    doc_words = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(GPT2_PRETOKEN_RE), 0)
        ).alias("word"),
    )
    per_word = (
        doc_words.select("word").distinct().withColumn("e", enc(F.col("word")))
    )
    return (
        doc_words.join(per_word, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("e.toks").cast("bigint").alias("wp_tokens"),
            F.sum("e.unk").cast("bigint").alias("n_unk"),
        )
        .orderBy("doc_id")
    )
