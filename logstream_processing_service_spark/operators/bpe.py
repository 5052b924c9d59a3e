"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
the GPT-2 byte-pair flavor of Radford et al. 2019) — the "train a
tokenizer on the corpus" job every LLM data pipeline runs before
anything else touches token budgets.

The reference counts tokens with a fixed heuristic (SURVEY §2 token
counting); this module LEARNS the merge table from the corpus itself and
then encodes with it, so token-budget numbers reflect the corpus's own
distribution.

Scale design — the whole point:

* Training never iterates over the corpus. One pass pretokenizes and
  builds the (word, count) frequency table; every merge iteration runs
  over DISTINCT words only (~1M rows for a 100 TB web corpus — a table
  that fits in one executor's memory but stays distributed here). This
  is the same factorization every production BPE trainer
  (subword-nmt, HuggingFace tokenizers) uses, re-expressed in Spark.
* Each iteration is two tiny jobs on the persisted word table: an
  adjacent-pair count (explode of zipped slices, map-side combined) and
  a 1-row argmax collect; then an in-row fold applies the merge. Lineage
  is truncated with localCheckpoint so iteration k doesn't replay 1..k-1.
* Encoding re-uses the factorization: encode each DISTINCT word once
  (Arrow-batched pandas UDF over the word table), then join the
  per-word token counts back to the doc grain. The join is a plain
  equi-join on word — AQE broadcasts when the vocabulary is small.

Merge semantics (pinned, and mirrored exactly by the pure-Python
reference in tests/test_bpe.py): pair counts include overlapping
occurrences; the winning pair is (max count, then lexicographically
smallest (left, right)); applying a merge is a single leftmost-greedy
left-to-right fold (a token created by this pass never re-merges as the
right element, and no new occurrence of the same pair can be created by
the pass — the fold IS the fixpoint). Encoding applies the learned
merges sequentially in rank order, which reproduces training exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textanalysis import GPT2_PRETOKEN_RE


@dataclass(frozen=True)
class Merge:
    rank: int
    left: str
    right: str
    pair_count: int


def word_frequency_table(documents: DataFrame) -> DataFrame:
    """(word, n): GPT-2 pretokenizer segments with corpus frequencies —
    the ONE corpus pass training needs. Whitespace runs are segments too
    (GPT-2 folds the leading space into the token)."""
    return (
        documents.select(
            F.explode(
                F.regexp_extract_all("text", F.lit(GPT2_PRETOKEN_RE), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _chars(name: str) -> Column:
    # split('', word) emits no empty trailing element only on some Spark
    # versions; the substring transform is unambiguous
    return F.expr(
        f"transform(sequence(1, length({name})), i -> substring({name}, i, 1))"
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Leftmost-greedy single-pass merge of adjacent (left, right) → one
    in-row fold, guarded so words without the left symbol skip the fold."""
    merged = F.array(F.lit(left + right))
    folded = F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(F.array_contains(syms, left), folded).otherwise(syms)


def bpe_train(
    documents: DataFrame,
    num_merges: int = 40,
    min_pair_count: int = 2,
) -> list[Merge]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the ranked
    merge list (the tokenizer model — KBs, a driver-side artifact like a
    k-means codebook)."""
    spark = documents.sparkSession
    wf = (
        word_frequency_table(documents)
        .select("n", _chars("word").alias("syms"))
        .localCheckpoint(eager=True)
    )
    # every iteration shuffles a vocabulary-sized frame (KB–MB); under a
    # vanilla 200-partition session that is 200 near-empty reduce tasks
    # per merge — drop to a handful for the loop, restore after
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        merges, wf = _train_loop(wf, num_merges, min_pair_count)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    wf.unpersist()
    return merges


def _train_loop(
    wf: DataFrame, num_merges: int, min_pair_count: int
) -> tuple[list[Merge], DataFrame]:
    merges: list[Merge] = []
    for rank in range(num_merges):
        pairs = (
            wf.select(
                "n",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1).collect()
        if not best or best[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append(Merge(rank, a, b, cnt))
        old = wf
        wf = wf.select("n", _apply_merge(F.col("syms"), a, b).alias("syms")
                       ).localCheckpoint(eager=True)
        old.unpersist()
    return merges, wf


def merges_df(spark: SparkSession, merges: list[Merge]) -> DataFrame:
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.pair_count) for m in merges],
        "rank int, left string, right string, pair_count bigint",
    )


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: apply merges sequentially in rank order with the
    same leftmost-greedy fold as training (training/encoding parity by
    construction). Used inside the Arrow batch UDF and by the tests."""
    syms = list(word)
    for left, right in merges:
        if left not in syms:
            continue
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def bpe_token_counts(
    documents: DataFrame, merges: list[Merge]
) -> DataFrame:
    """Per-document token counts under the learned tokenizer, plus the
    pretoken segment count for compression-ratio auditing.

    Scale shape: encode each DISTINCT word once (Arrow-batched UDF over
    the word table — the merge list rides along as a closure, KBs), then
    one equi-join of (doc_id, word) against the encoded vocabulary and a
    doc-grain sum. Three shuffles total, none carrying text bodies."""
    ranked = [(m.left, m.right) for m in sorted(merges, key=lambda m: m.rank)]

    @F.pandas_udf("bigint")
    def n_tokens(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(encode_word(w, ranked)))

    doc_words = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all("text", F.lit(GPT2_PRETOKEN_RE), 0)
        ).alias("word"),
    )
    vocab = (
        doc_words.select("word").distinct()
        .withColumn("word_tokens", n_tokens(F.col("word")))
    )
    return (
        doc_words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("word_tokens").alias("bpe_tokens"),
            F.count(F.lit(1)).alias("pretoken_segments"),
        )
        .orderBy("doc_id")
    )
