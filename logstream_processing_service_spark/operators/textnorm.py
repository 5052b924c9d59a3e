"""Unicode text normalization for crawl curation: NFKC folding
(fullwidth forms, compatibility chars), zero-width stripping
(ZWSP/ZWNJ/ZWJ/BOM), NBSP→space, whitespace collapse — the cleanup
pass every web corpus needs before tokenization (mojibake-adjacent
noise inflates vocabularies and splits duplicate detection).

Synthetic-lane discipline: the corpus is clean ASCII, so
``with_noisy_text`` deterministically injects REVERSIBLE noise per
word index j — fullwidth forms (j%5==1, NFKC reverses), a leading
zero-width space (j%5==2, stripped), an NBSP separator (j%5==3, NFKC
maps to space), a doubled space (j%5==4, collapsed). Because every
injection is exactly undone by the normalizer, the DuckDB oracle is
CLOSED-FORM: the normalized text must equal the ORIGINAL text
(md5-compared), and the removed-character count follows from word
count arithmetic alone. A hash match therefore proves the whole
normalize pipeline byte-exactly without DuckDB doing any Unicode work.

The normalizer is an Arrow-batched pandas UDF (Python's unicodedata is
the NFKC implementation; there is no JVM-side NFKC expression) — the
sanctioned slow-path shape: per-row, zero shuffle, vectorized batches.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ZERO_WIDTH = re.compile("[\u200b\u200c\u200d\ufeff]")
_WS = re.compile(r"\s+")


def normalize_string(s: str) -> str:
    """NFKC → strip zero-width → collapse whitespace → trim."""
    s = unicodedata.normalize("NFKC", s)
    s = _ZERO_WIDTH.sub("", s)
    return _WS.sub(" ", s).strip()


def with_noisy_text(documents: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic reversible noise injected."""

    def inject_one(text: str) -> str:
        words = text.split(" ")
        parts: list[str] = []
        for j, w in enumerate(words):
            r = j % 5
            if r == 1:
                w = "".join(
                    chr(ord(c) + 0xFEE0) if 0x21 <= ord(c) <= 0x7E else c
                    for c in w
                )
            elif r == 2:
                w = "\u200b" + w
            if j > 0:
                parts.append("\u00a0" if r == 3 else ("  " if r == 4 else " "))
            parts.append(w)
        return "".join(parts)

    @F.pandas_udf("string")
    def inject(texts: pd.Series) -> pd.Series:
        return texts.map(inject_one)

    return documents.select("doc_id", inject(F.col("text")).alias("text"))


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, norm_md5, changed, n_removed): md5 of the normalized
    text, whether normalization changed anything, and how many
    characters it removed (zero-width strips + whitespace collapses;
    NFKC folds are 1:1 on these forms)."""

    @F.pandas_udf("string")
    def norm(texts: pd.Series) -> pd.Series:
        return texts.map(normalize_string)

    t = F.col(text_col)
    n = norm(t)
    return df.select(
        "doc_id",
        F.md5(n).alias("norm_md5"),
        (n != t).alias("changed"),
        (F.length(t) - F.length(n)).cast("bigint").alias("n_removed"),
    )


def normalize_text_oracle_sql() -> str:
    """Closed-form twin over the noisy lane: normalization must recover
    the ORIGINAL text exactly (md5 equality), `changed` is true iff the
    doc has ≥ 2 words (word index 1 always takes the fullwidth
    injection), and n_removed = |{j in 1..n−1 : j%5==2}| (zero-width
    strips) + |{j : j%5==4}| (doubled-space collapses) — pure word-count
    arithmetic, no Unicode touched on this side."""
    return """
    SELECT doc_id,
           md5(text) AS norm_md5,
           len(string_split(text, ' ')) >= 2 AS changed,
           CAST(
               len(list_filter(range(1, len(string_split(text, ' '))),
                               j -> j % 5 = 2))
               + len(list_filter(range(1, len(string_split(text, ' '))),
                                 j -> j % 5 = 4))
               AS BIGINT) AS n_removed
    FROM documents
    ORDER BY doc_id
    """
