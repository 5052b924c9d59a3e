"""Aho–Corasick dictionary matching: count occurrences of a large term
list over the corpus in ONE text pass (Aho & Corasick 1975) — the
many-keyword engine behind PII/blocklist scrubbing, brand-safety
filters, and gazetteer entity tagging at corpus scale.

Reference tie: the reference filters logs by fixed template/keyword
matching (src/db/pattern_ops.py's template extraction is its closest
term-lookup surface); this module and curation.py's
sensitive_term_scrub are the north-star generalizations — and where
the scrub regex-scans per term (fine for 5 terms, quadratic pain for a
50k-entry gazetteer), the automaton makes the scan O(text + matches)
regardless of dictionary size.

Pinned semantics: matches count at EVERY ending position, INCLUDING
overlaps and nested terms (dictionary {"aba"} over "ababa" → 2;
{"a", "aa"} over "aaa" → 3 + 2) — the output function follows suffix
links, so a position reports every dictionary term ending there. Case
sensitive, byte-free (operates on str code points).

Scale shape: the automaton builds DRIVER-SIDE from the term list
(linear in total term length — a 50k-term gazetteer is milliseconds)
and rides to executors as a broadcast-sized closure; matching is an
Arrow-batched pandas UDF, one pass per document, zero shuffle until the
tiny (term)-grain aggregate. The per-doc match map explodes to
(doc, term, n) rows only for terms that actually hit.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_automaton(terms: list[str]) -> dict:
    """Goto/fail/output tables as plain dicts (picklable for the UDF
    closure). Node 0 is the root; ``out`` maps node -> tuple of term
    indices ending there (suffix-link outputs pre-merged, so matching
    never walks fail links at scan time)."""
    if not terms or any(not t for t in terms):
        raise ValueError("terms must be non-empty strings")
    goto: list[dict[str, int]] = [{}]
    out: list[list[int]] = [[]]
    for ti, term in enumerate(terms):
        node = 0
        for ch in term:
            nxt = goto[node].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[node][ch] = nxt
            node = nxt
        out[node].append(ti)
    fail = [0] * len(goto)
    q: deque[int] = deque()
    for ch, nxt in goto[0].items():
        q.append(nxt)
    while q:
        node = q.popleft()
        for ch, nxt in goto[node].items():
            q.append(nxt)
            f = fail[node]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != nxt else 0
            out[nxt].extend(out[fail[nxt]])
        # nothing else: root's children keep fail = 0
    return {
        "goto": goto,
        "fail": fail,
        "out": [tuple(o) for o in out],
        "terms": list(terms),
    }


def scan_text(text: str, auto: dict) -> dict[int, int]:
    """Occurrence count per term index — every ending position counts
    (overlaps and nested terms included via the merged outputs)."""
    goto, fail, out = auto["goto"], auto["fail"], auto["out"]
    counts: dict[int, int] = {}
    node = 0
    for ch in text:
        while node and ch not in goto[node]:
            node = fail[node]
        node = goto[node].get(ch, 0)
        for ti in out[node]:
            counts[ti] = counts.get(ti, 0) + 1
    return counts


def dictionary_match_counts(
    documents: DataFrame, terms: list[str]
) -> DataFrame:
    """Corpus totals per dictionary term: (term, n_docs, n_occurrences)
    from one Aho–Corasick pass per document."""
    auto = build_automaton(terms)

    @F.pandas_udf("map<int,int>")
    def match(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: scan_text(t or "", auto))

    hits = (
        documents.select(
            "doc_id", F.explode(match(F.col("text"))).alias("ti", "n")
        )
        .groupBy("ti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_occurrences"),
        )
    )
    term_df = documents.sparkSession.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "ti int, term string"
    )
    # both sides are |terms|-sized here; no broadcast hint needed (and
    # the LEFT side of a left join cannot be the broadcast build side)
    return (
        term_df.join(hits, "ti", "left")
        .select(
            "term",
            F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
            F.coalesce("n_occurrences", F.lit(0))
            .cast("bigint")
            .alias("n_occurrences"),
        )
        .orderBy("term")
    )


# terms drawn from the synthetic corpus vocabulary, plus ones designed
# to exercise overlap/nesting in real text ("a" nests in several)
DICT_TERMS: tuple[str, ...] = (
    "scan", "table scan", "customer", "stream", "a", "agg", "batch",
    "fast", "slow query", "value table",
)


def dictionary_match_oracle_sql(
    terms: tuple[str, ...] = DICT_TERMS,
) -> str:
    """DuckDB twin: per term, count ALL ending positions by brute force
    (substr equality at every offset) — overlap-inclusive like the
    automaton, O(K·text) where the operator is O(text)."""
    # escape quotes: the default DICT_TERMS are quote-free, but the
    # parameter accepts arbitrary terms and must not break the oracle SQL
    values = ", ".join("('{}')".format(t.replace("'", "''")) for t in terms)
    return f"""
    WITH terms AS (SELECT * FROM (VALUES {values}) AS t(term)),
    hits AS (
        SELECT t.term, d.doc_id,
               len(list_filter(
                   range(1, len(d.text) - len(t.term) + 2),
                   i -> substr(d.text, CAST(i AS INT),
                               CAST(len(t.term) AS INT)) = t.term
               )) AS n
        FROM terms t, documents d
        WHERE len(d.text) >= len(t.term)
    )
    SELECT term,
           CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs,
           CAST(sum(n) AS BIGINT) AS n_occurrences
    FROM hits
    GROUP BY term
    ORDER BY term
    """
