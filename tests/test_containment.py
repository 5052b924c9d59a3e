"""Shingle-set containment pairs (Broder's asymmetric resemblance) —
r8 catalog candidate `dedup_containment`. The DuckDB twin reuses the
portable 48-bit shingle hashes with the same df-cap; a planted
quote-inclusion fixture pins the semantic difference from Jaccard and
from exact substring containment."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.operators.dedup import (
    shingle_containment_oracle_sql,
    shingle_containment_pairs,
)
from logstream_processing_service_spark.sources import load_table

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_containment_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "dedup_containment",
        lambda s, sf: shingle_containment_pairs(
            load_table(s, sf, "documents")
        ).orderBy("d1", "d2"),
        shingle_containment_oracle_sql(),
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    """A 12-word note quoted (lightly edited prefix) inside a 120-word
    digest: containment of the note ≈ 1 while Jaccard ≈ |A|/|B| ≈ 0.1 —
    and the edit breaks exact substring containment."""
    note = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(36))
    digest = filler + " " + note  # quoted wholesale at the end
    edited_note = "ALPHA " + note.split(" ", 1)[1]  # first word edited
    docs = spark.createDataFrame(
        [(0, edited_note, "src0"), (1, digest, "src0")],
        "doc_id long, text string, source string",
    )
    rows = shingle_containment_pairs(docs, threshold=0.5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d1"], r["d2"]) == (0, 1)
    # 10 shingles from the note survive in doc 0 (one word edited kills
    # the first shingles) out of 10 total -> high containment of A in B
    assert r["cont_ab"] >= 0.8
    # the reverse direction is diluted by the digest's size
    assert r["cont_ba"] <= 0.15

    from logstream_processing_service_spark.operators.dedup import (
        ngram_jaccard_pairs,
        substring_containment_pairs,
    )

    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    assert substring_containment_pairs(docs).count() == 0  # edit broke it


def test_containment_symmetric_on_identical_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h", "s"), (1, "a b c d e f g h", "s")],
        "doc_id long, text string, source string",
    )
    r = shingle_containment_pairs(docs, threshold=0.99).collect()
    assert len(r) == 1 and r[0]["cont_ab"] == 1.0 and r[0]["cont_ba"] == 1.0
