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


def test_containment_exact_threshold_prefix_bound(spark):
    """r7-ADVICE regression (dedup.py prefix bound): doc A with exactly
    5 shingles, 4 of them contained in B → containment exactly 0.8. The
    float form ⌊(1.0−0.8)·5⌋+1 = ⌊0.9999…⌋+1 = 1 made A's prefix a
    single shingle — its RAREST, which is precisely the doc-unique one
    that is NOT in B — so the candidate join silently missed the pair
    (B's prefix misses too: its two rarest are its own unique
    shingles). The exact-integer bound n_sh − ⌈t·n_sh⌉ + 1 = 2 restores
    the pigeonhole guarantee."""
    a = "w1 w2 w3 w4 w5 w6 u1"  # 5 shingles, last one unique to A
    b = "w1 w2 w3 w4 w5 w6 z1 z2"  # shares 4 of A's 5; 2 unique
    docs = spark.createDataFrame(
        [(0, a, "s"), (1, b, "s")],
        "doc_id long, text string, source string",
    )
    rows = shingle_containment_pairs(docs, threshold=0.8).collect()
    assert len(rows) == 1, "exact-threshold pair must not be pruned"
    r = rows[0]
    assert (r["d1"], r["d2"]) == (0, 1)
    assert r["cont_ab"] == 0.8  # 4/5 exactly at the threshold
    assert r["cont_ba"] == round(4 / 6, 4)


def test_containment_filter_is_unrounded(spark):
    """Companion regression: the qualifying filter compares UNROUNDED
    containment. 7/9 = 0.77777… rounds to 0.7778 at 4 dp, so the old
    round-then-compare filter admitted the pair at t=0.7778 even though
    true containment is below t; the unrounded filter (and the matching
    oracle) excludes it."""
    shared = " ".join(f"c{i}" for i in range(9))  # 7 internal shingles
    a = shared + " u1 u2"  # 11 words -> 9 shingles, 7 shared
    b = shared + " v1 v2 v3 v4 v5"  # 14 words -> 12 shingles
    docs = spark.createDataFrame(
        [(0, a, "s"), (1, b, "s")],
        "doc_id long, text string, source string",
    )
    # cont_ab = 7/9 = 0.77777… < 0.7778 (but rounds TO 0.7778);
    # cont_ba = 7/12 = 0.5833. Neither qualifies.
    assert shingle_containment_pairs(docs, threshold=0.7778).count() == 0
    # sanity: a hair below the true value, the pair appears
    assert shingle_containment_pairs(docs, threshold=0.7777).count() == 1


def test_containment_symmetric_on_identical_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h", "s"), (1, "a b c d e f g h", "s")],
        "doc_id long, text string, source string",
    )
    r = shingle_containment_pairs(docs, threshold=0.99).collect()
    assert len(r) == 1 and r[0]["cont_ab"] == 1.0 and r[0]["cont_ba"] == 1.0
