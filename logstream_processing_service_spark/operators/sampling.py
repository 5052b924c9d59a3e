"""Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB curation job cannot use ``rand()`` for its train/test split: the
split must be (a) reproducible run-to-run, (b) stable when the table is
re-partitioned or incrementally extended, and (c) computable engine-side
with no shuffle. The standard trick is a keyed hash split: bucket every row
by a cryptographic hash of its stable key + a salt, and threshold the hash.

We threshold the md5 hex string LEXICOGRAPHICALLY (``md5 < '1a...'``): md5
is identical in every engine (unlike xxhash64/murmur, whose seeds differ
between Spark and DuckDB), so the split is portable and the DuckDB oracle
can verify it bit-for-bit. A 2-hex-char threshold gives fraction k/256.

The reference has no sampling/splitting at all (its "sample" is
``LIMIT 2000``, scripts/validate_quality.py:68 — biased by storage order);
this module is part of the north-star training-pipeline surface.

Scale shape: one narrow projection + a hash per row, fully codegen'd
JVM-side, no exchange; the split predicate pushes through to any downstream
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_bucket(key_col: str, salt: str = "split-v1") -> F.Column:
    """The portable bucketing hash: md5(salt ':' key) hex string."""
    return F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    test_threshold_hex: str = "1a",  # 26/256 ≈ 10.2% test
    salt: str = "split-v1",
) -> DataFrame:
    """Label every row 'test' or 'train' by stable keyed hash.

    Changing ``salt`` re-draws the split; extending the table never moves
    an existing row between splits (the property rand() cannot give you).
    """
    return df.withColumn(
        "split",
        F.when(split_bucket(key_col, salt) < test_threshold_hex, "test").otherwise(
            "train"
        ),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_hex: dict[str, str],
    default_hex: str = "00",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible ``sampleBy``).

    ``fractions_hex`` maps stratum value -> 2-hex-char threshold (k/256 of
    that stratum kept). Rows of unlisted strata use ``default_hex`` ('00' =
    drop). The threshold lookup is a tiny CASE chain — no join, no shuffle,
    the sample predicate is evaluated at scan time.
    """
    bucket = split_bucket(key_col, salt)
    thresh = F.lit(default_hex)
    for value, hx in sorted(fractions_hex.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(hx)).otherwise(thresh)
    return df.filter(bucket < thresh)


def split_summary(df: DataFrame, key_col: str, strata_col: str) -> DataFrame:
    """Split-balance audit: row counts per (split, stratum) — the query a
    curation pipeline runs to confirm the split didn't skew a class."""
    return (
        deterministic_split(df, key_col)
        .groupBy("split", strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", strata_col)
    )


def sample_oracle_case(
    strata_col: str, fractions_hex: dict[str, str], default_hex: str = "00"
) -> str:
    """Generate the oracle's CASE expression from the same fractions dict
    the Spark side uses, so the two cannot drift."""
    arms = "".join(
        f"WHEN {strata_col} = '{v}' THEN '{hx}' "
        for v, hx in sorted(fractions_hex.items(), reverse=True)
    )
    return f"CASE {arms}ELSE '{default_hex}' END"
