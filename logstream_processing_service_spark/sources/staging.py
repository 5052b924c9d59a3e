"""Format-diverse staging sources/sinks: JSON-lines and ORC siblings of the
CSV staging round trip (pipelines.py S4/S5).

Why three formats: CSV mirrors the reference's staging serialization
(arrays JSON-encoded into a string column); JSONL carries nested types
(arrays, structs) natively and is the interchange format most ingestion
pipelines speak; ORC/parquet are the columnar formats a 100 TB staging
area actually uses (column pruning + predicate pushdown + splittable
compression — a JSONL staging area at that scale re-parses every byte of
every row on every read).

All writers are directory sinks (one file per task — parallel write, no
driver funnel); all readers take an explicit schema so a corrupt staging
area fails loudly instead of silently inferring wrong types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stage_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines staging sink: nested columns (arrays, structs) serialize
    natively — no to_json/from_json round trip needed."""
    df.write.mode("overwrite").json(path)


def read_staged_jsonl(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """JSON-lines staging scan with an enforced schema (no inference pass:
    inference reads the whole area twice and guesses types)."""
    return spark.read.schema(schema).json(path)


def stage_orc(df: DataFrame, path: str) -> None:
    """ORC staging sink: columnar + splittable, for staging areas that are
    re-read selectively (pruned scans) rather than replayed whole."""
    df.write.mode("overwrite").orc(path)


def read_staged_orc(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """ORC staging scan; ORC files carry their schema, so it is optional
    (pass one to assert shape at the boundary)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
