"""JSONL / ORC staging round trips, including nested array columns and
schema enforcement."""

from __future__ import annotations

from logstream_processing_service_spark.sources.staging import (
    read_staged_jsonl,
    read_staged_orc,
    stage_jsonl,
    stage_orc,
)
from logstream_processing_service_spark.sources.tables import load_table

SCHEMA = "vec_id bigint, label bigint, embedding array<float>"


def _sample(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").limit(50).select(
        "vec_id", "label", "embedding"
    )


def _rows(df):
    return sorted(
        (r["vec_id"], r["label"], [round(x, 5) for x in r["embedding"]])
        for r in df.collect()
    )


def test_jsonl_round_trip_preserves_arrays(spark, sf_dir, tmpdir):
    df = _sample(spark, sf_dir)
    stage_jsonl(df, f"{tmpdir}/j")
    back = read_staged_jsonl(spark, f"{tmpdir}/j", SCHEMA)
    assert _rows(back) == _rows(df)


def test_orc_round_trip_preserves_arrays(spark, sf_dir, tmpdir):
    df = _sample(spark, sf_dir)
    stage_orc(df, f"{tmpdir}/o")
    back = read_staged_orc(spark, f"{tmpdir}/o")
    assert back.schema == df.schema
    assert _rows(back) == _rows(df)


def test_jsonl_string_schema_stringifies_nested(spark, sf_dir, tmpdir):
    """Reading a nested JSON field with a string schema yields its raw JSON
    text (Spark's documented stringification), so a staged array remains
    recoverable via from_json even under a downgraded schema."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType

    df = _sample(spark, sf_dir)
    stage_jsonl(df, f"{tmpdir}/j2")
    down = read_staged_jsonl(
        spark, f"{tmpdir}/j2", "vec_id bigint, label bigint, embedding string"
    )
    vals = [r["embedding"] for r in down.select("embedding").limit(5).collect()]
    assert all(isinstance(v, str) and v.startswith("[") for v in vals)
    back = down.withColumn(
        "embedding", F.from_json("embedding", ArrayType(FloatType()))
    )
    assert _rows(back) == _rows(df)
