"""Cross-engine parity rehearsal for TextRank — the r7 catalog
candidate. The DuckDB twin unrolls the weighted power iteration into
chained CTEs (the part_pagerank pattern) and must hash-match the Spark
operator through the SAME harness the driver uses. If the long float
in-mass sums ever diverge in the last ulp (more neighbors per node than
part_pagerank's graph), this test localizes it BEFORE a driver slot is
spent; the fix would be integer-scaled shares (the cusum recipe).
"""

from __future__ import annotations

from logstream_processing_service_spark.operators.textanalysis import (
    textrank_oracle_sql,  # hoisted to the package for the r7 catalog slot
)

from .conftest import SF_DIR
from .oracle_harness import compare_one, duckdb_conn

def test_textrank_hash_matches_duckdb_oracle(spark):
    """Full driver-harness comparison (row count + schema + value hash)
    at the same SF the driver uses."""
    from logstream_processing_service_spark.operators.textanalysis import (
        textrank_keywords,
    )

    con = duckdb_conn(SF_DIR)
    r = compare_one(
        spark,
        con,
        "textrank_keywords",
        lambda s, sf: textrank_keywords(
            s.read.parquet(f"{sf}/documents.parquet")
        ),
        textrank_oracle_sql(),
        SF_DIR,
    )
    assert r["status"] == "OK", r
