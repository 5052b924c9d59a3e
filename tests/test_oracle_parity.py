"""The correctness gate, locally: every catalog query with an oracle must
hash-match DuckDB on the oracle sf dir (sf0.01 by default; set
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.001 for a fast pass)."""

from __future__ import annotations

import pytest
pytestmark = pytest.mark.slow  # tiered run: see pytest.ini (r13 VERDICT #1)


from .conftest import SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


def _specs():
    from logstream_processing_service_spark.catalog import all_specs

    return [s for s in all_specs() if s.oracle is not None]


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_oracle_parity(spark, con, spec):
    report = compare_one(spark, con, spec.name, spec.fn, spec.oracle, SF_DIR_ORACLE)
    # cache lifecycle is caller-owned: drop each query's persisted frames
    # so the 117-query sweep never accumulates dead cached blocks
    spark.catalog.clearCache()
    assert report["status"] == "OK", report


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    from logstream_processing_service_spark.catalog import all_specs

    for s in all_specs():
        if s.oracle is None:
            df = s.fn(spark, SF_DIR_ORACLE)
            assert df.columns, s.name
            assert df.count() >= 0, s.name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(__import__("__spark_entry__").queries())
    oracles = set(e.oracle_sql())
    assert oracles <= names
