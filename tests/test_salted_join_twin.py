"""Driver-facing salted-join twin — the explicit skew-salting form
under the oracle hash (salting is pure partitioning: the (key, salt)
inner join equals the plain key join row-for-row)."""

from __future__ import annotations

import pytest

from logstream_processing_service_spark.queries_relational import (
    q_salted_join_twin,
)
from logstream_processing_service_spark.catalog import oracle_sql

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_salted_twin_hash_matches_oracle(spark, sf_dir):
    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark,
        con,
        "salted_join_twin",
        q_salted_join_twin,
        oracle_sql()["salted_join_twin"],
        sf_dir,
    )
    assert r["status"] == "OK", r


def test_salted_twin_plan_joins_on_key_and_salt(spark):
    plan = (
        q_salted_join_twin(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the join keys must include the salt — the hot key's rows shuffle
    # to 8 reducers, not one
    assert "_salt" in plan
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan
