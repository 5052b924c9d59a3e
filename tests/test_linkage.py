"""Fellegi-Sunter probabilistic record linkage — r9 catalog candidate
`record_linkage_fs`."""

from __future__ import annotations

import math

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_linkage_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.operators.matching import (
        fellegi_sunter_oracle_sql,
    )
    from logstream_processing_service_spark.queries_relational import (
        q_record_linkage_fs,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "record_linkage_fs", q_record_linkage_fs,
        fellegi_sunter_oracle_sql(), sf_dir,
    )
    assert r["status"] == "OK", r


def test_hand_computed_weights(spark):
    """Two same-nation customers agreeing on ALL fields score
    sum(log2(m_i/u_i)) -> 'match'; agreeing only on segment+balance
    scores below 8 -> 'possible'; different nations never pair."""
    from logstream_processing_service_spark.operators.matching import (
        FS_FIELDS,
        fellegi_sunter_pairs,
    )

    rows = [
        (1, "Customer#000000001", 1, 150.0, "AUTO"),
        (2, "Customer#000001001", 1, 180.0, "AUTO"),   # same sfx/seg/bucket
        (3, "Customer#000000777", 1, 160.0, "AUTO"),   # seg+bucket only
        (4, "Customer#000000001", 2, 150.0, "AUTO"),   # other nation
    ]
    cust = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    got = {(r["id_a"], r["id_b"]): r
           for r in fellegi_sunter_pairs(cust).collect()}
    assert (1, 4) not in got and (2, 4) not in got
    full = sum(math.log2(m / u) for m, u in FS_FIELDS.values())
    assert got[(1, 2)]["verdict"] == "match"
    assert got[(1, 2)]["score"] == round(full, 6)
    assert got[(1, 3)]["verdict"] == "possible"
    assert got[(2, 3)]["verdict"] == "possible"


def test_single_block_exchange(spark):
    from logstream_processing_service_spark.queries_relational import (
        q_record_linkage_fs,
    )

    plan = (
        q_record_linkage_fs(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
