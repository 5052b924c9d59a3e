"""k-core decomposition by iterative peeling — r9 catalog candidate
`word_kcore`. Unrolled-CTE oracle parity plus a deep-cascade path
fixture (peeling a path graph at k=2 cascades from the ends)."""

from __future__ import annotations

import pytest

from .conftest import SF_DIR, SF_DIR_ORACLE
from .oracle_harness import compare_one, duckdb_conn


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_ORACLE])
def test_word_kcore_hash_matches_oracle(spark, sf_dir):
    from logstream_processing_service_spark.queries_text import (
        _word_kcore_oracle,
        q_word_kcore,
    )

    con = duckdb_conn(sf_dir)
    r = compare_one(
        spark, con, "word_kcore", q_word_kcore, _word_kcore_oracle(), sf_dir
    )
    assert r["status"] == "OK", r


def _sym(spark, und):
    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    return spark.createDataFrame(rows, "src string, dst string")


def test_triangle_plus_tail_peels_tail(spark):
    """Triangle a-b-c plus a pendant path c-d-e: at k=2 the path peels
    in a CASCADE (e first, then d), leaving exactly the triangle with
    core degree 2 everywhere."""
    from logstream_processing_service_spark.operators.graph import (
        kcore_decomposition,
    )

    edges = _sym(
        spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    )
    got = {r["node"]: r["core_degree"]
           for r in kcore_decomposition(edges, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_nonconvergence_guard_raises(spark):
    """A long path at k=2 peels one node per END per round; with
    max_iters=1 the fixpoint is not reached and the operator must
    RAISE, never return a non-core."""
    from logstream_processing_service_spark.operators.graph import (
        kcore_decomposition,
    )

    path = [(str(i), str(i + 1)) for i in range(12)]
    edges = _sym(spark, path)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_decomposition(edges, k=2, max_iters=1)


def test_peel_depth_exactly_max_iters_converges(spark):
    """r9 advice regression: triangle + pendant path c-d-e has peel
    depth EXACTLY 2 at k=2 (round 1 drops e, round 2 drops d, round 3
    is the no-op that proves the fixpoint). With max_iters=2 the loop
    exhausts its budget on two strictly-shrinking rounds — the
    post-loop convergence probe must recognize the fixpoint and return
    the triangle instead of raising, matching the 2-level oracle
    unroll. max_iters=1 must still raise (genuinely too shallow)."""
    from logstream_processing_service_spark.operators.graph import (
        kcore_decomposition,
    )

    edges = _sym(
        spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    )
    got = {r["node"]: r["core_degree"]
           for r in kcore_decomposition(edges, k=2, max_iters=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}
    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore_decomposition(edges, k=2, max_iters=1)


def test_peel_depth_max_iters_matches_unrolled_oracle(spark):
    """The same depth-equals-bound graph through BOTH engines: the
    Spark loop at max_iters=2 and the 2-level unrolled DuckDB oracle
    must agree (the advice's exact parity concern)."""
    import duckdb

    from logstream_processing_service_spark.operators.graph import (
        kcore_decomposition,
        kcore_oracle_sql,
    )

    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    edges = _sym(spark, und)
    got = sorted(
        (r["node"], r["core_degree"])
        for r in kcore_decomposition(edges, k=2, max_iters=2).collect()
    )
    vals = ", ".join(
        f"('{a}', '{b}'), ('{b}', '{a}')" for a, b in und
    )
    cte = f"SELECT * FROM (VALUES {vals}) AS t(src, dst)"
    want = duckdb.sql(kcore_oracle_sql(cte, k=2, max_iters=2)).fetchall()
    assert got == sorted(want)


def test_empty_core(spark):
    """A star graph has no 2-core at all (the hub's neighbors are all
    degree-1): the result is empty, not an error."""
    from logstream_processing_service_spark.operators.graph import (
        kcore_decomposition,
    )

    edges = _sym(spark, [("h", str(i)) for i in range(5)])
    assert kcore_decomposition(edges, k=2).count() == 0
