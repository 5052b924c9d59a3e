"""PageRank: numpy parity on a hand-built graph, mass conservation,
partitioning invariance. Oracle parity (8 unrolled CTE iterations) runs
in test_oracle_parity.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _numpy_pagerank(edges, n_iter=8, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in edges:
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1 - d) / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / out[idx[a]]
        r = nxt
    return {v: r[idx[v]] * n for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    from logstream_processing_service_spark.operators.graph import pagerank

    # asymmetric directed graph incl. a hub (but every node has outdeg>=1)
    edges = [
        (1, 2), (2, 1), (3, 1), (3, 2), (4, 1), (4, 3), (1, 4), (2, 4),
    ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {
        r["node"]: r["rank_scaled"] for r in pagerank(df).collect()
    }
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, v
    # node 1 receives from 3 in-edges -> highest rank
    assert max(got, key=got.get) == 1


def test_pagerank_mass_conserved_and_invariant(spark):
    from logstream_processing_service_spark.operators.graph import (
        co_order_edges,
        pagerank,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = co_order_edges(li)
    out = pagerank(edges).collect()
    n = len(out)
    # sum of raw ranks = 1  <=>  mean of scaled ranks = 1 (no dangling
    # mass in a symmetrized graph)
    assert abs(sum(r["rank_scaled"] for r in out) / n - 1.0) < 1e-4
    out2 = pagerank(edges.repartition(17)).collect()
    assert {(r["node"], r["rank_scaled"]) for r in out} == {
        (r["node"], r["rank_scaled"]) for r in out2
    }


def test_co_order_edges_symmetric_simple(spark):
    from logstream_processing_service_spark.operators.graph import co_order_edges

    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 10), (2, 12)],
        "l_orderkey LONG, l_partkey LONG",
    )
    got = {(r["src"], r["dst"]) for r in co_order_edges(li).collect()}
    # order 1: {10,11}; order 2: {10,12}; dup (1,10) collapses
    assert got == {(10, 11), (11, 10), (10, 12), (12, 10)}


def test_incremental_components_equals_batch(spark, tmp_path):
    """Contraction-maintained CC == batch CC over the union, after every
    batch — including merges of previously-separate components and
    within-component (self-loop) edges."""
    from pyspark.sql import functions as F  # noqa: F401

    from logstream_processing_service_spark.operators.dedup import (
        connected_components,
    )
    from logstream_processing_service_spark.operators.graph import (
        incremental_components,
        serve_components,
    )

    batches = [
        [(1, 2), (3, 4), (10, 11)],          # three components
        [(2, 3), (20, 21)],                  # merges {1,2}+{3,4}; new comp
        [(4, 1), (11, 20), (5, 10)],         # self-loop edge; big merge
    ]
    d = str(tmp_path / "assign")
    seen = []
    for b in batches:
        seen += b
        incremental_components(
            spark,
            d,
            spark.createDataFrame(b, "d1 long, d2 long"),
        )
        want = sorted(
            tuple(r)
            for r in connected_components(
                spark.createDataFrame(seen, "d1 long, d2 long")
            ).collect()
        )
        got = sorted(
            (r["doc_id"], r["canonical_id"])
            for r in serve_components(spark, d).collect()
        )
        assert got == want, (b, got, want)

    final = {r["doc_id"]: r for r in serve_components(spark, d).collect()}
    # final components: {1,2,3,4} (min 1) and {5,10,11,20,21} (min 5)
    assert final[21]["canonical_id"] == 5
    assert final[5]["canonical_id"] == 5
    assert final[1]["cluster_size"] == 4 and final[5]["cluster_size"] == 5
