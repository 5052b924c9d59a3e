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


def test_weighted_pagerank_matches_numpy(spark):
    """Distributed weighted power iteration vs an identical dense numpy
    iteration on a small weighted digraph."""
    import numpy as np
    from pyspark.sql import functions as F
    from logstream_processing_service_spark.operators.graph import (
        weighted_pagerank,
    )

    # weighted digraph: 0->1 (3), 0->2 (1), 1->2 (2), 2->0 (5), 1->0 (1)
    raw = [(0, 1, 3), (0, 2, 1), (1, 2, 2), (2, 0, 5), (1, 0, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long, w long")
    got = {
        r["node"]: (r["strength"], r["rank_scaled"])
        for r in weighted_pagerank(edges, n_iter=8, damping=0.85).collect()
    }
    n, d = 3, 0.85
    r = np.full(n, 1.0 / n)
    outw = np.zeros(n)
    for s, _, w in raw:
        outw[s] += w
    for _ in range(8):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t, w in raw:
            nxt[t] += d * r[s] * w / outw[s]
        r = nxt
    for i in range(n):
        assert got[i][0] == int(outw[i])
        assert abs(got[i][1] - round(r[i] * n, 6)) < 1e-9, (i, got[i], r[i])


def test_weighted_pagerank_unit_weights_equal_unweighted(spark):
    """With w=1 everywhere the weighted form must reproduce pagerank()
    exactly (same joins, same float association)."""
    from pyspark.sql import functions as F
    from logstream_processing_service_spark.operators.graph import (
        co_order_edges,
        pagerank,
        weighted_pagerank,
    )
    from logstream_processing_service_spark.sources import load_table

    from .conftest import SF_DIR

    edges = co_order_edges(load_table(spark, SF_DIR, "lineitem"))
    base = {
        r["node"]: r["rank_scaled"] for r in pagerank(edges, n_iter=4).collect()
    }
    got = {
        r["node"]: r["rank_scaled"]
        for r in weighted_pagerank(
            edges.withColumn("w", F.lit(1).cast("bigint")), n_iter=4
        ).collect()
    }
    assert got == base


def test_textrank_ranks_hub_word_first(spark):
    """A word adjacent to everything outranks words with equal raw
    frequency but peripheral positions — the property frequency-based
    top_tokens cannot express."""
    from logstream_processing_service_spark.operators.textanalysis import (
        textrank_keywords,
    )

    # 'hub' co-occurs with every other word; fillers co-occur in pairs
    docs = []
    fill = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for i, w in enumerate(fill):
        docs.append((i, f"hub {w} hub {w}"))
    docs += [(100 + j, "aa bb aa bb") for j in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(df, k=10, min_weight=1).toPandas()
    assert out.iloc[0].word == "hub"
    # determinism: second run identical
    out2 = textrank_keywords(df, k=10, min_weight=1).toPandas()
    assert out.equals(out2)


def test_pagerank_empty_graph_returns_empty(spark):
    """A weight floor can drain the edge list entirely — both pagerank
    forms (and textrank over a too-small corpus) must return an empty
    frame with the right schema, not divide by |V| = 0."""
    from logstream_processing_service_spark.operators.graph import (
        pagerank,
        weighted_pagerank,
    )
    from logstream_processing_service_spark.operators.textanalysis import (
        textrank_keywords,
    )

    e0 = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e0).count() == 0
    assert pagerank(e0).columns == ["node", "degree", "rank_scaled"]
    w0 = spark.createDataFrame([], "src long, dst long, w long")
    assert weighted_pagerank(w0).count() == 0
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "three four")], "doc_id long, text string"
    )
    out = textrank_keywords(docs, min_weight=99)  # floor kills every edge
    assert out.count() == 0
    assert out.columns == ["word", "strength", "rank_scaled"]
