"""Graph operators: PageRank by distributed power iteration.

Reference parity note: the reference has no graph layer; this extends the
engine the same way dedup_clusters' connected components did — the other
standard iterative-graph primitive a corpus/recommendation pipeline needs
(link-graph quality weights for web corpora, co-occurrence importance for
catalog data).

Scale design: each iteration is ONE edge→rank equi-join plus ONE dst-keyed
aggregation — the Pregel message-passing step expressed relationally, so
Catalyst/AQE handle skew and the edge frame partitioning is reused across
iterations (persisted once). Ranks are localCheckpoint()ed per iteration:
the lineage would otherwise grow by a join+agg per step and replan from
scratch (the same discipline as dedup.connected_components and bpe_train).
Damping handles rank mass exactly because the co-order graph is
undirected (every node has out-degree >= 1; no dangling-mass term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
N_ITER = 8


def co_order_edges(lineitem: DataFrame) -> DataFrame:
    """Simple undirected co-purchase graph: parts appearing in the same
    order, deduplicated to one edge per unordered pair, emitted in both
    directions. One self-join per order key; the per-order item lists are
    small (TPC-H ~4), so the pair expansion is bounded per key."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1")
    )
    b = items.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    und = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .select("p1", "p2")
        .distinct()
    )
    return und.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionByName(und.select(F.col("p2").alias("src"), F.col("p1").alias("dst")))


def pagerank(edges: DataFrame, n_iter: int = N_ITER, damping: float = DAMPING) -> DataFrame:
    """PageRank over a directed edge list by ``n_iter`` power-iteration
    steps from the uniform start. Returns (node, degree, rank_scaled)
    where rank_scaled = rank x |V| rounded at 6 dp (x|V| keeps the
    magnitudes comparable across graph sizes).

    Every node must have out-degree >= 1 (true for any symmetrized edge
    list); dangling-node redistribution is intentionally out of scope and
    guarded by construction here."""
    edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = deg.select(F.col("src").alias("node"), "outdeg").persist()
    n = nodes.count()  # scalar: |V| (bounded — node-list cardinality)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            edges.join(
                ranks.join(nodes, "node").select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("in_mass"))
        )
        ranks = (
            nodes.select("node")
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    out = ranks.join(nodes, "node").select(
        "node",
        F.col("outdeg").cast("bigint").alias("degree"),
        F.round(F.col("rank") * n, 6).alias("rank_scaled"),
    )
    edges.unpersist()
    return out


def pagerank_oracle_sql(n_iter: int = N_ITER, damping: float = DAMPING) -> str:
    """DuckDB twin with the power iteration UNROLLED into chained CTEs
    (standard SQL forbids aggregation in a recursive term): same uniform
    start, same damping, same scaled rounding."""
    d = damping
    ctes = [
        """
    items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    und AS (
        SELECT DISTINCT a.p AS p1, b.p AS p2
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
    ),
    edges AS (
        SELECT p1 AS src, p2 AS dst FROM und
        UNION ALL
        SELECT p2 AS src, p1 AS dst FROM und
    ),
    deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
    nv AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT node, 1.0 / n AS rank FROM deg, nv)
    """.strip()
    ]
    for i in range(n_iter):
        ctes.append(
            f"""
    r{i + 1} AS (
        SELECT deg.node,
               (1.0 - {d}) / n + {d} * coalesce(m.in_mass, 0.0) AS rank
        FROM deg
        LEFT JOIN (
            SELECT e.dst, sum(r.rank / dg.outdeg) AS in_mass
            FROM edges e
            JOIN r{i} r ON e.src = r.node
            JOIN deg dg ON e.src = dg.node
            GROUP BY e.dst
        ) m ON deg.node = m.dst
        CROSS JOIN nv
    )""".strip()
        )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT r.node, CAST(deg.outdeg AS BIGINT) AS degree,
           round(r.rank * n, 6) AS rank_scaled
    FROM r{n_iter} r JOIN deg USING (node) CROSS JOIN nv
    """
