"""Cross-engine parity rehearsal for TextRank — the r7 catalog
candidate. The DuckDB twin unrolls the weighted power iteration into
chained CTEs (the part_pagerank pattern) and must hash-match the Spark
operator through the SAME harness the driver uses. If the long float
in-mass sums ever diverge in the last ulp (more neighbors per node than
part_pagerank's graph), this test localizes it BEFORE a driver slot is
spent; the fix would be integer-scaled shares (the cusum recipe).
"""

from __future__ import annotations

from logstream_processing_service_spark.functions import text as T

from .conftest import SF_DIR
from .oracle_harness import compare_one, duckdb_conn

_WORDS_DUCK = T.words_sql("text", "duckdb")


def textrank_oracle_sql(
    k: int = 50,
    min_weight: int = 2,
    n_iter: int = 8,
    damping: float = 0.85,
) -> str:
    d = damping
    ctes = [
        f"""
    words AS (SELECT {_WORDS_DUCK} AS t FROM documents),
    pairs AS (
        SELECT least(t[i - 1], t[i]) AS a, greatest(t[i - 1], t[i]) AS b
        FROM (SELECT t, unnest(generate_series(2, len(t))) AS i
              FROM words WHERE len(t) >= 2)
    ),
    und AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS w
        FROM pairs WHERE a <> b GROUP BY 1, 2
        HAVING count(*) >= {min_weight}
    ),
    edges AS (
        SELECT a AS src, b AS dst, w FROM und
        UNION ALL
        SELECT b AS src, a AS dst, w FROM und
    ),
    outw AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS outw
             FROM edges GROUP BY 1),
    nv AS (SELECT count(*) AS n FROM outw),
    r0 AS (SELECT node, 1.0 / n AS rank FROM outw, nv)
    """.strip()
    ]
    for i in range(n_iter):
        ctes.append(
            f"""
    r{i + 1} AS (
        SELECT o.node,
               (1.0 - {d}) / n + {d} * coalesce(m.in_mass, 0.0) AS rank
        FROM outw o
        LEFT JOIN (
            SELECT e.dst, sum(r.rank / ow.outw * e.w) AS in_mass
            FROM edges e
            JOIN r{i} r ON e.src = r.node
            JOIN outw ow ON e.src = ow.node
            GROUP BY e.dst
        ) m ON o.node = m.dst
        CROSS JOIN nv
    )""".strip()
        )
    body = ",\n".join(ctes)
    return f"""
    WITH {body}
    SELECT r.node AS word, o.outw AS strength,
           round(r.rank * n, 6) AS rank_scaled
    FROM r{n_iter} r JOIN outw o ON r.node = o.node CROSS JOIN nv
    ORDER BY rank_scaled DESC, word
    LIMIT {k}
    """


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
