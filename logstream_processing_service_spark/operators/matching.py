"""Entity-resolution fuzzy matching: all pairs within edit distance d,
via delete-neighborhood (SymSpell) blocking + exact Levenshtein verify.

Reference parity note: the reference service's only matching primitive is
nearest-centroid Minkowski distance over embedded log templates
(src/ml/vector_engine.py:18-30, template extraction
src/db/pattern_ops.py:28-65 — see match_templates here); it has no
string-grain fuzzy matching. This is the record-linkage operator a
curation pipeline needs for entity keys (author names, titles, URLs
after normalization).

Algorithm (completeness argument): if ed(a, b) <= d under Levenshtein,
take any optimal alignment — each edit consumes at most one character of
each string, so deleting the edited positions from both sides yields a
COMMON string reachable from a and from b by at most d deletions each.
Hence blocking on "share at least one member of the <=d-deletion
neighborhood" generates every true pair; the Levenshtein verify then
discards false candidates. (This is the SymSpell / delete-neighborhood
scheme, the same generate-complete-candidates-then-verify discipline as
the MinHash-LSH and rarest-shingle blocks in operators/dedup.py.)

Scale design: a string of length L expands to 1 + L variants at d=1
(O(L^d) at depth d) — linear corpus blow-up, shuffled once on the variant
key; bucket sizes are bounded by real near-match family sizes, never the
corpus. The quadratic all-pairs form never appears (the DuckDB oracle runs
it, which is exactly why the oracle caps at small SF). Intended for SHORT
key strings (names, titles, normalized URLs); the guard refuses long
strings where the caller should block on a normalized key instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_KEY_LEN = 64  # delete-neighborhood is for short keys; L^d explosion beyond


def _delete1_expr(col: str) -> str:
    """All single-character deletions of ``col`` (empty array for '')."""
    return f"""
    CASE WHEN length({col}) = 0 THEN array()
         ELSE array_distinct(transform(
             sequence(1, length({col})),
             i -> concat(substring({col}, 1, i - 1), substring({col}, i + 1))
         ))
    END
    """


def fuzzy_pairs(
    df: DataFrame, id_col: str, key_col: str, max_ed: int = 1,
    max_bucket: int = 0,
) -> DataFrame:
    """All (id_a, id_b, ed) pairs with Levenshtein(key_a, key_b) <= max_ed,
    id_a < id_b. Exact output (blocking is complete; see module docstring).

    ``max_bucket`` (0 = off): refuse variant buckets larger than this.
    A bucket of size m emits O(m²) candidate pairs — on a corpus where
    one key value dominates (all-identical keys are the worst case), the
    OUTPUT is quadratic by the problem's own semantics; the guard makes
    that explicit instead of letting one reducer absorb it silently (the
    same discipline as the LSH ``max_bucket`` caps in operators/dedup.py).
    Leave 0 only when the oracle must match exactly (the capped form
    changes semantics on pathological corpora)."""
    if not 1 <= max_ed <= 2:
        raise ValueError("max_ed must be 1 or 2 (variant count is O(L^d))")
    base = df.select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key")
    ).withColumn("_len_ok", F.length("key") <= MAX_KEY_LEN)
    # loud guard: this operator is for short keys
    base = base.withColumn(
        "key",
        F.when(F.col("_len_ok"), F.col("key")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"fuzzy_pairs: key longer than {MAX_KEY_LEN} chars; "
                          "block on a normalized key instead: "),
                    F.col("key"),
                )
            )
        ),
    ).drop("_len_ok")

    # variant frame: (id, key, variant) — the string itself plus every
    # member of its <=max_ed deletion neighborhood
    var = base.withColumn("variant", F.col("key"))
    frontier = var
    for _ in range(max_ed):
        frontier = frontier.select(
            "id", "key",
            F.explode(F.expr(_delete1_expr("variant"))).alias("variant"),
        ).distinct()
        var = var.unionByName(frontier)
    var = var.distinct()

    a = var.select(
        F.col("id").alias("id_a"), F.col("key").alias("key_a"),
        F.col("variant").alias("variant"),
    )
    b = var.select(
        F.col("id").alias("id_b"), F.col("key").alias("key_b"),
        F.col("variant").alias("variant"),
    )
    if max_bucket:
        sizes = var.groupBy("variant").agg(F.count(F.lit(1)).alias("_bsz"))
        over = sizes.filter(F.col("_bsz") > max_bucket)
        if over.limit(1).count() > 0:
            worst = over.orderBy(F.desc("_bsz")).first()
            raise ValueError(
                f"fuzzy_pairs: variant bucket {worst['variant']!r} has "
                f"{worst['_bsz']} members (> max_bucket={max_bucket}); the "
                "output would be quadratic in that family — dedup exact "
                "keys first or raise max_bucket deliberately"
            )
    cand = (
        a.join(b, "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "key_a", "key_b")
        .distinct()
    )
    return (
        cand.withColumn("ed", F.levenshtein("key_a", "key_b"))
        .filter(F.col("ed") <= max_ed)
        .select("id_a", "id_b", F.col("ed").cast("int").alias("ed"))
    )


def fuzzy_pairs_oracle_sql(
    table: str, id_col: str, key_col: str, max_ed: int = 1
) -> str:
    """Naive quadratic twin — correct at oracle SF, intractable at scale
    (the point of the blocking)."""
    return f"""
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           CAST(levenshtein(a.{key_col}, b.{key_col}) AS INT) AS ed
    FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
    WHERE levenshtein(a.{key_col}, b.{key_col}) <= {max_ed}
    """
