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


# Fellegi–Sunter field parameters: (agreement m-probability among true
# matches, agreement u-probability among non-matches). Published-style
# constants; the SCORE is what the operator computes — parameter fitting
# (EM over agreement patterns) is a separate concern.
FS_FIELDS = {
    "name_sfx": (0.90, 0.001),
    "segment": (0.95, 0.20),
    "bal_bucket": (0.85, 0.005),
}
FS_POSSIBLE = 0.0  # score thresholds: >= upper → match,
FS_MATCH = 8.0     # >= lower → possible, else non-match (dropped)


def fellegi_sunter_pairs(customer: DataFrame) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969): score
    candidate customer pairs by the log-likelihood ratio of their field
    agreement pattern — agree on field i adds log2(m_i/u_i), disagree
    adds log2((1−m_i)/(1−u_i)) — and keep pairs scoring at least the
    ``possible`` threshold, classified match/possible. The decision
    framework every serious entity-resolution pipeline uses instead of
    ad-hoc similarity cutoffs (weights are evidence; rare agreements
    count more).

    Fields: last-3-digit name suffix, market segment, and the
    100-unit account-balance bucket (floor(acctbal/100) — one double
    division, engine-identical). Blocking: same nation (the block key
    every candidate pair must share — at 100 TB use a finer composite
    block, e.g. nation × name-suffix, exactly like the delete-
    neighborhood blocks above; the score math is block-agnostic).

    Output: (id_a, id_b, agree_name, agree_seg, agree_bal, score,
    verdict) with id_a < id_b, score rounded 6 dp (threshold compares
    run on the unrounded double).

    Scale: ONE nation-keyed exchange; in-block pair expansion is the
    explicit quadratic the block-key choice owns (documented, as in
    fuzzy_pairs); weights are Python-computed constants folded into the
    plan, so the score is a branch-free column expression.
    """
    import math

    base = customer.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        F.substring("c_name", 16, 3).alias("sfx"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / F.lit(100.0)).alias("bb"),
    )
    a = base.select(*[F.col(c).alias(f"{c}_a") for c in base.columns])
    b = base.select(*[F.col(c).alias(f"{c}_b") for c in base.columns])
    pairs = a.join(b, F.col("nk_a") == F.col("nk_b")).filter(
        F.col("id_a") < F.col("id_b")
    )

    def w(field: str, agree_col):
        m, u = FS_FIELDS[field]
        return F.when(agree_col, F.lit(math.log2(m / u))).otherwise(
            F.lit(math.log2((1.0 - m) / (1.0 - u)))
        )

    agree_name = F.col("sfx_a") == F.col("sfx_b")
    agree_seg = F.col("seg_a") == F.col("seg_b")
    agree_bal = F.col("bb_a") == F.col("bb_b")
    score = (
        w("name_sfx", agree_name)
        + w("segment", agree_seg)
        + w("bal_bucket", agree_bal)
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            agree_name.alias("agree_name"),
            agree_seg.alias("agree_seg"),
            agree_bal.alias("agree_bal"),
            score.alias("_s"),
        )
        .filter(F.col("_s") >= F.lit(FS_POSSIBLE))
        .select(
            "id_a",
            "id_b",
            "agree_name",
            "agree_seg",
            "agree_bal",
            F.round("_s", 6).alias("score"),
            F.when(F.col("_s") >= F.lit(FS_MATCH), F.lit("match"))
            .otherwise(F.lit("possible"))
            .alias("verdict"),
        )
        .orderBy("id_a", "id_b")
    )


def fellegi_sunter_oracle_sql() -> str:
    """DuckDB twin: identical blocking, agreement tests and weight
    constants (repr()-interpolated, CAST AS DOUBLE — the decimal-literal
    trap); thresholds compare the unrounded score."""
    import math

    def w(field):
        m, u = FS_FIELDS[field]
        return (
            f"CAST({math.log2(m / u)!r} AS DOUBLE)",
            f"CAST({math.log2((1.0 - m) / (1.0 - u))!r} AS DOUBLE)",
        )

    nm1, nm0 = w("name_sfx")
    sg1, sg0 = w("segment")
    bb1, bb0 = w("bal_bucket")
    return f"""
    WITH base AS (
        SELECT c_custkey AS id, c_nationkey AS nk,
               substring(c_name, 16, 3) AS sfx,
               c_mktsegment AS seg,
               floor(c_acctbal / CAST(100.0 AS DOUBLE)) AS bb
        FROM customer
    ),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               a.sfx = b.sfx AS agree_name,
               a.seg = b.seg AS agree_seg,
               a.bb = b.bb AS agree_bal
        FROM base a JOIN base b ON a.nk = b.nk AND a.id < b.id
    ),
    scored AS (
        SELECT *,
               (CASE WHEN agree_name THEN {nm1} ELSE {nm0} END
                + CASE WHEN agree_seg THEN {sg1} ELSE {sg0} END
                + CASE WHEN agree_bal THEN {bb1} ELSE {bb0} END) AS s
        FROM pairs
    )
    SELECT id_a, id_b, agree_name, agree_seg, agree_bal,
           round(s, 6) AS score,
           CASE WHEN s >= CAST({FS_MATCH!r} AS DOUBLE) THEN 'match'
                ELSE 'possible' END AS verdict
    FROM scored
    WHERE s >= CAST({FS_POSSIBLE!r} AS DOUBLE)
    ORDER BY id_a, id_b
    """
