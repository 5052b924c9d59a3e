"""Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB curation job cannot use ``rand()`` for its train/test split: the
split must be (a) reproducible run-to-run, (b) stable when the table is
re-partitioned or incrementally extended, and (c) computable engine-side
with no shuffle. The standard trick is a keyed hash split: bucket every row
by a cryptographic hash of its stable key + a salt, and threshold the hash.

We threshold the md5 hex string LEXICOGRAPHICALLY (``md5 < '1a...'``): md5
is identical in every engine (unlike xxhash64/murmur, whose seeds differ
between Spark and DuckDB), so the split is portable and the DuckDB oracle
can verify it bit-for-bit. A 2-hex-char threshold gives fraction k/256.

The reference has no sampling/splitting at all (its "sample" is
``LIMIT 2000``, scripts/validate_quality.py:68 — biased by storage order);
this module is part of the north-star training-pipeline surface.

Scale shape: one narrow projection + a hash per row, fully codegen'd
JVM-side, no exchange; the split predicate pushes through to any downstream
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_bucket(key_col: str, salt: str = "split-v1") -> F.Column:
    """The portable bucketing hash: md5(salt ':' key) hex string."""
    return F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    test_threshold_hex: str = "1a",  # 26/256 ≈ 10.2% test
    salt: str = "split-v1",
) -> DataFrame:
    """Label every row 'test' or 'train' by stable keyed hash.

    Changing ``salt`` re-draws the split; extending the table never moves
    an existing row between splits (the property rand() cannot give you).
    """
    return df.withColumn(
        "split",
        F.when(split_bucket(key_col, salt) < test_threshold_hex, "test").otherwise(
            "train"
        ),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_hex: dict[str, str],
    default_hex: str = "00",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling (the reproducible ``sampleBy``).

    ``fractions_hex`` maps stratum value -> 2-hex-char threshold (k/256 of
    that stratum kept). Rows of unlisted strata use ``default_hex`` ('00' =
    drop). The threshold lookup is a tiny CASE chain — no join, no shuffle,
    the sample predicate is evaluated at scan time.
    """
    bucket = split_bucket(key_col, salt)
    thresh = F.lit(default_hex)
    for value, hx in sorted(fractions_hex.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(hx)).otherwise(thresh)
    return df.filter(bucket < thresh)


def split_summary(df: DataFrame, key_col: str, strata_col: str) -> DataFrame:
    """Split-balance audit: row counts per (split, stratum) — the query a
    curation pipeline runs to confirm the split didn't skew a class."""
    return (
        deterministic_split(df, key_col)
        .groupBy("split", strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", strata_col)
    )


def sample_oracle_case(
    strata_col: str, fractions_hex: dict[str, str], default_hex: str = "00"
) -> str:
    """Generate the oracle's CASE expression from the same fractions dict
    the Spark side uses, so the two cannot drift."""
    arms = "".join(
        f"WHEN {strata_col} = '{v}' THEN '{hx}' "
        for v, hx in sorted(fractions_hex.items(), reverse=True)
    )
    return f"CASE {arms}ELSE '{default_hex}' END"


def _uniform01(key_col: str, salt: str) -> F.Column:
    """Deterministic uniform draw in (0, 1]: the 48-bit md5-derived integer
    (functions/text.py hash48 — portable bit-for-bit to DuckDB) + 1, scaled
    by 2^-48. +1 keeps ln(u) finite at the bottom of the range."""
    from ..functions.text import hash48_sql

    h = F.expr(
        hash48_sql(f"concat('{salt}:', cast({key_col} as string))")
    )
    return (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))


def uniform01_oracle_sql(key_col: str, salt: str) -> str:
    """The DuckDB twin of ``_uniform01`` (same md5 arithmetic)."""
    from ..functions.text import hash48_sql

    h = hash48_sql(f"concat('{salt}:', CAST({key_col} AS VARCHAR))")
    return f"(({h}) + 1) / {float(1 << 48)}"


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Weighted random sampling without replacement, top-k by exponential
    sort key (Efraimidis & Spirakis 2006, the A-ES scheme): draw u ~
    U(0,1] per row from the stable keyed hash, rank by ln(u)/w descending,
    keep the k best. Inclusion probability is proportional to weight, the
    draw is reproducible run-to-run, and extending the corpus never
    changes an existing row's key — the properties quality-weighted
    subsampling of a 100 TB corpus needs (sample by quality score, not
    uniformly).

    Scale shape: the sort key is one in-row hash + ln; the top-k is
    TakeOrdered (per-partition heap + driver merge of k·P rows) — no
    global sort, no window, no shuffle of the corpus. Rows with
    non-positive weight are excluded (they cannot be drawn).
    """
    # the key is rounded BEFORE ranking (id tie-break after) so the
    # selected set is insensitive to last-ulp ln() differences between
    # engines — the oracle orders by the same rounded value. 12 dp: large
    # weights (n_chars in the thousands) put |key| near 1e-4..1e-9, where
    # a 6 dp round would quantize most keys into a handful of tie groups
    # broken by id — silently reverting to lowest-id selection instead of
    # the A-ES inclusion probabilities. 12 dp keeps ~1e-12 granularity
    # (far above the ~1e-18 cross-engine ln() ulp, far below key spacing).
    key = F.round(
        F.log(_uniform01(key_col, salt)) / F.col(weight_col).cast("double"), 12
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(key_col))
        .limit(k)
    )


def shard_assignment(
    df: DataFrame,
    key_col: str,
    n_shards: int = 32,
    salt: str = "shard-v1",
    max_rows_per_shard: int = 50_000_000,
) -> DataFrame:
    """Deterministic training-order assignment: every row gets a shard
    (stable keyed hash mod n_shards — a reproducible global shuffle) and a
    position within its shard (rank by a second hash draw). Together
    (shard, pos) define a reproducible random read order for training:
    shards are balanced by construction (md5 uniformity), and the order
    never changes when the job reruns or the cluster resizes — which
    ``rand()``-ordered exports cannot guarantee.

    Scale shape: one exchange on the shard id (balanced, n_shards chosen ≈
    output file count), an in-shard sort for row_number — exactly the
    write pattern of a sharded training-data export (one sorted file per
    shard). At 100 TB this IS the final repartition before the sink, so
    the exchange is not extra cost — BUT each shard is sorted in ONE
    task, so n_shards bounds per-task volume: the default 32 on a 100 TB
    corpus would hand ~3 TB to each sort task and die. The guard fails
    loudly when expected rows/shard exceeds ``max_rows_per_shard``
    (default 50M ≈ low-GB task at doc-metadata row widths) instead of
    spilling for hours; at corpus scale pass n_shards in the thousands —
    the shard count IS the output file count, so that is the natural
    choice anyway.
    """
    from ..functions.text import hash48_sql

    n_rows = df.count()
    if n_rows > n_shards * max_rows_per_shard:
        raise ValueError(
            f"shard_assignment: {n_rows} rows over {n_shards} shards = "
            f"{n_rows // n_shards} rows/shard, above the single-task sort "
            f"bound of {max_rows_per_shard}; raise n_shards (≈ output "
            "file count — thousands at corpus scale) or "
            "max_rows_per_shard if the rows are known to be narrow"
        )
    h = F.expr(hash48_sql(f"concat('{salt}:', cast({key_col} as string))"))
    shard = (h % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("order_key", key_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("order_key", h)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("order_key")
    )


def leakage_safe_split(
    documents: DataFrame,
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    test_threshold_hex: str = "1a",
    salt: str = "split-v1",
) -> DataFrame:
    """Train/test split at NEAR-DUP-CLUSTER grain: every document inherits
    the split decision of its cluster's canonical id (singletons split by
    their own id). A per-document split lets one member of a near-dup
    cluster land in train while its twin lands in test — the benchmark
    leakage that silently inflates eval scores; splitting the CLUSTER
    keeps every near-dup family on one side by construction.

    Output: (doc_id, split_unit_id, split) — ``split_unit_id`` is the id
    whose hash decided the split (cluster canonical id or own id), kept so
    audits can group by decision unit.

    Scale shape: the cluster resolution is ``dedup_clusters`` (banded LSH
    + pointer-jumping components — never all-pairs); the split itself adds
    one doc_id-keyed left join and an in-row md5. The same stability
    contract as ``deterministic_split`` holds at cluster grain: growing
    the corpus never flips an existing cluster's side unless the growth
    MERGES clusters (then the merged family re-decides together — which is
    exactly the leakage-safe behavior).
    """
    from .dedup import dedup_clusters

    clusters = dedup_clusters(documents, n=n, threshold=threshold).select(
        F.col("doc_id").alias("_cluster_doc"), "canonical_id"
    )
    return (
        documents.select(key_col)
        .join(clusters, F.col(key_col) == F.col("_cluster_doc"), "left")
        .select(
            key_col,
            F.coalesce(F.col("canonical_id"), F.col(key_col)).alias(
                "split_unit_id"
            ),
        )
        .withColumn(
            "split",
            F.when(
                split_bucket("split_unit_id", salt) < test_threshold_hex,
                "test",
            ).otherwise("train"),
        )
        .orderBy(key_col)
    )


def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    salt: str = "ksample-v1",
    over_select: float = 4.0,
) -> DataFrame:
    """Exact uniform k-per-group sample (deterministic reservoir): rank
    rows within each group by the stable keyed hash draw, keep the k
    smallest — per-group uniform without replacement, reproducible
    run-to-run.

    Scale shape — the naive form (row_number over every group) sorts
    ENTIRE groups in single tasks, the shard_assignment failure mode. The
    k-th smallest of n uniform draws concentrates at k/n, so: one tiny
    group-size aggregate → per-group cutoff ``min(1, over_select*k/n)``
    joined back (AQE broadcasts the group-cardinality frame when small)
    → the window sorts only the ~over_select*k survivors per group.
    With over_select=4 the probability any group keeps fewer than k
    candidates is Chernoff-tiny (< e^{-k}); groups with n ≤ 4k take the
    t=1 branch and are exact trivially. Result is bit-identical to the
    naive form — the oracle runs the naive form.
    """
    u = _uniform01(key_col, salt)
    base = df.withColumn("_u", u)
    thresh = (
        base.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            group_col,
            F.least(
                F.lit(1.0), F.lit(over_select * k) / F.col("_n").cast("double")
            ).alias("_t"),
        )
    )
    cand = base.join(thresh, group_col).filter(F.col("_u") <= F.col("_t"))
    w = Window.partitionBy(group_col).orderBy("_u", key_col)
    return (
        cand.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("_u", "_t")
    )
