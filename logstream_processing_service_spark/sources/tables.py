"""Parquet table scans (SURVEY §2.1 S1/S2).

Reference: ``fetch_logs_batch`` pulls whole SQL result sets into driver
memory via ``pd.read_sql`` (src/db/log_ops.py:5-14). Here a scan is a lazy,
column-pruned, predicate-pushed parquet read — Catalyst only materializes
what downstream operators need, which is what makes the same code viable at
100 TB (row-group skipping + partition pruning instead of a full fetch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..session import apply_runtime_conf

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns stored as parquet TIMESTAMP(NANOS): Spark (with nanosAsLong) reads
# them as LongType nanoseconds; convert back to a tz-free timestamp at
# microsecond precision — exactly how DuckDB reads the same files.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalize nano-timestamp columns."""
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        field = next((f for f in df.schema.fields if f.name == col), None)
        if field is not None and isinstance(field.dataType, LongType):
            # integer division: the ns value (~1.7e18) exceeds double precision,
            # so a float divide would corrupt the microseconds
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"{col} div 1000")).cast("timestamp_ntz"),
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each table as a temp view so transforms can use spark.sql."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Production-source swap for the reference's Postgres tables (S1):
    the same transforms run over JDBC by replacing ``load_table`` with this.

    Reads are range-partitioned on ``partition_column`` (the reference's
    ``log_id BETWEEN`` batch slicing, generalized) so the scan parallelizes
    across executors instead of one driver-side ``pd.read_sql`` fetch
    (src/db/log_ops.py:5-14). Predicates/projections still push down to the
    database via Catalyst's JDBC rules. Exercised end-to-end against the
    embedded Derby engine Spark ships (tests/test_jdbc.py: round trip,
    8-way range-partitioned scan, PushedFilters, append); parquet is the
    hot path in this environment.
    """
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("range partitioning needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("event_date",),
    mode: str = "overwrite",
) -> None:
    """Date-partitioned parquet sink — the storage layout that makes 100 TB
    queryable: a time-range predicate prunes whole directories before any
    IO (PartitionFilters), and each day's files compact independently.

    The reference appends everything into flat Postgres tables and rescans
    with WHERE (src/db/cluster_ops.py:14-19); partition pruning is the
    columnar equivalent of its (log_id BETWEEN …) slicing, done by layout.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def merge_parquet(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE INTO for plain parquet: WHEN MATCHED update (source row wins),
    WHEN NOT MATCHED insert — the reference's dual write (embedding upsert +
    cluster_id update in one txn, src/db/log_ops.py:66-81) as one
    set-oriented sink.

    Atomicity without a table format: the merged result is written to a
    temp directory and swapped in with two renames (the ModelStore
    blue/green move, T8). Readers see the old or the new directory, never a
    partial write. On Delta/Iceberg this whole function is one MERGE INTO.
    """
    import os
    import shutil

    tmp = target.rstrip("/") + "._staged"
    backup = target.rstrip("/") + "._old"
    try:
        existing = spark.read.parquet(target)
    except Exception:
        updates.dropDuplicates([key]).write.mode("overwrite").parquet(target)
        return
    deduped = updates.dropDuplicates([key])
    merged = existing.join(deduped, key, "left_anti").unionByName(deduped)
    merged.write.mode("overwrite").parquet(tmp)
    # swap: target -> backup, tmp -> target, drop backup
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(target, backup)
    os.rename(tmp, target)
    shutil.rmtree(backup)


def merge_full(
    target_df: DataFrame,
    source: DataFrame,
    key: str,
    when_matched: str = "update",
    matched_condition=None,
    when_not_matched_insert: bool = True,
    not_matched_by_source_delete: bool = False,
) -> DataFrame:
    """Delta-style MERGE as a pure DataFrame transform: full set of clauses —
    WHEN MATCHED [AND cond] UPDATE or DELETE, WHEN NOT MATCHED INSERT,
    WHEN NOT MATCHED BY SOURCE DELETE. Returns the merged frame; pair with
    ``merge_parquet``'s rename-swap (or a table format's MERGE INTO) to
    persist.

    ``matched_condition`` is an optional callable receiving the joined
    frame (target columns as ``t.*``, source as ``s.*``) and returning a
    boolean Column — e.g. only update when the source row is newer:
    ``lambda j: F.col("s.updated_at") > F.col("t.updated_at")``.

    Scale shape: ONE full-outer shuffle join on the key carries every
    clause; each output row is a per-row CASE over the two sides — no
    per-clause rescans of the target, which is the difference between one
    pass and four at 100 TB. Source rows are key-deduped first (last-writer
    ambiguity resolved deterministically by max over the row struct).
    """
    if when_matched not in ("update", "delete", None):
        raise ValueError(f"when_matched must be update/delete/None: {when_matched!r}")
    cols = target_df.columns
    if source.columns != cols:
        raise ValueError(f"schema mismatch: {source.columns} vs {cols}")
    # deterministic key-dedup of the source (max struct = last writer wins
    # under any partitioning)
    dk = (
        source.groupBy(key)
        .agg(F.max(F.struct(*[c for c in cols if c != key])).alias("_r"))
        .select(key, "_r.*")
    )
    t = target_df.alias("t")
    s = dk.alias("s")
    j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    t_present = F.col(f"t.{key}").isNotNull()
    s_present = F.col(f"s.{key}").isNotNull()
    matched = t_present & s_present
    cond = matched_condition(j) if matched_condition is not None else F.lit(True)

    keep = F.lit(False)
    use_source = F.lit(False)
    # target-only rows survive unless NOT MATCHED BY SOURCE deletes them
    keep = keep | (t_present & ~s_present & F.lit(not not_matched_by_source_delete))
    # source-only rows insert
    keep = keep | (~t_present & s_present & F.lit(when_not_matched_insert))
    use_source = use_source | (~t_present & s_present)
    if when_matched == "update":
        keep = keep | matched
        use_source = use_source | (matched & cond)
    elif when_matched == "delete":
        keep = keep | (matched & ~cond)
    else:
        keep = keep | matched
    return j.filter(keep).select(
        *[
            F.when(use_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in cols
        ]
    )
