#!/usr/bin/env python
"""Verify named catalog queries against the DuckDB oracle under a vanilla
session (the driver's comparison, via tests/oracle_harness.compare_one).

Usage: python tools/verify_queries.py name1 name2 ... [--sf DIR]...
With no --sf, checks sf0.001 AND sf0.01. Rows-only queries (oracle_sql is
None) are executed and row-counted only. Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> None:
    args = sys.argv[1:]
    names: list[str] = []
    sfs: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs.append(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from pyspark.sql import SparkSession

    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.session import apply_runtime_conf
    from tests.oracle_harness import compare_one, duckdb_conn

    spark = apply_runtime_conf(
        SparkSession.builder.master("local[8]")
        .appName("verify-queries")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}
    failed = False
    for sf_dir in sfs:
        con = duckdb_conn(sf_dir)
        for name in names:
            s = specs[name]
            if s.oracle is None:
                n = s.fn(spark, sf_dir).count()
                print(f"{sf_dir} {name}: rows-only, spark_rows={n}")
            else:
                r = compare_one(spark, con, name, s.fn, s.oracle, sf_dir)
                ok = r.get("status") == "OK"
                print(f"{sf_dir} {name}: {'OK' if ok else 'FAIL ' + str(r)}")
                if not ok:
                    failed = True
            spark.catalog.clearCache()
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
