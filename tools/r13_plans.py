#!/usr/bin/env python
"""Dump .explain('formatted') for named queries into plans/r13/<name>_<tag>.txt.

Usage: python tools/r13_plans.py <tag> name1 name2 ...
(tag = 'before' or 'after'; SF from $SPARK_GRAFT_SF_DIR, default sf0.1.
OUT dir from $SPARK_GRAFT_PLANS_OUT, default <repo>/plans/r13.)
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_OUT", os.path.join(repo, "plans", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)

    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.plans.inspect import formatted_plan
    from logstream_processing_service_spark.session import get_spark

    spark = get_spark(app_name="r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(formatted_plan(df).rstrip() + "\n")
        print("wrote", p)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
