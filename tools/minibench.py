#!/usr/bin/env python
"""Time a subset of bench.py's HEADLINE queries with bench.py's exact
methodology (warm-up scan, EAGER_BUILD in-window builds, noop sink,
clearCache between queries) — the r13 optimization round's before/after
instrument.

Usage: python tools/minibench.py name1 name2 ... [--reps N] [--sf DIR]
Prints one JSON line per rep and a median summary.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from bench import EAGER_BUILD
    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    spark = get_spark(app_name="logstream-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}

    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    allt: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        timings: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            fn = specs[name].fn
            if name in EAGER_BUILD:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
            else:
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            allt[name].append(timings[name])
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"rep": r, "queries": timings}), flush=True)
    if reps > 1:
        print(json.dumps({
            "median": {n: round(statistics.median(v), 3) for n, v in allt.items()},
            "min": {n: round(min(v), 3) for n, v in allt.items()},
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
