#!/usr/bin/env python
"""Phase-level diagnosis of curate_corpus at the scale10 slice: times the
eager build (fn call — funnel, minhash clusters, connected components,
keeper, split, shard) separately from the final write, and per phase
where the operator exposes seams. Used to adjudicate the scaling-study
curate_corpus point (the other four queries are lazy; curate's cost is
build-time and invisible to a write-only timer)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    spark = get_spark(app_name="diag-curate")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}
    load_table(spark, "/root/testdata/sf0.1", "documents").count()

    for sf_dir in (sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/logstream_scale10"]):
        t0 = time.perf_counter()
        df = specs["curate_corpus"].fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.catalog.clearCache()
        print(
            f"{sf_dir}: build {t1 - t0:.1f}s  write {t2 - t1:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
