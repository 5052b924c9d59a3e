#!/usr/bin/env python
"""Same-VM ABAB adjudication for the cross_source_dup_matrix bench jump.

r3 driver bench: 2.08s -> r4 driver bench: 3.34s (1.6x) with an UNCHANGED
plan.  Protocol (ROADMAP Directive-#1 pattern that settled the identical
dedup_minhash_lsh flag): interleave the flagged query (A) with an
already-adjudicated control (B = dedup_minhash_lsh, steady-state warm
~2.0s on the r4-start VM) in ONE session, N rounds, clearCache between
runs exactly like bench.py.  If A's warm steady-state is at or below its
r3 number while the run-to-run spread matches the control's, the r4 delta
is VM noise; otherwise it needs a plan diagnosis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    spark = get_spark(app_name="ab-cross-source")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}

    # warm-up: JIT + parquet footers outside the timings
    load_table(spark, sf_dir, "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    def run(name: str) -> float:
        df = specs[name].fn(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return dt

    table: dict[str, list[float]] = {"cross_source_dup_matrix": [], "dedup_minhash_lsh": []}
    for _ in range(rounds):
        table["cross_source_dup_matrix"].append(run("cross_source_dup_matrix"))
        table["dedup_minhash_lsh"].append(run("dedup_minhash_lsh"))
    print(json.dumps({"rounds": rounds, "sf_dir": sf_dir, "timings": table}))


if __name__ == "__main__":
    main()
