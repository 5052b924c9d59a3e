#!/usr/bin/env python
"""lcp_neighbor_profile skew decade (r12 VERDICT "Next round" #6).

The registered first-char partition key caps parallelism at the leading-
char alphabet (≤256 partitions) and serializes on a corpus skewed onto
one leading token. Measure that trade instead of trusting the docstring:

  fixtures: each decade's documents with 80% of docs re-prefixed
  "the " (doc_id % 5 != 0) — one c1 partition carries ≥80% of rows.

  variants: mode="first_char" (registered r12 form) vs mode="range"
  (repartitionByRange on the full truncated key + boundary-pass fix —
  exact, skew-immune; see the operator docstring).

Decades: sf0.1 (5k docs), scale10 (50k, built by tools/scaling_study.py
if absent), scale100 (500k, SCALE_100=1). Timing = min of SCALE_REPS
(default 3) warm noop-sink writes per cell (the scaling_study protocol).

Prints one JSON line per (decade, corpus, mode) cell plus a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKEW_BASE = "/tmp/logstream_lcp_skew"


def main() -> None:
    from pyspark.sql import functions as F

    import tools.scaling_study as SS
    from logstream_processing_service_spark.operators.dedup import (
        lcp_neighbor_profile,
    )
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    reps = int(os.environ.get("SCALE_REPS", "3"))
    if not os.path.exists(os.path.join(SS.SCALE_DIR, "documents.parquet")):
        SS.build_scale10()
    decades = {"sf0.1": SS.SRC_SF, "scale10": SS.SCALE_DIR}
    if os.environ.get("SCALE_100") == "1":
        if not os.path.exists(
            os.path.join(SS.SCALE100_DIR, "documents.parquet")
        ):
            SS.build_scale100()
        decades["scale100"] = SS.SCALE100_DIR

    spark = get_spark(app_name="lcp-skew-study")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SS.SRC_SF, "documents").count()  # JVM warm-up

    def skew_fixture(name: str, src: str) -> str:
        out = f"{SKEW_BASE}_{name}"
        path = os.path.join(out, "documents.parquet")
        if not os.path.exists(path):
            docs = load_table(spark, src, "documents")
            skewed = docs.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 5 != 0,
                    F.concat(F.lit("the "), F.col("text")),
                ).otherwise(F.col("text")),
            )
            skewed.write.mode("overwrite").parquet(path)
        return out

    def run(docs_dir: str, mode: str) -> float:
        docs = load_table(spark, docs_dir, "documents")
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            lcp_neighbor_profile(docs, mode=mode).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    cells: dict[str, float] = {}
    for dname, ddir in decades.items():
        sdir = skew_fixture(dname, ddir)
        for corpus, cdir in (("plain", ddir), ("skew", sdir)):
            for mode in ("first_char", "range"):
                key = f"{dname}/{corpus}/{mode}"
                cells[key] = run(cdir, mode)
                print(
                    json.dumps(
                        {"decade": dname, "corpus": corpus, "mode": mode,
                         "sec": cells[key]}
                    ),
                    flush=True,
                )

    print(json.dumps({"summary": cells}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
