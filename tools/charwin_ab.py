#!/usr/bin/env python
"""A/B: char_window_dup_profile raw 40-char shuffle keys vs
xxhash64(window) 8-byte long keys (r11 VERDICT "Next round" #6 — the
docstring's named 100-TB lever, measured instead of assumed).

Same harness discipline as tools/scaling_study.py: min of SCALE_REPS
warm runs per point, noop sink, cache cleared between runs. Points:
sf0.1 (5k docs), scale10 (50k), scale100 (500k — the decade where the
37.4 s r11 number lives). Run with SCALE_100=1 to include the third
decade (builds the corpus via scaling_study if absent).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_study import (  # noqa: E402
    SCALE100_DIR,
    SCALE_DIR,
    SRC_SF,
    build_scale10,
    build_scale100,
)


def main() -> None:
    reps = int(os.environ.get("SCALE_REPS", "2"))
    hundred = os.environ.get("SCALE_100") == "1"
    if not os.path.exists(os.path.join(SCALE_DIR, "documents.parquet")):
        build_scale10()
    if hundred and not os.path.exists(
        os.path.join(SCALE100_DIR, "documents.parquet")
    ):
        build_scale100()

    from logstream_processing_service_spark.operators.dedup import (
        char_window_dup_profile,
    )
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    spark = get_spark(app_name="charwin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SRC_SF, "documents").count()  # JVM warm-up

    def run(sf_dir: str, hash_keys: bool) -> float:
        best = float("inf")
        for _ in range(reps):
            docs = load_table(spark, sf_dir, "documents")
            df = char_window_dup_profile(docs, hash_keys=hash_keys)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    points = [("sf0.1", SRC_SF), ("scale10", SCALE_DIR)]
    if hundred:
        points.append(("scale100", SCALE100_DIR))
    print(f"{'point':<10} {'raw_keys':>10} {'xxhash64':>10} {'ratio':>8}")
    for label, d in points:
        raw = run(d, hash_keys=False)
        hashed = run(d, hash_keys=True)
        print(
            f"{label:<10} {raw:>10.3f} {hashed:>10.3f} "
            f"{hashed / raw:>8.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
