"""dhash_near_dup_report cost attribution: decode vs candidate machinery.

r10 VERDICT #5: the fourth-decade exponent (alpha 0.616 at 5M docs) was
diagnosed as decode-dominated — VERIFY it instead of trusting the
diagnosis. Method: at each scaling decade, time

  (a) e2e       — the full operator (decode -> dHash -> band -> verify),
  (b) candidate — the same report with the (doc_id, dhash) table
                  pre-materialized and persisted BEFORE the timer
                  (the operator's ``hashed`` seam),

so decode_share = (e2e - candidate) / e2e. If the candidate stage (not
decode) carries the growth term, the VERDICT's contingency applies:
re-band to 8x8 bits and re-verify pigeonhole recall at threshold <= 3.

Usage: python tools/dhash_split.py [decade ...] with decades from
{sf0.1, scale10, scale100, scale1000} (default: all that exist on
disk). One JSON line per decade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECADES = {
    "sf0.1": "/root/testdata/sf0.1",
    "scale10": "/tmp/logstream_scale10",
    "scale100": "/tmp/logstream_scale100",
    "scale1000": "/tmp/logstream_scale1000",
}


def main() -> None:
    from pyspark.sql import functions as F

    from logstream_processing_service_spark.operators.multimodal import (
        dhash_near_dup_report,
        image_dhash_table,
        with_gradient_image_payload,
    )
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    want = sys.argv[1:] or list(DECADES)
    spark = get_spark()
    reps = int(os.environ.get("SPLIT_REPS", "3"))
    for name in want:
        sf = DECADES[name]
        if not os.path.exists(os.path.join(sf, "documents.parquet")):
            print(json.dumps({"decade": name, "skipped": "no data"}))
            continue
        docs = load_table(spark, sf, "documents").select("doc_id").repartition(
            32, "doc_id"
        )
        media = with_gradient_image_payload(docs)

        def run_e2e() -> int:
            out = dhash_near_dup_report(media)
            n = out.count()
            spark.catalog.clearCache()
            return n

        def run_candidate(hashed) -> int:
            out = dhash_near_dup_report(media, hashed=hashed)
            return out.count()

        # warm + measure e2e
        run_e2e()
        t_e2e = min(
            (lambda t0: (run_e2e(), time.time() - t0)[1])(time.time())
            for _ in range(reps)
        )
        # pre-materialize the dHash table OUTSIDE the timer
        hashed = image_dhash_table(media).persist()
        n_imgs = hashed.count()
        run_candidate(hashed)  # warm
        t_cand = min(
            (lambda t0: (run_candidate(hashed), time.time() - t0)[1])(
                time.time()
            )
            for _ in range(reps)
        )
        hashed.unpersist()
        spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "decade": name,
                    "n_images": n_imgs,
                    "e2e_s": round(t_e2e, 3),
                    "candidate_s": round(t_cand, 3),
                    "decode_s": round(t_e2e - t_cand, 3),
                    "decode_share": round((t_e2e - t_cand) / t_e2e, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
