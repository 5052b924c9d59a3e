#!/usr/bin/env python
"""Two-point scaling study for the flagship dedup/curation/retrieval path
(r4 VERDICT "Next round" #6): every 100 TB claim so far is a plan-shape
argument; this measures the actual wall-clock scaling exponent per query
across a 10x corpus-size step and flags anything super-linear.

Corpus points:
  - sf0.01 (500 docs)  — warm-up / third point
  - sf0.1  (5,000 docs) — the driver's bench SF
  - scale10 (50,000 docs) — synthetic 10x slice of sf0.1, generated as:
    copy 0 = the original documents; copies k=1..9 = doc_id + k*5000 and
    the word sequence deterministically shuffled with seed (doc_id, k).
    This preserves the vocabulary, document-length, source and lang
    distributions exactly (so df-cap guards and funnel rules see the
    same marginals) while making the copies mutually non-near-duplicate
    (shingle sets are order-dependent); the original corpus's internal
    near-dup families survive once. Non-document tables are copied from
    sf0.1 so loaders resolve.

Exponent: log(t_50k / t_5k) / log(10) from the per-query MIN of
``reps`` warm runs (min is the right estimator under this VM family's
documented run-to-run drift). alpha <= ~1.15 is linear-with-noise;
> 1.3 triggers a diagnosis per the VERDICT's done-criterion.
"""

from __future__ import annotations

import json
import math
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_minhash_lsh",
    "dedup_substrings",
    "contamination_overlap",
    "bm25_search",
    "curate_corpus",
]

SCALE_DIR = "/tmp/logstream_scale10"
SRC_SF = "/root/testdata/sf0.1"


def build_scale10() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SCALE_DIR, exist_ok=True)
    for f in os.listdir(SRC_SF):
        if f != "documents.parquet":
            shutil.copy(os.path.join(SRC_SF, f), os.path.join(SCALE_DIR, f))
    t = pq.read_table(os.path.join(SRC_SF, "documents.parquet"))
    rows = t.to_pylist()
    n0 = len(rows)
    out = []
    for k in range(10):
        for r in rows:
            if k == 0:
                out.append(r)
                continue
            words = r["text"].split(" ")
            rng = random.Random(r["doc_id"] * 37 + k)
            rng.shuffle(words)
            text = " ".join(words)
            out.append(
                {
                    "doc_id": r["doc_id"] + k * n0,
                    "text": text,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": len(text),
                }
            )
    big = pa.Table.from_pylist(out, schema=t.schema)
    # multi-row-group file so scans parallelize like real multi-file data
    pq.write_table(
        big, os.path.join(SCALE_DIR, "documents.parquet"), row_group_size=5000
    )
    print(f"scale10 built: {len(out)} docs", flush=True)


def main() -> None:
    reps = int(os.environ.get("SCALE_REPS", "3"))
    if not os.path.exists(os.path.join(SCALE_DIR, "documents.parquet")):
        build_scale10()

    from logstream_processing_service_spark.catalog import all_specs
    from logstream_processing_service_spark.session import get_spark
    from logstream_processing_service_spark.sources import load_table

    spark = get_spark(app_name="scaling-study")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {s.name: s for s in all_specs()}

    load_table(spark, SRC_SF, "documents").count()  # JVM warm-up

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(reps):
            df = specs[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    table: dict[str, dict] = {}
    for name in QUERIES:
        r = {
            "sf0.01": run(name, "/root/testdata/sf0.01"),
            "sf0.1": run(name, SRC_SF),
            "scale10": run(name, SCALE_DIR),
        }
        r["alpha_10x"] = round(
            math.log(r["scale10"] / r["sf0.1"]) / math.log(10.0), 3
        )
        table[name] = r
        print(json.dumps({name: r}), flush=True)
    print(json.dumps(table), flush=True)


if __name__ == "__main__":
    main()
