#!/usr/bin/env python
"""Freshness ledger: latest driver-row round per catalog query, computed
from the union of CORRECTNESS_r*.json — the audit the VERDICT recomputes
every round, as one command.

Prints: a round histogram, the never-checked set, and (with --list N)
the queries whose latest row is round N (the next rotation's backfill
source). Exits non-zero if any REGISTERED query has a FAILING latest row
(hash/rows mismatch or an error other than the by-design ``no_oracle``).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, tuple[int, dict]] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            latest[name] = (rnd, row)

    from logstream_processing_service_spark.catalog import all_specs

    names = [s.name for s in all_specs()]
    never = sorted(n for n in names if n not in latest)
    hist = Counter(latest[n][0] for n in names if n in latest)

    def failing(row: dict) -> bool:
        if row.get("err") not in (None, "no_oracle"):
            return True
        if row.get("err") == "no_oracle":
            return row.get("spark_rows") is None
        return not (row.get("hash_match") and row.get("rows_match"))

    bad = sorted(
        n for n in names if n in latest and failing(latest[n][1])
    )

    print(f"catalog: {len(names)} queries")
    print("latest-round histogram:",
          dict(sorted(hist.items())))
    print(f"never-checked: {len(never)}" + (f" -> {never}" if never else ""))
    print(f"failing latest rows: {len(bad)}" + (f" -> {bad}" if bad else ""))

    if len(sys.argv) > 2 and sys.argv[1] == "--list":
        rnd = int(sys.argv[2])
        sel = sorted(n for n in names if n in latest and latest[n][0] == rnd)
        print(f"r{rnd}-latest ({len(sel)}):")
        for n in sel:
            print(" ", n)

    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
