#!/usr/bin/env python
"""Per-query bench regression report: diff two bench.py JSON outputs.

Usage:
    python tools/bench_diff.py BENCH_r01.json BENCH_r02.json [--threshold 1.5]

Prints a markdown table of per-query wall-clock ratios, flagging queries
changed beyond the threshold in either direction, plus adds/removes.
Exit code 1 if any regression exceeds the threshold (for CI-style gating;
note bench wall-clock varies ~1.5x between machines — gate only on runs
from the same machine/session).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r{N}.json wrapper (bench line embedded in the "tail" field)."""
    with open(path) as f:
        text = f.read().strip()
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        text = obj.get("tail", "")
    except json.JSONDecodeError:
        pass
    # take the last line that parses and carries a queries dict
    for line in reversed(text.replace("\r", "\n").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "queries" in obj:
                return obj
    # driver tails are HEAD-TRUNCATED fragments of the one-line JSON
    # (only the last 2000 chars survive): recover the per-query numbers
    # that made it into the fragment by regex — a PARTIAL map, flagged,
    # still diffable for the queries it holds
    import re

    pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', text)
    drop = {"value", "sf"}
    queries = {
        k: float(v) for k, v in pairs if k not in drop
    }
    if queries:
        sys.stderr.write(
            f"note: {path} is a truncated tail — recovered "
            f"{len(queries)} per-query numbers (partial)\n"
        )
        return {"queries": queries, "partial": True}
    raise ValueError(f"no bench JSON line found in {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"| query | {args.old} | {args.new} | ratio | flag |")
    print("|---|---|---|---|---|")
    regressions = []
    for name in sorted(shared, key=lambda n: -(nq[n] / max(oq[n], 1e-9))):
        ratio = nq[name] / max(oq[name], 1e-9)
        flag = ""
        if ratio >= args.threshold:
            flag = "REGRESSED"
            regressions.append(name)
        elif ratio <= 1.0 / args.threshold:
            flag = "improved"
        print(f"| {name} | {oq[name]:.2f} | {nq[name]:.2f} | {ratio:.2f}x | {flag} |")
    for name in added:
        print(f"| {name} | — | {nq[name]:.2f} | | added |")
    for name in removed:
        print(f"| {name} | {oq[name]:.2f} | — | | removed |")

    t_old = sum(oq[n] for n in shared)
    t_new = sum(nq[n] for n in shared)
    if shared:
        print(
            f"\nshared-query total: {t_old:.2f}s -> {t_new:.2f}s "
            f"({t_new / max(t_old, 1e-9):.2f}x); "
            f"grand total {old.get('value')}s -> {new.get('value')}s"
        )
    if regressions:
        print(f"\nREGRESSED (> {args.threshold}x): {', '.join(regressions)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
