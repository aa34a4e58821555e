#!/usr/bin/env python3
"""Compare two Bench artifacts query-by-query.

Usage: python3 dev/bench_diff.py <old.json> <new.json> [threshold]

Accepts either a full Bench line (dev/bench_full.json — {"queries": {...}})
or a driver BENCH_rN.json wrapper (per-query timings recovered from its
truncated "tail" string, so old rounds remain comparable). Prints the
common-query geometric-mean ratio and every delta above the threshold
(default 1.3x) in both directions.
"""
import json
import re
import statistics
import sys


def load(path):
    d = json.load(open(path))
    if "queries" in d and isinstance(d["queries"], dict):
        return {k: v for k, v in d["queries"].items() if v}
    if "tail" in d:  # driver wrapper with a truncated stdout tail
        m = re.findall(r'"(q[0-9]+[a-z0-9_]*)":([0-9.]+)', d["tail"])
        return {k: float(v) for k, v in m}
    raise SystemExit(f"{path}: neither a Bench line nor a driver BENCH wrapper")


def main(old_path, new_path, threshold=1.3):
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = {k: new[k] / old[k] for k in common}
    gm = statistics.geometric_mean(ratios.values())
    print(f"common queries: {len(common)}  (old-only: {len(set(old)-set(new))}, "
          f"new-only: {len(set(new)-set(old))})")
    print(f"geomean new/old: {gm:.3f}   "
          f"sum old: {sum(old[k] for k in common):.1f}s  "
          f"sum new: {sum(new[k] for k in common):.1f}s")
    regressions = [(r, k) for k, r in ratios.items() if r > threshold]
    improvements = [(r, k) for k, r in ratios.items() if r < 1 / threshold]
    for title, rows in (("regressions", sorted(regressions, reverse=True)),
                        ("improvements", sorted(improvements))):
        print(f"{title} beyond {threshold}x: {len(rows)}")
        for r, k in rows:
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.3))
