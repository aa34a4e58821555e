#!/usr/bin/env python3
"""Scaling-exponent audit (r10 verdict ask #1): table the sf0.1 -> sf1
per-query time ratios from the two same-host full-catalog bench runs and
flag super-linear rows (ratio > 15 = 10x data + 50% overhead allowance).

Usage: python3 dev/sf1_ratio_table.py [sf01.json] [sf1.json]
Writes markdown to stdout (paste into SCALE.md).
"""
import json
import sys

sf01_path = sys.argv[1] if len(sys.argv) > 1 else "dev/bench_r11_sf01.json"
sf1_path = sys.argv[2] if len(sys.argv) > 2 else "dev/bench_sf1_full.json"

a = json.load(open(sf01_path))["queries"]
b = json.load(open(sf1_path))["queries"]

rows = []
for q, t1 in b.items():
    t0 = a.get(q)
    if t1 is None:
        rows.append((float("inf"), q, t0, None, "FAILED at sf1"))
    elif t0 is None or t0 == 0:
        rows.append((0.0, q, t0, t1, "no sf0.1 baseline"))
    else:
        rows.append((t1 / t0, q, t0, t1, ""))

rows.sort(key=lambda r: -r[0])
over = [r for r in rows if r[0] > 15 and r[4] == ""]
print(f"sf0.1 total: {sum(v for v in a.values() if v):.1f}s  "
      f"sf1 total: {sum(v for v in b.values() if v):.1f}s  "
      f"queries: {len(b)}  super-linear (>15x): {len(over)}")
print()
print("| query | sf0.1 s | sf1 s | ratio | note |")
print("|---|---|---|---|---|")
for ratio, q, t0, t1, note in rows[:40]:
    t0s = f"{t0:.2f}" if t0 is not None else "-"
    t1s = f"{t1:.2f}" if t1 is not None else "-"
    rs = f"{ratio:.1f}" if ratio not in (0.0, float("inf")) else "-"
    print(f"| {q} | {t0s} | {t1s} | {rs} | {note} |")
