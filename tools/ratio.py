#!/usr/bin/env python3
"""Per-query scale-ratio table between two graft.Bench JSON lines.

Usage: python3 tools/ratio.py <base.json> <scaled.json> [factor]

Prints a markdown table of per-query seconds and scaled/base ratios,
sorted by ratio descending, plus the median ratio. `factor` (default 10)
annotates which ratios exceed linear scaling.
"""
import json, sys, statistics

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

b, s = base["queries"], scaled["queries"]
common = [k for k in s if k in b and b[k] > 0 and s[k] > 0]
rows = sorted(((k, b[k], s[k], s[k] / b[k]) for k in common),
              key=lambda r: -r[3])
print(f"| query | sf0.1 s | sf1 s | ratio |")
print(f"|---|---|---|---|")
for k, bb, ss, r in rows:
    flag = " **> linear**" if r > factor else ""
    print(f"| {k} | {bb:.2f} | {ss:.2f} | {r:.1f}{flag} |")
med = statistics.median(r for _, _, _, r in rows)
over = [k for k, _, _, r in rows if r > factor]
print(f"\nmedian ratio {med:.2f} over {len(rows)} queries; "
      f"{len(over)} above {factor:g}x: {' '.join(over) or '-'}")
