#!/usr/bin/env python3
"""Per-query scale-ratio table between two graft.Bench JSON lines.

Usage: python3 tools/ratio.py <base.json> <scaled.json> [factor] [checks]

Prints a markdown table of per-query seconds and scaled/base ratios,
sorted by ratio descending, plus the median ratio. `factor` (default 10)
annotates which ratios exceed linear scaling.

`checks` (optional, "gate=bound,gate=bound") adds/overrides asserted
bounds for THIS run — the decade sweeps (sf1 → ×10-beyond-sf1) pass
their own per-family bounds here, while the built-in CHECKED dict stays
scoped to the canonical sf0.1 → sf1 pair it was calibrated on.
"""
import json, sys, statistics

# Queries with an ASSERTED scale bound (exit 1 on breach): documented
# super-linear designs whose mitigations must keep holding round over
# round. em_ivf_knn is N^1.5 by k≈√N list assignment — the 4096-list cap
# (MAXLISTS) is what flattens it as N grows past 4096·256 vectors; its
# measured sf1/sf0.1 ratio was 10.2 in r9, bounded at 12.
CHECKED = {
    "em_ivf_knn": 12.0,
    # adaptive banding (round 11): kd = log2(N/2.4) holds bucket occupancy
    # so candidates stay linear; measured 6.2x sf1/sf0.1 and 12.1x at the
    # x100 embeddings decade after the fix (the fixed 8x12 config measured
    # 1000x at x100). A breach means the adaptive sizing regressed.
    "em_cosine_neardup": 12.0,
}

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
if len(sys.argv) > 4:
    CHECKED = dict(CHECKED)
    for kv in sys.argv[4].split(","):
        k, v = kv.split("=")
        CHECKED[k.strip()] = float(v)

b, s = base["queries"], scaled["queries"]
common = [k for k in s if k in b and b[k] > 0 and s[k] > 0]

# Canary-normalized drift (VERDICT r18 #3): for SAME-SF comparisons
# (round-over-round), the median ratio over the artifacts' canary gates
# — fixed-cost catalog/scalar families untouched for many rounds —
# estimates the ambient host-window drift, which on this box runs
# ±1.3x (BENCH_NOTES r18). Corrected ratios divide it out so a code
# regression separates from a slow window mechanically. Cross-sf scale
# comparisons skip this (canaries scale too, mildly).
drift = None
class_drift = {}
if base.get("sf") == scaled.get("sf"):
    canary = set(base.get("canaries", [])) & set(scaled.get("canaries", []))
    cr = [s[k] / b[k] for k in canary if k in common]
    if cr:
        drift = statistics.median(cr)
    # per-class drift (VERDICT r19 #5): the scan-only canary set
    # under-spanned plan shapes — a join-only environment shift must
    # separate from a scan-only one. Classes come from the artifacts'
    # canary_classes map (r20+); intersected like the flat set.
    bc, sc = base.get("canary_classes", {}), scaled.get("canary_classes", {})
    for cls in set(bc) & set(sc):
        gates = set(bc[cls]) & set(sc[cls])
        crc = [s[k] / b[k] for k in gates if k in common]
        if crc:
            class_drift[cls] = (statistics.median(crc), len(crc))

rows = sorted(((k, b[k], s[k], s[k] / b[k]) for k in common),
              key=lambda r: -r[3])
corr = f" corrected |" if drift else ""
print(f"| query | base s | scaled s | ratio |{corr}")
print(f"|---|---|---|---|" + ("---|" if drift else ""))
for k, bb, ss, r in rows:
    flag = " **> linear**" if r > factor else ""
    c = f" {r / drift:.2f} |" if drift else ""
    print(f"| {k} | {bb:.2f} | {ss:.2f} | {r:.1f}{flag} |{c}")
med = statistics.median(r for _, _, _, r in rows)
over = [k for k, _, _, r in rows if r > factor]
print(f"\nmedian ratio {med:.2f} over {len(rows)} queries; "
      f"{len(over)} above {factor:g}x: {' '.join(over) or '-'}")
if drift:
    print(f"canary drift {drift:.3f} over {len(cr)} canaries "
          f"-> drift-corrected median {med / drift:.2f}")
for cls, (d, n) in sorted(class_drift.items()):
    print(f"canary class {cls}: drift {d:.3f} over {n} gates")
if len(class_drift) > 1:
    ds = [d for d, _ in class_drift.values()]
    if max(ds) / min(ds) > 1.25:
        print("WARNING canary classes disagree >1.25x — the drift is "
              "plan-shape-dependent; adjudicate per family, not with the "
              "pooled median")
for art, nm in ((base, sys.argv[1]), (scaled, sys.argv[2])):
    if art.get("tmp_dirs_at_start", 0) > 200:
        print(f"WARNING {nm}: tmp_dirs_at_start="
              f"{art['tmp_dirs_at_start']} — /tmp-crowded window, "
              f"FS-heavy gates suspect (BENCH_NOTES r18)")

breached = []
for k, bound in CHECKED.items():
    got = next((r for q, _, _, r in rows if q == k), None)
    if got is None:
        print(f"CHECK {k}: not in both runs (bound {bound:g}x unverified)")
    elif got > bound:
        breached.append(k)
        print(f"CHECK {k}: ratio {got:.1f} BREACHES bound {bound:g}x")
    else:
        print(f"CHECK {k}: ratio {got:.1f} within bound {bound:g}x")
sys.exit(1 if breached else 0)
