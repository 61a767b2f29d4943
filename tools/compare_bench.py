#!/usr/bin/env python3
"""Diff two Bench JSON artifacts and flag per-query regressions.

Usage:
  python3 tools/compare_bench.py bench/bench_A.json bench/bench_B.json [ratio]

Prints queries present in both whose B/A time ratio exceeds the
threshold (default 1.5), plus totals and the queries added/removed.
Exit code 1 if any regression is flagged — suitable for a quick gate.

Method note (SCALING.md): this host has moving multi-minute I/O-stall
windows, so single-pass ratios near the threshold are suspicious —
re-measure a flagged query solo (SPARK_GRAFT_ONLY=<q>) before treating
it as real. Bench already min-merges an internal retry of its slowest
rows, which absorbs most of the noise.
"""
import sys, json

a_path, b_path = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

def load(p):
    line = open(p).read()
    return json.loads(line[line.index("{"):])

a, b = load(a_path), load(b_path)
qa, qb = a["queries"], b["queries"]
both = sorted(set(qa) & set(qb))
flagged = []
for q in both:
    # sub-200ms baselines are noise UNLESS the B side got large in absolute
    # terms — 0.15s -> 30s is a real regression the noise filter must not
    # swallow (the floor on qa keeps the ratio finite for ~0s baselines)
    if (qa[q] > 0.2 or qb[q] > 2.0) and qb[q] / max(qa[q], 0.05) > thresh:
        flagged.append((q, qa[q], qb[q], qb[q] / max(qa[q], 0.05)))
flagged.sort(key=lambda t: -t[3])

print(f"A: {a_path}  total {a['value']:.1f}s / {len(qa)} queries")
print(f"B: {b_path}  total {b['value']:.1f}s / {len(qb)} queries")
added, removed = sorted(set(qb) - set(qa)), sorted(set(qa) - set(qb))
if added:
    print(f"added in B ({len(added)}): {', '.join(added[:10])}"
          + (" …" if len(added) > 10 else ""))
if removed:
    print(f"removed in B ({len(removed)}): {', '.join(removed[:10])}"
          + (" …" if len(removed) > 10 else ""))
if flagged:
    print(f"\nregressions > {thresh}x (B vs A):")
    for q, ta, tb, r in flagged:
        print(f"  {q:28} {ta:7.2f}s -> {tb:7.2f}s  {r:4.1f}x")
else:
    print(f"\nno regressions > {thresh}x")
sys.exit(1 if flagged else 0)
