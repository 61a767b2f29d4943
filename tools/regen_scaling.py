#!/usr/bin/env python3
"""Regenerate the headline numbers of SCALING.md from two Bench runs.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt -batch 'runMain graft.Bench' \
      2>&1 | grep '"metric"' > /tmp/bench_sf001.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1  sbt -batch 'runMain graft.Bench' \
      2>&1 | grep '"metric"' > /tmp/bench_sf01.json
  python3 tools/regen_scaling.py /tmp/bench_sf001.json /tmp/bench_sf01.json

Since round 9 Bench also writes its full JSON (incl. host metadata) to
bench/bench_<sf>_<date>.json — those committed artifacts are accepted
here directly, e.g.
  python3 tools/regen_scaling.py bench/bench_sf0.01_<d1>.json \
      bench/bench_sf0.1_<d2>.json

Prints the per-query ratio table (sorted worst-first) and the median /
total summary to paste into SCALING.md. The prose around the numbers is
maintained by hand.
"""
import json
import statistics
import sys


def load(path):
    line = open(path).read()
    if "[info] " in line:
        line = line.split("[info] ", 1)[1]
    return json.loads(line)


a, b = load(sys.argv[1]), load(sys.argv[2])
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ratios = {k: qb[k] / qa[k] for k in common}
med = statistics.median(ratios.values())

print(f"n_queries={len(common)}  median_ratio={med:.2f}  "
      f"total {a['value']:.1f}s -> {b['value']:.1f}s")
print()
print("| ratio | sf0.01 s | sf0.1 s | query |")
print("|---|---|---|---|")
for k, r in sorted(ratios.items(), key=lambda x: -x[1]):
    print(f"| {r:.1f} | {qa[k]:.2f} | {qb[k]:.2f} | {k} |")
