#!/usr/bin/env python3
"""Regenerate the BASELINE.md per-query bench table and the
Bench.BaselinePerQuery Scala map from a bench JSON line.

Usage: python3 tools/restamp.py <bench.json> [bench2.json ...]

With several JSONs, stamps the per-query MEDIAN (and prints each run's
total + load_ratio so the stamp commit can record reproducibility).
Purely a formatter — paste the output into Bench.scala / BASELINE.md.
"""
import sys, json, statistics

runs = []
for p in sys.argv[1:]:
    s = open(p).read().strip()
    s = s[s.index('{'):]
    runs.append(json.loads(s))

names = sorted(runs[0]["queries"])
med = {q: statistics.median(r["queries"][q] for r in runs) for q in names}

for r in runs:
    print(f"# run: total={r['value']:.1f}s n={len(r['queries'])} "
          f"load_ratio={r['load_ratio']:.2f}", file=sys.stderr)
print(f"# stamped total (sum of per-query medians): {sum(med.values()):.1f}s",
      file=sys.stderr)

print("  val BaselinePerQuery: Map[String, Double] = Map(")
line = "   "
for i, q in enumerate(names):
    item = f' "{q}" -> {round(med[q], 2)},'
    if len(line) + len(item) > 78:
        print(line)
        line = "   "
    line += item
print(line.rstrip(",") + ")")

print()
for q in names:
    print(f"| {q} | {round(med[q], 2)} |  |")
