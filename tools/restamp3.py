#!/usr/bin/env python3
"""Three-way stamp re-median: per query, the MEDIAN of (current stamp,
run1 seconds, run2 seconds). The current stamp is recovered exactly from
run1's own baseline_ratio (stamp = seconds / ratio), so no Scala parsing
is needed. Robust against single-run jitter: if the two fresh quiet runs
agree, they outvote the old stamp; if they disagree, the old stamp
mediates.

Usage: python3 tools/restamp3.py run1.json run2.json [...]
Prints the Bench.BaselinePerQuery Scala map and the BASELINE.md table
rows (same output contract as tools/restamp.py).
"""
import sys, json, statistics

runs = []
for p in sys.argv[1:]:
    s = open(p).read().strip()
    s = s[s.index('{'):]
    runs.append(json.loads(s))

r1 = runs[0]
names = sorted(set.intersection(*[set(r["queries"]) for r in runs]))
med = {}
for q in names:
    vals = [r["queries"][q] for r in runs]
    ratio = r1["baseline_ratio"].get(q)
    if ratio:
        vals.append(r1["queries"][q] / ratio)  # the current stamp
    med[q] = statistics.median(vals)

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
