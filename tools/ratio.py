#!/usr/bin/env python3
"""Join a graft Bench JSON line with check.py's oracle_times.json (same
SF!) and report per-query and aggregate Spark/DuckDB wall-clock ratios.

Usage: python3 tools/ratio.py BENCH_FULL.json ORACLE_TIMES.json

Pass BENCH_FULL.json (written by graft.Bench next to the build) — the
stdout line now carries only the slowest-query subset to fit the
driver's 2000-char capture window; the sidecar has every query.

Echo oracles (emitted-row checks that read Spark's own dump) are listed
but excluded from the aggregate — their DuckDB time measures the check,
not an equivalent computation.
"""
import json
import sys

bench = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
times = json.load(open(sys.argv[2]))

spark = bench["queries"]
rows = []
for q in sorted(spark):
    o = times.get(q)
    if o is None or o["sec"] <= 0 or spark[q] <= 0:
        continue
    rows.append((q, spark[q], o["sec"], spark[q] / o["sec"], o["echo"]))

comp = [r for r in rows if not r[4]]
print(f"{'query':36s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
for q, s, d, r, echo in sorted(rows, key=lambda x: -x[3]):
    tag = "  (echo oracle, excluded)" if echo else ""
    print(f"{q:36s} {s:8.3f} {d:8.3f} {r:7.2f}{tag}")
ss = sum(r[1] for r in comp)
ds = sum(r[2] for r in comp)
print(f"\ncomparable oracles: {len(comp)}  spark {ss:.1f}s  duckdb {ds:.1f}s"
      f"  aggregate ratio {ss / ds:.2f}")
# Sub-0.3s Spark queries sit on the per-job scheduling floor (Spark's
# fixed task-launch cost dwarfs the actual work at local SF); their ratios
# say nothing about the plan. Report them separately from material ones.
FLOOR = 0.3
floor2 = [r[0] for r in comp if r[3] > 2.0 and r[1] < FLOOR]
real2 = [r[0] for r in comp if r[3] > 2.0 and r[1] >= FLOOR]
print(f">2x at scheduling floor, spark<{FLOOR}s ({len(floor2)}): "
      f"{', '.join(floor2)}")
print(f">2x with material work, spark>={FLOOR}s ({len(real2)}): "
      f"{', '.join(real2)}")
