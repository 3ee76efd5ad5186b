#!/usr/bin/env python3
"""Chunked DuckDB replay of the q_g15_kcore oracle for endurance SFs.

The driver oracle unrolls the four peel rounds as one CTE chain; at the
10x sf1eq scale DuckDB materializes the whole chain at once and spills
>55 GB of temp before dying (SCALE.md round-10). The rounds are
inherently sequential, so this tool replays them as per-round TEMP
TABLES — each round's intermediate is bounded (and the previous one is
dropped) — and compares the final (id, deg) set against the Spark dump
check.py already produced. This is the adjudication path for the one
endurance-red the round-10 pass left open: same relational semantics,
storage-feasible execution plan.

Usage: python3 tools/adjudicate_kcore.py [sfdir] [outdir]
  (outdir must contain q_g15_kcore/ parquet from a prior Verify run)
"""
import sys
import time
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1eq"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq_out"

EDGES = f"""
SELECT 'c' || CAST(c_custkey AS STRING) AS from_id,
       'n' || CAST(c_nationkey AS STRING) AS to_id
FROM read_parquet('{SF}/customer.parquet')
UNION ALL SELECT 's' || CAST(s_suppkey AS STRING),
       'n' || CAST(s_nationkey AS STRING)
FROM read_parquet('{SF}/supplier.parquet')
UNION ALL SELECT 'n' || CAST(n_nationkey AS STRING),
       'r' || CAST(n_regionkey AS STRING)
FROM read_parquet('{SF}/nation.parquet')
UNION ALL SELECT 'o' || CAST(o_orderkey AS STRING),
       'c' || CAST(o_custkey AS STRING)
FROM read_parquet('{SF}/orders.parquet')
UNION ALL SELECT DISTINCT 'o' || CAST(l_orderkey AS STRING),
       's' || CAST(l_suppkey AS STRING)
FROM read_parquet('{SF}/lineitem.parquet')
"""

t0 = time.time()
con = duckdb.connect()
con.sql(f"""CREATE TEMP TABLE u0 AS
  SELECT DISTINCT a, b FROM (
    SELECT from_id AS a, to_id AS b FROM ({EDGES}) e
    UNION ALL SELECT to_id, from_id FROM ({EDGES}) e2) z""")
print(f"u0: {con.sql('SELECT count(*) FROM u0').fetchone()[0]} rows "
      f"({time.time() - t0:.1f}s)")

for i in range(1, 5):
    con.sql(f"""CREATE TEMP TABLE k{i} AS
      SELECT a AS id FROM u{i - 1} GROUP BY a HAVING COUNT(*) >= 2""")
    con.sql(f"""CREATE TEMP TABLE u{i} AS
      SELECT u.a, u.b FROM u{i - 1} u
      JOIN k{i} x ON x.id = u.a JOIN k{i} y ON y.id = u.b""")
    con.sql(f"DROP TABLE u{i - 1}")
    print(f"round {i}: {con.sql(f'SELECT count(*) FROM u{i}').fetchone()[0]} "
          f"edges ({time.time() - t0:.1f}s)")

orows = con.sql("""SELECT a AS id, COUNT(*) AS deg FROM u4 GROUP BY a
                   HAVING COUNT(*) >= 2""").fetchall()
sdir = Path(OUT) / "q_g15_kcore"
srows = con.sql(f"SELECT id, deg FROM '{sdir}/*.parquet'").fetchall()

oset = sorted((str(a), str(b)) for a, b in orows)
sset = sorted((str(a), str(b)) for a, b in srows)
if oset == sset:
    print(f"\nPASS q_g15_kcore chunked-oracle adjudication: "
          f"{len(sset)} rows hash-equal ({time.time() - t0:.1f}s total)")
    sys.exit(0)
diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
print(f"\nFAIL: spark={len(sset)} oracle={len(oset)} rows; "
      f"first diffs: {diff}")
sys.exit(1)
