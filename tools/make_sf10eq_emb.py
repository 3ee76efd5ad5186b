#!/usr/bin/env python3
"""Generate the sf10-equivalent EMBEDDINGS table: a 100x derivative of
/root/testdata/sf0.1's embeddings written to /tmp/sf10eq_emb (embeddings
only — the 100x evidence target is the ANN index family, which reads
nothing else). Replica 0 is verbatim; replica k>0 is the parent vector
circularly shifted by k mod dim positions with a small deterministic
per-element jitter keyed on (k, i) — shifted vectors point in genuinely
different directions (same norm), so replicas are NOT near-duplicates of
their parents and the derivative doesn't hand the index 100 planted
top-1 hits per query. Labels cycle so downstream label-grouped queries
stay loadable. Other tables are copied verbatim from the source SF so
the sfdir stays loadable.

Usage: python3 tools/make_sf10eq_emb.py [src_sf_dir] [out_dir] [replicas]
"""
import os
import shutil
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10eq_emb"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 100

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]:
    shutil.copy(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()
sql = f"""
  SELECT vec_id + k*1000000 AS vec_id,
    CASE WHEN k = 0 THEN embedding ELSE
      list_transform(range(1, len(embedding) + 1), i -> CAST(
        embedding[1 + (i - 1 + k) % len(embedding)]
          * (1.0 + ((k*31 + i*7) % 13 - 6) * 0.01) AS FLOAT))
    END AS embedding,
    label
  FROM read_parquet('{SF}/embeddings.parquet'),
       UNNEST(range(0, {R})) AS kk(k)"""
con.sql(f"COPY ({sql}) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")
n = con.sql(
    f"SELECT count(*) FROM read_parquet('{OUT}/embeddings.parquet')"
).fetchone()[0]
print("embeddings", n)
