#!/usr/bin/env python3
"""Generate the sf10-equivalent EMBEDDINGS table: a 100x derivative of
/root/testdata/sf0.1's embeddings written to /tmp/sf10eq_emb (embeddings
only — the 100x evidence target is the ANN index family, which reads
nothing else). Replica 0 is verbatim; replica k>0 is the parent vector
circularly shifted by (k + 17*(k // dim)) mod dim positions, with a
deterministic per-element hash-keyed SIGN FLIP on (k, i) plus a small
jitter. Both parts are load-bearing: a k-mod-dim shift alone repeats
every dim=64 replicas, so with 100 replicas the pairs (k, k+64) would
be rotation twins (cosine ~1) and replica 64 a jitter-only near-dup of
its parent — planting exactly the top-1 hits the derivative must NOT
hand the index; the 17-per-lap offset breaks the repeat, and hash()
signs (a real 64-bit hash — a linear-congruence pattern left all
(k, k+64) pairs with the SAME relative offset and median |cos| 0.45)
put any remaining same-shift pair at E[cos]=0 with sd ~1/sqrt(dim).
Replicas are decorrelated, not planted neighbors. Labels cycle so
downstream label-grouped queries stay loadable. Other tables are copied
verbatim from the source SF so the sfdir stays loadable.

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
        embedding[1 + (i - 1 + k + 17*(k // len(embedding))) % len(embedding)]
          * (CASE WHEN hash(i * 1000003 + k * 7919) % 2 = 0
             THEN -1.0 ELSE 1.0 END)
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
