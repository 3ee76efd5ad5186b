#!/usr/bin/env python3
"""Generate the sf10-equivalent DOCUMENTS table: a 100x derivative of
/root/testdata/sf0.1's documents written to /tmp/sf10eq (documents
only — the 100x evidence target is the near-dedup pipeline q_d6, which
reads nothing else). Same replication rule as make_sf1eq.py: replica 0
verbatim; replica k>0 suffixes every 3rd word with 'r<k>' so replicas
are NOT near-duplicates of their parents (a naive copy would flood the
near-dup chains with planted pairs). Other tables are copied verbatim
from the source SF so the sfdir stays loadable.

Usage: python3 tools/make_sf10eq_docs.py [src_sf_dir] [out_dir] [replicas]
"""
import os
import shutil
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10eq"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 100

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()
sql = f"""
  SELECT doc_id + k*1000000 AS doc_id,
    CASE WHEN k = 0 THEN text ELSE array_to_string(
      list_transform(string_split(text, ' '),
        (w, i) -> CASE WHEN i % 3 = 0 THEN w || 'r' || k ELSE w END), ' ')
    END AS text,
    lang, source,
    CASE WHEN k = 0 THEN n_chars ELSE CAST(length(array_to_string(
      list_transform(string_split(text, ' '),
        (w, i) -> CASE WHEN i % 3 = 0 THEN w || 'r' || k ELSE w END), ' '))
      AS BIGINT) END AS n_chars
  FROM read_parquet('{SF}/documents.parquet'),
       UNNEST(range(0, {R})) AS kk(k)"""
con.sql(f"COPY ({sql}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
n = con.sql(
    f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')"
).fetchone()[0]
print("documents", n)
