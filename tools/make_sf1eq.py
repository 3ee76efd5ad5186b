#!/usr/bin/env python3
"""Generate the sf1-equivalent endurance dataset: a 10x derivative of
/root/testdata/sf0.1 written to /tmp/sf1eq (never touching the
read-only testdata). Replication rules (see SCALE.md round-10
endurance section for the rationale):

- TPC-H tables: 10 join-consistent disjoint copies via key shifts
  (custkey/suppkey/partkey +1M per replica, orderkey +10M; nation and
  region are shared dimensions, copied verbatim).
- documents: replica 0 verbatim; replica k>0 suffixes every 3rd word
  with 'r<k>' so replicas are NOT near-duplicates of their parents
  (a naive copy would flood the near-dup chains with planted pairs).
- embeddings: replica 0 verbatim; replica k>0 circularly rotates the
  dimensions by k — norm-preserving, cosine-decorrelating.
- events: ids shifted per replica (10x users), timestamps unchanged.
- customer names deliberately NOT perturbed: entity resolution then
  faces genuine 10-way duplicate entities (x100 candidate pressure).

Usage: python3 tools/make_sf1eq.py [src_sf_dir] [out_dir]
"""
import shutil
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1eq"
K = "UNNEST(range(0, 10)) AS kk(k)"

con = duckdb.connect()
import os
os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation"]:
    shutil.copy(f"{SF}/{t}.parquet", f"{OUT}/{t}.parquet")


def gen(name, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
    ).fetchone()[0]
    print(name, n)


gen("customer", f"""
  SELECT c_custkey + k*1000000 AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM read_parquet('{SF}/customer.parquet'), {K}""")
gen("supplier", f"""
  SELECT s_suppkey + k*1000000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SF}/supplier.parquet'), {K}""")
gen("part", f"""
  SELECT p_partkey + k*1000000 AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM read_parquet('{SF}/part.parquet'), {K}""")
gen("orders", f"""
  SELECT o_orderkey + k*10000000 AS o_orderkey,
         o_custkey + k*1000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SF}/orders.parquet'), {K}""")
gen("lineitem", f"""
  SELECT l_orderkey + k*10000000 AS l_orderkey,
         l_partkey + k*1000000 AS l_partkey,
         l_suppkey + k*1000000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SF}/lineitem.parquet'), {K}""")
gen("documents", f"""
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
  FROM read_parquet('{SF}/documents.parquet'), {K}""")
gen("embeddings", f"""
  SELECT vec_id + k*1000000 AS vec_id,
    CASE WHEN k = 0 THEN embedding ELSE
      CAST(list_transform(range(1, len(embedding)+1),
        d -> embedding[((d - 1 + k) % len(embedding)) + 1]) AS FLOAT[])
    END AS embedding,
    label
  FROM read_parquet('{SF}/embeddings.parquet'), {K}""")
gen("events", f"""
  SELECT event_id + k*1000000 AS event_id, ts,
         user_id + k*100000 AS user_id, event_type, value, props
  FROM read_parquet('{SF}/events.parquet'), {K}""")
