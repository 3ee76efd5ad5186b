#!/usr/bin/env python3
"""Deletion-tamper negative test for the emitted-row/bound oracles.

The approximate family's oracles read Spark's own dumped result back
(__SPARK_OUT__), so a purely per-row oracle would pass vacuously if rows
went missing. Each of those oracles therefore carries a completeness
guard (planted-pair presence, per-query k-counts, corpus bijection,
candidate-set equality, group coverage). This tool proves the guards are
live: it copies a verify dump, DELETES targeted rows from each query's
parquet, and asserts the oracle now FAILS the driver-style compare.

Usage:
    python3 tools/check.py  <sfdir> <outdir>          # produce a dump
    python3 tools/tamper_test.py <sfdir> <outdir>     # tamper + recheck

Exit 0 iff every tampered query turns red.
"""
import json
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SRC = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
DST = Path(str(SRC) + "_tampered")

# Query -> SQL predicate selecting the row(s) to DELETE from its dump
# (src = the query's own result). Each targets the exact scenario the
# completeness guard exists for.
TARGETS = {
    # per-query k-count guard: one missing (query 0, rank 1) row
    "q_s3_lsh_topk": "query_id = 0 AND rank = 1",
    "q_s4_ivf_topk": "query_id = 0 AND rank = 1",
    "q_s6_ivf_indexed": "query_id = 0 AND rank = 1",
    # k-count + append-visibility self-presence guard: rank 1 IS the
    # query's own appended vector — deleting it trips both
    "q_s18_ivf_append": "query_id = 0 AND rank = 1",
    # planted-pair guard: remove ONE planted identical-clone pair
    "q_d4_minhash_neardup":
        "id_b - id_a = 1000000000 AND id_a = "
        "(SELECT MIN(id_a) FROM src WHERE id_b - id_a = 1000000000)",
    "q_d5_simhash_neardup":
        "id_b - id_a = 1000000000 AND hamming = 0 AND id_a = "
        "(SELECT MIN(id_a) FROM src "
        " WHERE id_b - id_a = 1000000000 AND hamming = 0)",
    "q_st2_stream_neardup":
        "id_b - id_a = 1000000000 AND hamming = 0 AND id_a = "
        "(SELECT MIN(id_a) FROM src "
        " WHERE id_b - id_a = 1000000000 AND hamming = 0)",
    # cross-batch planted-clone guard: remove ONE (clone, original) pair
    "q_d15_incremental_neardup":
        "id_new - id_hist = 1000000000 AND id_hist = "
        "(SELECT MIN(id_hist) FROM src WHERE id_new - id_hist = 1000000000)",
    # planted identical-vector pair guard: remove ONE planted clone pair
    "q_s5_cosine_neardup":
        "id_b - id_a = 1000000000 AND id_a = "
        "(SELECT MIN(id_a) FROM src WHERE id_b - id_a = 1000000000)",
    # corpus-bijection guard: drop one manifest row
    "q_d6_dedup_near": "doc_id = (SELECT MIN(doc_id) FROM src)",
    "q_s7_embed_dedup_manifest": "id = (SELECT MIN(id) FROM src)",
    # planted-corpus bijection + planted-pair keeper guard: drop a planted
    # clone's manifest row (bijection breaks; keeper check loses its pair)
    "q_s13_semantic_dedup": "id = (SELECT MIN(id) FROM src WHERE id >= 1000000000)",
    # candidate-set equality guard: drop one heavy hitter
    "q_t16_cms_heavyhitters": "token = (SELECT MIN(token) FROM src)",
    # source-coverage guard: drop the union row
    "q_t17_hll_distinct": "source = '__all__'",
    # group-coverage guard: drop one event type
    "q_a15_approx_percentiles":
        "event_type = (SELECT MIN(event_type) FROM src)",
    # source-coverage guard: drop one source's summary row
    "q_t21_temperature_mixture": "source = (SELECT MIN(source) FROM src)",
    # planted-pair guard: remove ONE planted (bench clone, bench) pair
    "q_t26_fuzzy_decontaminate":
        "train_id - bench_id = 1000000000 AND bench_id = "
        "(SELECT MIN(bench_id) FROM src WHERE train_id - bench_id = 1000000000)",
    # corpus-bijection guard: drop one doc's accounting row
    "q_t22_bpe_stats": "doc_id = (SELECT MIN(doc_id) FROM src)",
    # corpus-bijection + holdout-AUC guard: drop one scored row
    "q_t24_quality_classifier": "doc_id = (SELECT MIN(doc_id) FROM src)",
    # corpus-bijection + mean-gap guard: drop one weighted row
    "q_t25_dsir_weights": "doc_id = (SELECT MIN(doc_id) FROM src)",
    # (vector x subspace)-bijection guard: drop one code row
    "q_s9_pq_codes": "vec_id = (SELECT MIN(vec_id) FROM src) AND subspace = 0",
    # full serving-path replay: the oracle regenerates all k rows from the
    # index artifacts, so any deleted row mismatches
    "q_s10_pq_topk": "query_id = 0 AND rank = 1",
    "q_s12_ivfpq_topk": "query_id = 0 AND rank = 1",
    # long-form codebook/centroid count+bijection guards (round 9): a
    # missing (subspace, code, dim) / (cell, dim) element row flips the
    # structural `complete` gate and empties the echo
    "q_s8_pq_codebook": "subspace = 0 AND code = 0 AND dim = 0",
    "q_s11_ivf_centroids": "cell = 0 AND dim = 0",
    # set-equality guards of the recall audits: ANY deleted truth row
    # breaks COUNT(sp) = COUNT(truth) and empties the oracle
    "q_d18_lsh_recall":
        "id_b - id_a = 1000000000 AND id_a = "
        "(SELECT MIN(id_a) FROM src WHERE id_b - id_a = 1000000000)",
    "q_s25_ivf_recall": "query_id = 0 AND rank = 1",
    "q_s26_hnsw_recall": "query_id = 0 AND rank = 1",
    # closed-form fixture replay: a lost page/describe shifts the counts
    "q_k4_aws_scan": "service = 'ec2' AND region = 'us-east-1'",
    # k-count + append-visibility self-presence guard (the q_s18 twin on
    # the navigable-graph index): rank 1 IS the query's own appended row
    "q_s27_hnsw_append": "query_id = 0 AND rank = 1",
    # single-row result: deleting the path row leaves 0 rows vs the
    # oracle's 1 — rows_match breaks
    "q_g19_recursive_path": "depth = 3",
    # streaming-ingest self-presence + exactly-once count: rank 1 IS the
    # query's own stream-appended vector, and every surviving row still
    # carries ingested_total — deleting the self row trips the floor
    "q_s28_stream_ivf_ingest": "query_id = 0 AND rank = 1",
    "q_s29_stream_hnsw_ingest": "query_id = 0 AND rank = 1",
    # snapshot-isolation + self-presence: rank 1 at v_latest IS the
    # query's own appended vector
    "q_s30_versioned_ann": "version = 'v_latest' AND query_id = 0 AND rank = 1",
    # versioned-HNSW twin: same v_latest self-presence + k-count guards
    "q_s31_versioned_hnsw": "version = 'v_latest' AND query_id = 0 AND rank = 1",
    # retrain lifecycle: self-presence over the retrained index's probes
    "q_s32_ivf_retrain": "query_id = 0 AND rank = 1",
}

if not (SRC / "oracle_sql.json").exists():
    sys.exit(f"no dump at {SRC}; run tools/check.py first")

if DST.exists():
    shutil.rmtree(DST)
shutil.copytree(SRC, DST)
# Re-point the __SPARK_OUT__-resolved absolute paths at the tampered copy.
osql = (DST / "oracle_sql.json").read_text()
(DST / "oracle_sql.json").write_text(
    osql.replace(str(SRC.resolve()), str(DST.resolve())))

con = duckdb.connect()
for name, predicate in TARGETS.items():
    qdir = DST / name
    files = sorted(qdir.glob("*.parquet"))
    if not files:
        sys.exit(f"{name}: no parquet in dump")
    con.sql(f"CREATE OR REPLACE TEMP VIEW src AS "
            f"SELECT * FROM '{qdir}/*.parquet'")
    before = con.sql("SELECT COUNT(*) FROM src").fetchone()[0]
    deleted = con.sql(f"SELECT COUNT(*) FROM src WHERE {predicate}"). \
        fetchone()[0]
    if deleted == 0:
        sys.exit(f"{name}: tamper predicate matched no rows — test is dead")
    tmp = qdir / "_tampered.parquet.tmp"
    con.sql(f"COPY (SELECT * FROM src WHERE NOT ({predicate})) "
            f"TO '{tmp}' (FORMAT PARQUET)")
    for f in files:
        f.unlink()
    tmp.rename(qdir / "part-tampered.parquet")
    print(f"tampered {name}: deleted {deleted}/{before} rows")

r = subprocess.run(
    [sys.executable, str(Path(__file__).parent / "check.py"),
     SF, str(DST), "--skip-verify", *TARGETS],
    capture_output=True, text=True)
print(r.stdout)

failed = {line.split()[1].rstrip(":") for line in r.stdout.splitlines()
          if line.startswith("FAIL ")}
missed = [q for q in TARGETS if q not in failed]
if missed:
    print(f"TAMPER TEST FAILED — deletion NOT detected for: {missed}")
    sys.exit(1)
print(f"tamper test OK: all {len(TARGETS)} deletions turned the oracle red")
