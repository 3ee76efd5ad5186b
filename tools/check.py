#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via sbt,
then execute each oracle_sql.json entry in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, values normalized).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
                              [--time-oracles] [--driver-compat]
                              [--exclude=<name> ...] [names...]

--driver-compat additionally replays the DRIVER's comparator semantics
(pandas-based): Spark output read via pandas.read_parquet (pyarrow types —
int64 stays int64, decimals stay Decimal), oracle result via duckdb
.df() (HUGEINT/DECIMAL(38,x) widen to float64), columns sorted by name,
rows sort_values'd (raises on unhashable array columns, exactly like the
driver), values stringified. This is stricter on TYPES than the exact
comparator above and catches the round-8 failure class (widened oracle
aggregates, array-typed columns) before the driver sees it.

--time-oracles additionally times each oracle (min of 3 executions) and
writes <outdir>/oracle_times.json: {query: {"sec": s, "echo": bool}} —
"echo" marks emitted-row oracles that read Spark's own dump (their DuckDB
time is not a meaningful engine comparison). tools/ratio.py joins this
with a BENCH json from the same SF to produce Spark/DuckDB ratios.
"""
import json, math, subprocess, sys, time
from pathlib import Path

import duckdb

# Positionals (sfdir, outdir, names...) and --flags may interleave: a
# `check.py <sf> --driver-compat` invocation must NOT mistake the flag
# for the output directory (it would dump parquet into ./--driver-compat).
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/graft_verify"
flags = [a for a in sys.argv[1:] if a.startswith("--")] + _pos[2:]
skip_verify = "--skip-verify" in flags
time_oracles = "--time-oracles" in flags
driver_compat = "--driver-compat" in flags
only = [a for a in flags if not a.startswith("--")]
# --exclude=<name> (repeatable): skip a query's ORACLE comparison — for
# endurance SFs where a specific DuckDB replay is quadratic/spilling
# (the Spark dump still runs; the exclusion is recorded in the summary).
exclude = {a.split("=", 1)[1] for a in flags if a.startswith("--exclude=")}

if not skip_verify:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8"})
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit(1)

oracle = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


fails, passes = [], []
for name in sorted(oracle):
    if (only and name not in only) or name in exclude:
        continue
    pdir = Path(OUT) / name
    if not pdir.exists():
        fails.append((name, "spark output missing"))
        continue
    try:
        scols_rel = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
        scols, srows = scols_rel.columns, scols_rel.fetchall()
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as e:
        fails.append((name, f"exec error: {e}"))
        continue
    sc, sr = canon(scols, srows)
    oc, orws = canon(ocols, orows)
    if sc != oc:
        fails.append((name, f"columns differ: spark={sc} oracle={oc}"))
        continue
    if len(sr) != len(orws):
        fails.append((name, f"row count: spark={len(sr)} oracle={len(orws)}"))
        continue
    if sr != orws:
        diff = [(a, b) for a, b in zip(sr, orws) if a != b][:3]
        fails.append((name, f"values differ, first diffs: {diff}"))
        continue
    passes.append((name, len(sr)))

if driver_compat:
    # Replay the driver's pandas normalization on both sides. The driver
    # reads Spark parquet with pandas (pyarrow dtypes) but materializes
    # the DuckDB oracle through .df() (which widens HUGEINT/DECIMAL(38,x)
    # to float64) — so a value-identical pair can still hash-mismatch on
    # rendered type. Reproduce that asymmetry exactly, fail on it here.
    import pandas as pd

    def compat_strings(df):
        cols = sorted(df.columns)
        df = df[cols]
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        return cols, [tuple(str(v) for v in row)
                      for row in df.itertuples(index=False, name=None)]

    for name in sorted(oracle):
        if (only and name not in only) or name in exclude:
            continue
        pdir = Path(OUT) / name
        if not pdir.exists():
            continue  # already reported by the exact pass
        try:
            sdf = pd.read_parquet(pdir)          # driver's Spark-side read
            odf = con.sql(oracle[name]).df()     # driver's oracle-side read
            sc2, sr2 = compat_strings(sdf)
            oc2, or2 = compat_strings(odf)
        except Exception as e:
            fails.append((name, f"driver-compat error: {e}"))
            continue
        if sc2 != oc2:
            fails.append((name,
                          f"driver-compat columns: spark={sc2} oracle={oc2}"))
        elif sr2 != or2:
            diff = [(a, b) for a, b in zip(sr2, or2) if a != b][:3]
            fails.append((name, f"driver-compat values (rendered-type "
                                f"mismatch?), first diffs: {diff}"))

if time_oracles:
    times = {}
    for name in sorted(oracle):
        if (only and name not in only) or name in exclude:
            continue
        sql = oracle[name]
        try:
            secs = []
            for _ in range(3):
                t0 = time.time()
                con.sql(sql).fetchall()
                secs.append(time.time() - t0)
            times[name] = {"sec": round(min(secs), 4),
                           "echo": str(Path(OUT).resolve()) in sql}
        except Exception as e:
            times[name] = {"sec": -1.0, "echo": False, "err": str(e)[:200]}
    Path(f"{OUT}/oracle_times.json").write_text(json.dumps(times, indent=1))
    print(f"wrote {OUT}/oracle_times.json ({len(times)} oracles timed)")

failed_names = {n for n, _ in fails}
for n, c in passes:
    if n not in failed_names:  # a driver-compat fail demotes an exact pass
        print(f"PASS {n} ({c} rows)")
for n, m in fails:
    print(f"FAIL {n}: {m}")
nq = len([n for n in oracle if (not only or n in only) and n not in exclude])
if exclude:
    print(f"excluded from oracle comparison: {sorted(exclude)}")
ok = len([1 for n, _ in passes if n not in failed_names])
print(f"\n{ok}/{nq} oracle queries pass" +
      (f" — {len(failed_names)} FAILED" if failed_names else ""))
sys.exit(1 if fails else 0)
