#!/usr/bin/env python3
"""Local dev harness approximating the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare.py <sfDir> <outDir> [skip1,skip2] [--only=q1,q2]

Loads each <outDir>/<name> parquet result, runs <outDir>/oracle_sql.json's
SQL in DuckDB with the sf tables registered as views, sorts columns by
name and rows by value, and compares with float tolerance. Dev-side only —
NOT part of the engine (the real driver does its own compare).
"""
import json
import math
import sys

import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
only = set()
for a in sys.argv[1:]:
    if a.startswith("--only="):
        only = set(a[len("--only="):].split(","))
sfdir, outdir = args[0], args[1]
skip = set(args[2].split(",")) if len(args) > 2 else set()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)  # float normalization guess
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in order]

fails = []
for name in sorted(oracle):
    if only and name not in only:
        continue
    if name in skip:
        print(f"SKIP {name}")
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = spark_rel.columns
        srows = spark_rel.fetchall()
        orel = con.sql(oracle[name])
        ocols = orel.columns
        orows = orel.fetchall()
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: exception {e}")
        continue
    sc, scn = canon(srows, scols)
    oc, ocn = canon(orows, ocols)
    if scn != ocn:
        fails.append(name)
        print(f"FAIL {name}: columns {scn} vs {ocn}")
    elif len(sc) != len(oc):
        fails.append(name)
        print(f"FAIL {name}: rows {len(sc)} vs {len(oc)}")
    elif sc != oc:
        fails.append(name)
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        print(f"FAIL {name}: values differ, first diffs: {diffs}")
    else:
        print(f"OK   {name}: {len(sc)} rows")

# rows-only queries (no oracle)
import glob as g
import os
for d in sorted(g.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    if name in oracle or not os.path.isdir(d):
        continue
    n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    status = "OK  " if n > 0 else "FAIL"
    if n == 0:
        fails.append(name)
    print(f"{status} {name}: rows-only, {n} rows")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
