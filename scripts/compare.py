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

args = [a for a in sys.argv[1:] if not a.startswith("--")]
only = set()
json_out = None
oracle_timeout = None  # seconds per oracle; hash-where-it-finishes
for a in sys.argv[1:]:
    if a.startswith("--only="):
        only = set(a[len("--only="):].split(","))
    if a.startswith("--json="):
        json_out = a[len("--json="):]
    if a.startswith("--oracle-timeout="):
        oracle_timeout = float(a[len("--oracle-timeout="):])
sfdir, outdir = args[0], args[1]
skip = set(args[2].split(",")) if len(args) > 2 else set()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
con.sql("SET temp_directory='/tmp/duckdb_spill'")  # never spill into the repo
# bound the spill: an oracle that cannot replay in 20 GB of temp at this
# scale errors out (classified oracle-infeasible) instead of filling the
# disk (q158's sf1 triangle replay ate 60 GB before dying)
con.sql("SET max_temp_directory_size='20GB'")
import os as _os
for t in TABLES:
    # driver testdata ships single files; Spark-written scale steps
    # (benchdata/sf1) are directories of part files
    src = f"{sfdir}/{t}.parquet"
    if _os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

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
record = {}
for name in sorted(oracle):
    if only and name not in only:
        continue
    if name in skip:
        # oracle too expensive at this scale: engine output rows-only
        try:
            n = con.sql(
                f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'"
            ).fetchone()[0]
            record[name] = {"status": "rows_only", "rows": n}
            if n == 0:
                fails.append(name)
            print(f"SKIP {name} (rows_only: {n})")
        except Exception as e:
            fails.append(name)
            record[name] = {"status": "fail", "why": f"exception {e}"[:200]}
            print(f"FAIL {name}: exception {e}")
        continue
    timer = None
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = spark_rel.columns
        srows = spark_rel.fetchall()
        if oracle_timeout:
            import threading
            timer = threading.Timer(oracle_timeout, con.interrupt)
            timer.start()
        orel = con.sql(oracle[name])
        ocols = orel.columns
        orows = orel.fetchall()
    except duckdb.InterruptException:
        # the ENGINE result exists; only the oracle replay blew the
        # budget at this scale -> record rows-only, not a failure
        record[name] = {"status": "oracle_timeout", "rows": len(srows)}
        if len(srows) == 0:
            fails.append(name)
        print(f"TIME {name}: oracle exceeded {oracle_timeout}s "
              f"(engine rows: {len(srows)})")
        continue
    except Exception as e:
        fails.append(name)
        record[name] = {"status": "fail", "why": f"exception {e}"[:200]}
        print(f"FAIL {name}: exception {e}")
        continue
    finally:
        if timer is not None:
            timer.cancel()
    sc, scn = canon(srows, scols)
    oc, ocn = canon(orows, ocols)
    if scn != ocn:
        fails.append(name)
        record[name] = {"status": "fail", "why": f"columns {scn} vs {ocn}"[:200]}
        print(f"FAIL {name}: columns {scn} vs {ocn}")
    elif len(sc) != len(oc):
        fails.append(name)
        record[name] = {"status": "fail", "why": f"rows {len(sc)} vs {len(oc)}"}
        print(f"FAIL {name}: rows {len(sc)} vs {len(oc)}")
    elif sc != oc:
        fails.append(name)
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        record[name] = {"status": "fail", "why": f"values differ: {diffs}"[:200]}
        print(f"FAIL {name}: values differ, first diffs: {diffs}")
    else:
        record[name] = {"status": "pass", "rows": len(sc),
                        "schema_match": True, "hash_match": True}
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

if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sfdir, "n": len(record),
                   "n_pass": sum(1 for v in record.values()
                                 if v["status"] == "pass"),
                   "fails": fails, "queries": record}, f, indent=1)
print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
