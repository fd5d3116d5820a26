#!/usr/bin/env python3
"""Per-query wrapper around compare.py with a HARD wall-clock timeout:
some oracles that are fine at the sf0.01 gate go pathological in DuckDB
at the 10x step (observed: 50+ GB spill); duckdb's soft interrupt does
not always land mid-spill, so each query gets its own subprocess the
wrapper can kill. Results merge into CORRECTNESS_sf1.json with
"oracle_timeout" (engine rows recorded) for the killed ones.

Usage: check_sf1_run.py <sfDir> <outDir> <skip-csv> <queries-csv> [secs]
"""
import json
import os
import subprocess
import sys

sfdir, outdir, skip, qs = sys.argv[1:5]
per_q = int(sys.argv[5]) if len(sys.argv) > 5 else 300
here = os.path.dirname(os.path.abspath(__file__))

record = {}
if os.path.exists("CORRECTNESS_sf1.json"):
    try:  # resume: keep prior per-query records, re-run what's asked
        record = json.load(open("CORRECTNESS_sf1.json"))["queries"]
    except Exception:
        record = {}

def dump():
    fails = [k for k, v in record.items()
             if v.get("status") == "fail" or v.get("rows") == 0]
    with open("CORRECTNESS_sf1.json", "w") as f:
        json.dump({"sf_dir": sfdir, "n": len(record),
                   "n_pass": sum(1 for v in record.values()
                                 if v["status"] == "pass"),
                   "fails": fails, "queries": record}, f, indent=1)
    return fails

for q in qs.split(","):
    tmp = f"/tmp/sf1_one_{q}.json"
    cmd = [sys.executable, os.path.join(here, "compare.py"), sfdir, outdir,
           skip, f"--only={q}", f"--json={tmp}",
           f"--oracle-timeout={max(30, per_q - 60)}"]
    try:
        subprocess.run(cmd, timeout=per_q, capture_output=True)
        with open(tmp) as f:
            one = json.load(f)["queries"].get(q, {"status": "fail",
                                                  "why": "no record"})
    except subprocess.TimeoutExpired:
        # engine output exists on disk; only the oracle replay was killed
        try:
            import duckdb
            n = duckdb.sql(
                f"SELECT count(*) FROM '{outdir}/{q}/*.parquet'"
            ).fetchone()[0]
        except Exception:
            n = -1
        one = {"status": "oracle_timeout", "rows": n}
    except Exception as e:  # missing tmp etc.
        one = {"status": "fail", "why": str(e)[:200]}
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # a spill-budget/disk exhaustion is the oracle's infeasibility at
    # this scale, not an engine failure — classify like a timeout
    if one.get("status") == "fail" and any(t in one.get("why", "") for t in
            ("No space left", "Could not write file",
             "temp_directory_size", "Out of Memory")):
        try:
            import duckdb
            n = duckdb.sql(
                f"SELECT count(*) FROM '{outdir}/{q}/*.parquet'"
            ).fetchone()[0]
        except Exception:
            n = -1
        one = {"status": "oracle_timeout", "rows": n,
               "why": "oracle replay exhausted its spill budget"}
    # UPGRADE PATH (round-8 verdict task 4): a query whose full oracle
    # was skipped (rows_only) or died (oracle_timeout) but that has a
    # declared LINEAR invariant oracle gets value-verified through it —
    # sampled exact recompute / closure-from-verified-pairs, see
    # graft.queries.Sf1Invariants. A pass records "invariant_pass"; a
    # violation is a real fail with the violated checks listed.
    inv_path = os.path.join(outdir, "sf1_invariants.json")
    has_inv = False
    if one.get("status") in ("rows_only", "oracle_timeout") and \
            os.path.exists(inv_path):
        try:
            has_inv = q in json.load(open(inv_path))
        except Exception:
            has_inv = False
    if has_inv:
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(here, "run_invariant.py"),
                 sfdir, outdir, q],
                timeout=per_q, capture_output=True, text=True)
            iv = json.loads(r.stdout.strip().splitlines()[-1])
            iv["oracle"] = "invariant"
            one = iv
        except Exception as e:
            one = {"status": "fail", "oracle": "invariant",
                   "why": str(e)[:200]}
    record[q] = one
    fails = dump()  # incremental: a killed run still leaves the artifact
    print(f"{one.get('status','?'):>14} {q}" +
          (f" ({one.get('rows')} rows)" if "rows" in one else ""), flush=True)

fails = dump()
print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
