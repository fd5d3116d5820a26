#!/usr/bin/env python3
"""Run one sf1 invariant SQL (from <outDir>/sf1_invariants.json) in
DuckDB with the sf tables registered as views, substituting {OUT} with
the query's output glob and {ROOT} with the output root. The SQL
returns violation rows; zero rows = every invariant holds.

Prints one JSON line: {"status": "invariant_pass"|"fail",
"rows": <engine rows>, "violations": [...]}.

Usage: run_invariant.py <sfDir> <outDir> <query>
"""
import json
import os
import sys

import duckdb

sfdir, outdir, qname = sys.argv[1:4]
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

con = duckdb.connect()
con.sql("SET temp_directory='/tmp/duckdb_spill'")
con.sql("SET max_temp_directory_size='20GB'")
for t in TABLES:
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

inv = json.load(open(os.path.join(outdir, "sf1_invariants.json")))
sql = inv[qname]
sql = sql.replace("{OUT}", f"{outdir}/{qname}/*.parquet")
sql = sql.replace("{ROOT}", outdir)

rows = con.sql(
    f"SELECT count(*) FROM '{outdir}/{qname}/*.parquet'").fetchone()[0]
viol = con.sql(sql).fetchall()
out = {"status": "invariant_pass" if not viol and rows > 0 else "fail",
       "rows": rows,
       "violations": [[str(c) for c in r] for r in viol]}
if rows == 0 and not viol:
    out["violations"] = [["empty_result", "0"]]
print(json.dumps(out))
sys.exit(0 if out["status"] == "invariant_pass" else 1)
