#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run Verify output vs DuckDB.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: for each query, load the Spark parquet result and the
DuckDB result of oracle_sql.json, sort columns by name, sort rows, and
compare values exactly (with NaN==NaN).
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files])
    except Exception as e:
        print(f"FAIL {name}: read error {e}"); fails += 1; continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    # normalize dtypes for compare (dates/timestamps → str)
    for c in gs.columns:
        if gs[c].dtype != es[c].dtype:
            gs[c] = gs[c].astype(str); es[c] = es[c].astype(str)
    neq = ~((gs == es) | (gs.isna() & es.isna()))
    bad = neq.any(axis=1)
    if bad.any():
        i = bad.idxmax()
        print(f"FAIL {name}: {int(bad.sum())}/{len(gs)} rows differ; first @{i}:")
        print("  spark:", gs.iloc[i].to_dict())
        print("  duck :", es.iloc[i].to_dict())
        fails += 1
    else:
        print(f"OK   {name} ({len(gs)} rows)")
# rows-only queries (no oracle)
import os
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if os.path.isdir(p) and d not in oracle:
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{p}/*.parquet"))
        print(f"ROWS {d}: {n}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
