#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB against the
fixture parquet tables, loads the Spark result parquet written by
graft.Verify, sorts columns by name (like the driver), and compares
schema + values strictly. Not product code — iteration harness only.

Usage: python3 tools/check.py [sf_dir] [verify_outdir]
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_ok = n_fail = 0
for name in sorted(oracle):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        n_fail += 1
        continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    problems = []
    if list(got.columns) != list(exp.columns):
        problems.append(f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}")
    elif len(got) != len(exp):
        problems.append(f"row count: spark={len(got)} oracle={len(exp)}")
    else:
        for c in got.columns:
            gd, ed = str(got[c].dtype), str(exp[c].dtype)
            if gd != ed:
                problems.append(f"dtype[{c}]: spark={gd} oracle={ed}")
        if not problems:
            neq = None
            for c in got.columns:
                g, e = got[c], exp[c]
                same = (g.isna() & e.isna()) | (g == e)
                if not same.all():
                    i = same.idxmin()
                    neq = f"value[{c}] row {i}: spark={g[i]!r} oracle={e[i]!r}"
                    break
            if neq:
                problems.append(neq)
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems))
        n_fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
        n_ok += 1

print(f"\n{n_ok} ok, {n_fail} fail")
sys.exit(1 if n_fail else 0)
