#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT part of the library).

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the same
parquet tables, then compares against the Spark result parquet: columns
sorted by name, rows sorted by all columns, values hashed. Prints per-query
PASS/FAIL with a diff preview on mismatch.

Usage: python3 scripts/check.py <sf_dir> <verify_out_dir>
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for name in ["region","nation","customer","supplier","part","orders",
             "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints → int64, floats → float64, bools → bool, rest → str
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def h(df: pd.DataFrame) -> str:
    return hashlib.sha256(df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()[:16]

fails = 0
for name in sorted(json.load(open(f"{out}/oracle_sql.json")) | {
        k.rsplit('/',1)[-1]: None for k in glob.glob(f"{out}/*") if not k.endswith('.json')}):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name:24s} NO-OUTPUT"); fails += 1; continue
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    if name not in oracle or oracle[name] is None:
        print(f"{name:24s} rows-only rows={len(got)}" + ("  EMPTY!" if len(got)==0 else ""))
        if len(got)==0: fails += 1
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE-ERROR {str(e)[:150]}"); fails += 1; continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"{name:24s} SCHEMA-MISMATCH got={list(g.columns)} want={list(w.columns)}"); fails += 1; continue
    if len(g) != len(w):
        print(f"{name:24s} ROWCOUNT got={len(g)} want={len(w)}"); fails += 1; continue
    if h(g) == h(w):
        print(f"{name:24s} PASS rows={len(g)}")
    else:
        fails += 1
        print(f"{name:24s} HASH-MISMATCH rows={len(g)}")
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        print("  first diffs (got vs want):")
        print(pd.concat([g[bad].head(3).add_suffix("_got"),
                         w[bad].head(3).add_suffix("_want")], axis=1).to_string()[:1500])
print(f"\n{'ALL PASS' if fails==0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
