#!/usr/bin/env python3
"""Local replica of the driver's correctness check: for each query with an
oracle, load the Spark parquet result and the DuckDB oracle result, sort
columns by name and rows by value, and compare."""
import json, sys, glob
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft-out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}")
        fails.append(name)
        continue
    got = pd.read_parquet(f"{out_dir}/{name}")
    want = con.sql(sql).df()
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: got {list(got.columns)} want {list(want.columns)}")
        fails.append(name)
        continue
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(gs) != len(ws):
        print(f"ROWS     {name}: got {len(gs)} want {len(ws)}")
        fails.append(name)
        continue
    # normalize dtypes for compare
    try:
        eq = True
        for c in gs.columns:
            a, b = gs[c], ws[c]
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                import numpy as np
                if not np.allclose(a.astype(float).fillna(-1e300),
                                   b.astype(float).fillna(-1e300),
                                   rtol=1e-9, atol=1e-9):
                    eq = False
            elif str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                if not (pd.to_datetime(a, utc=True) == pd.to_datetime(b, utc=True)).all():
                    eq = False
            else:
                if not (a.astype(str).fillna("\x00") == b.astype(str).fillna("\x00")).all():
                    eq = False
            if not eq:
                print(f"VALUES   {name}: column {c} differs")
                print("  got :", a.head(5).tolist())
                print("  want:", b.head(5).tolist())
                break
        if eq:
            print(f"OK       {name} ({len(gs)} rows)")
        else:
            fails.append(name)
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails.append(name)

no_oracle = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
             if "." not in d.split("/")[-1] and d.split("/")[-1] not in oracle]
print(f"\nrows-only (no oracle): {sorted(no_oracle)}")
for n in sorted(no_oracle):
    try:
        df = pd.read_parquet(f"{out_dir}/{n}")
        print(f"  {n}: {len(df)} rows")
    except Exception as e:
        print(f"  {n}: unreadable ({e})")

print(f"\n{'ALL OK' if not fails else 'FAILED: ' + ', '.join(fails)}")
sys.exit(1 if fails else 0)
