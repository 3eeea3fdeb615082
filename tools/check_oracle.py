#!/usr/bin/env python3
"""Local replica of the driver's correctness check: for each query with an
oracle, load the Spark parquet result and the DuckDB oracle result, sort
columns by name and rows by value, and compare.

STRICT BY DEFAULT: dtype-kind equality + BITWISE float compare. The driver
hashes rendered values, so an int64 180 vs a DECIMAL-derived float64 180.0
is a driver-level mismatch that an allclose compare hides (that is exactly
how the round-6 graph_modularity red slipped through locally). Pass
--lenient only for exploratory triage — the shipping gate is strict.
"""
import json, sys, glob
import duckdb
import numpy as np
import pandas as pd

args = [a for a in sys.argv[1:] if a not in ("--strict", "--lenient")]
strict = "--lenient" not in sys.argv[1:]
out_dir = args[0] if len(args) > 0 else "/tmp/graft-out"
sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def bits_equal(a, b):
    """Bitwise float64 equality, treating any-NaN == any-NaN."""
    av = a.astype(np.float64).values
    bv = b.astype(np.float64).values
    same_bits = av.view(np.int64) == bv.view(np.int64)
    both_nan = np.isnan(av) & np.isnan(bv)
    return bool(np.all(same_bits | both_nan))


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
            a_f = a.dtype.kind in "fc"
            b_f = b.dtype.kind in "fc"
            if strict and a.dtype.kind != b.dtype.kind and (a_f or b_f):
                # int-vs-float column type: the driver's exact hash sees
                # different renderings (180 vs 180.0) even when values match
                print(f"DTYPE    {name}: column {c} got {a.dtype} want {b.dtype}")
                eq = False
            elif a_f or b_f:
                if strict:
                    if not bits_equal(a.fillna(np.nan), b.fillna(np.nan)):
                        print(f"FLOATBITS {name}: column {c} differs bitwise")
                        eq = False
                elif not np.allclose(a.astype(float).fillna(-1e300),
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
