#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOut]

Loads each query's parquet dump from Verify, runs the matching oracle SQL
in DuckDB over views of the sf parquet tables, sorts columns by name and
rows by all columns, and compares cell-by-cell (exact for non-floats,
tiny-epsilon report for floats so we can see how close we are).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name in sorted(oracle):
    try:
        mine = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})")
        fail += 1
        continue
    try:
        ref = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"FAIL {name}: columns {list(mine.columns)} vs {list(ref.columns)}")
        fail += 1
        continue
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}")
        fail += 1
        continue
    # sort non-float columns first so a last-ulp float difference cannot
    # reorder rows and misalign the cell-by-cell compare
    sort_cols = sorted(mine.columns,
                       key=lambda c: pd.api.types.is_float_dtype(mine[c]))
    mine = mine.sort_values(sort_cols, ignore_index=True)
    ref = ref.sort_values(sort_cols, ignore_index=True)
    bad = []
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            a2 = a.astype(float).to_numpy(); b2 = b.astype(float).to_numpy()
            exact = np.array_equal(a2, b2, equal_nan=True)
            if not exact:
                d = np.nanmax(np.abs(a2 - b2))
                bad.append(f"{c}: float mismatch maxdiff={d:.3e}")
        else:
            try:
                eq = a.equals(b) or (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all()
            except Exception:
                eq = False
            if not eq:
                i = next(j for j in range(len(a)) if str(a.iloc[j]) != str(b.iloc[j]))
                bad.append(f"{c}: e.g. row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r} (dtype {a.dtype} vs {b.dtype})")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad))
        fail += 1
    else:
        print(f"OK   {name} ({len(mine)} rows)")
print(f"\n{len(oracle) - fail}/{len(oracle)} passed")
sys.exit(1 if fail else 0)
