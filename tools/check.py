#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOut]

Loads each query's parquet dump from Verify, runs the matching oracle SQL
in DuckDB over views of the sf parquet tables, sorts columns by name and
rows by all columns, and compares cell-by-cell (exact for non-floats,
tiny-epsilon report for floats so we can see how close we are).

HARDENED (round 12, after the r11 driver reds): the r11 version fetched
oracle results with .df() (DuckDB HUGEINT / wide DECIMAL -> lossy pandas
float64) and compared float-dtype columns via astype(float) on BOTH
sides, so wide-integer portability bugs passed locally and only turned
red in the driver's gate. Now:
  * oracle results come through Arrow (decimal128 stays an exact
    python Decimal object; int64 stays int64) — never .df()'s float64;
  * an AUTHORING LINT fails any query whose oracle result (or Spark
    parquet dump) contains HUGEINT or DECIMAL wider than int64
    (precision > 18) — those cannot survive the driver's float64
    canonicalization even when values match, so they are portability
    bugs at authoring time;
  * a column only enters the float-compare path if BOTH sides are float
    at the source; a float/non-float dtype split is allowed only when
    the non-float side's values round-trip float64 exactly (|v| < 2^53),
    otherwise it is flagged as a portability error.
"""
import sys, json, glob, os
from decimal import Decimal
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

MAX_EXACT = float(2**53)  # largest range where float64 holds every integer


def wide_duck_types(rel):
    """Oracle result columns the driver cannot canonicalize exactly."""
    bad = []
    for c, t in zip(rel.columns, rel.types):
        s = str(t)
        if s in ("HUGEINT", "UHUGEINT"):
            bad.append(f"{c}: {s}")
        elif s.startswith("DECIMAL"):
            prec = int(s.split("(")[1].split(",")[0])
            if prec > 18:
                bad.append(f"{c}: {s}")
    return bad


def wide_parquet_types(path):
    """Spark dump columns wider than int64 (same driver limitation)."""
    bad = []
    for f in glob.glob(f"{path}/*.parquet"):
        for field in pq.read_schema(f):
            if pa.types.is_decimal(field.type) and field.type.precision > 18:
                bad.append(f"{field.name}: {field.type}")
        break
    return bad


def roundtrips_float64(series):
    """True if every non-null value survives a float64 round-trip."""
    vals = series.dropna()
    if vals.empty:
        return True
    try:
        return all(abs(float(v)) < MAX_EXACT and
                   (Decimal(str(v)) == Decimal(repr(float(v)))
                    if not isinstance(v, (int, np.integer))
                    else int(v) == int(float(v)))
                   for v in vals)
    except Exception:
        return False


oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
skipped = 0
# committed golden VALUES relations are pinned to the sf0.01 fixture
# (the driver's gate scale); at any other sf the Spark side trains on
# that corpus while the golden stays sf0.01's — skip loudly instead of
# reporting a false red
SF_PINNED = {"q_bpe_vocab", "q_bpe_tokens"}

for name in sorted(oracle):
    if name in SF_PINNED and os.path.basename(os.path.normpath(sf)) != "sf0.01":
        print(f"SKIP {name}: golden oracle pinned to sf0.01 (running {sf})")
        skipped += 1
        continue
    try:
        mine = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})")
        fail += 1
        continue
    try:
        rel = con.sql(oracle[name])
        wide = wide_duck_types(rel)
        if wide:
            print(f"FAIL {name}: PORTABILITY oracle emits wide ints the "
                  f"driver canonicalizes through float64: {'; '.join(wide)} "
                  f"(cast ::BIGINT, or emit as ::VARCHAR on both engines)")
            fail += 1
            continue
        wide_sp = wide_parquet_types(f"{out}/{name}")
        if wide_sp:
            print(f"FAIL {name}: PORTABILITY spark dump has decimal wider "
                  f"than int64: {'; '.join(wide_sp)}")
            fail += 1
            continue
        # Arrow keeps exact types: int64 stays int64, any decimal becomes
        # python Decimal objects — never .df()'s lossy float64.
        ref = rel.arrow().to_pandas()
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
        a_f = pd.api.types.is_float_dtype(a)
        b_f = pd.api.types.is_float_dtype(b)
        if a_f or b_f:
            # A float/non-float split is only admissible when the
            # non-float side is exactly representable in float64 —
            # otherwise the driver's canonicalization loses digits and
            # the hash gate turns red even for equal values.
            if a_f != b_f:
                nonf = b if a_f else a
                side = "oracle" if a_f else "spark"
                if not roundtrips_float64(nonf):
                    bad.append(f"{c}: PORTABILITY {side} side is "
                               f"non-float with values that don't "
                               f"round-trip float64 (dtype {a.dtype} vs "
                               f"{b.dtype})")
                    continue
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
total = len(oracle) - skipped
print(f"\n{total - fail}/{total} passed"
      + (f" ({skipped} skipped: sf0.01-pinned goldens)" if skipped else ""))
sys.exit(1 if fail else 0)
