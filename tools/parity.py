#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle and diff values exactly.

Usage: python3 tools/parity.py <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    got = pd.read_parquet(d)
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns: got {list(got.columns)} vs oracle {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rows: got {len(got)} vs oracle {len(exp)}"))
        continue
    # driver-style: sort rows for stability, then exact compare
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    diffs = []
    for c in got.columns:
        a, b = got_s[c], exp_s[c]
        # driver-strict: a dtype KIND mismatch (e.g. DuckDB HUGEINT -> float64
        # vs the engine's int64) breaks the driver's value hash even when every
        # value is numerically equal, so it must FAIL here. Same-kind width
        # differences (Spark row_number int32 vs DuckDB BIGINT int64) hash the
        # same on the driver (q09/q21/q71 are green), so widen-and-compare.
        if a.dtype.kind != b.dtype.kind:
            diffs.append(f"{c}: dtype {a.dtype} vs oracle {b.dtype}")
            continue
        if a.dtype != b.dtype:
            wide = b.dtype if b.dtype.itemsize >= a.dtype.itemsize else a.dtype
            a, b = a.astype(wide), b.astype(wide)
        neq = ~(a.eq(b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            diffs.append(f"{c}[{i}]: {a[i]!r} ({a.dtype}) vs {b[i]!r} ({b.dtype})")
    if diffs:
        fails.append((name, "; ".join(diffs[:3])))
    else:
        passes.append((name, len(got)))

for n, r in passes: print(f"PASS  {n} ({r} rows)")
for n, r in skips:  print(f"SKIP  {n} (no oracle, {r} rows)")
for n, m in fails:  print(f"FAIL  {n}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} rows-only")
sys.exit(1 if fails else 0)
