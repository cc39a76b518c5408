#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare to the Spark result parquet
(columns sorted by name, rows sorted, values hashed). Usage:
  python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/verify_sf0001
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize numeric types, then sort rows for order-insensitive compare
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    try:
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            fails += 1; continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            fails += 1; continue
        eq = True
        for c in s.columns:
            a, b = s[c], o[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float),
                                   rtol=0, atol=1e-4, equal_nan=True):
                    eq = False
                    print(f"  col {c} mismatch, first diffs:")
                    d = (a.astype(float) - b.astype(float)).abs()
                    print(pd.DataFrame({"spark": a, "oracle": b, "d": d})
                          [d > 1e-4].head(3))
            else:
                if not a.astype(str).equals(b.astype(str)):
                    eq = False
                    m = a.astype(str) != b.astype(str)
                    print(f"  col {c} mismatch:")
                    print(pd.DataFrame({"spark": a, "oracle": b})[m].head(3))
        if eq:
            print(f"OK   {name} ({len(s)} rows)")
        else:
            print(f"FAIL {name}: value mismatch"); fails += 1
    except Exception as e:
        print(f"FAIL {name}: compare error: {e}"); fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
