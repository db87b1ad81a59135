#!/usr/bin/env python3
"""Dev-loop oracle comparison (mirrors the driver's checker): for each query
dumped by DevVerifyMain, run its oracle SQL in DuckDB over the same parquet
tables and compare rows/schema/values after sorting columns by name."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)]
    # array columns (numpy ndarrays / lists) are unhashable+unsortable in
    # sort_values — stringify them first (same norm as tools/compare.py)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple))
                     or type(v).__name__ == "ndarray").any():
            df[c] = df[c].map(lambda v: "[" + ",".join(
                repr(float(x)) for x in v) + "]" if v is not None else None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(d + "/*.parquet")],
                         ignore_index=True)
    if name not in oracle:
        print(f"{name}: rows={len(spark_df)} (no oracle)")
        continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        continue
    s, o = canon(spark_df), canon(ora_df)
    rows = len(s) == len(o)
    schema = list(s.columns) == list(o.columns)
    if rows and schema:
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-12)
            print(f"{name}: MATCH rows={len(s)}")
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH rows={len(s)}: {str(e)[:300]}")
    else:
        print(f"{name}: rows_match={rows} ({len(s)} vs {len(o)}) schema_match={schema} "
              f"spark_cols={list(s.columns)} oracle_cols={list(o.columns)}")
