#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each SparkEntry query,
read the Verify parquet dump and compare against the DuckDB oracle SQL
(columns sorted by name, rows sorted, exact value match)."""
import json, math, sys
import duckdb

def norm(v):
    # array columns (embeddings, array_agg results): element-wise
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); n_bad += 1; continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error ({e})"); n_bad += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} vs {ec}"); n_bad += 1; continue
        g = [tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)]
        e = [tuple(norm(v) for v in r) for r in exp[ec].itertuples(index=False)]
        g.sort(); e.sort()
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_bad += 1; continue
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {bad}"); n_bad += 1; continue
        print(f"OK   {name}: {len(g)} rows"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
