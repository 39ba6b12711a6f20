#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB against the sf parquet
tables, loads the corresponding Spark result parquet, sorts columns by
name and rows by all columns, and compares cell-by-cell (stringified).

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (ScaleUp/Soak corpora)
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        got = duckdb.connect().execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        w, g = norm(want), norm(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: cols want={list(w.columns)} got={list(g.columns)}")
            n_bad += 1; continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}"); n_bad += 1; continue
        if not w.equals(g):
            diff = (w != g).any(axis=1)
            print(f"FAIL {name}: {diff.sum()} differing rows; first:")
            print("  want:", w[diff].head(2).to_dict("records"))
            print("  got: ", g[diff].head(2).to_dict("records"))
            n_bad += 1; continue
        print(f"OK   {name} ({len(w)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
