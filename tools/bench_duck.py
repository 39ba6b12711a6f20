#!/usr/bin/env python3
"""DuckDB twin timing for the bench ratio.

Times every query in an oracle_sql.json dump (min-of-N, interleaved
passes like graft.Bench) against the sf parquet tables and writes
DUCK_TIMING.json at the repo root. graft.Bench merges that file into
its own JSON line when the sf dir matches, so each round's BENCH_r{N}
records both engines' totals and the per-key ratio instead of the
judge re-deriving them.

Usage: python3 tools/bench_duck.py <sfdir> <verify_outdir> [out.json]
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
RUNS = 3

def main(sfdir, outdir, out="DUCK_TIMING.json"):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(oracle)
    times = {n: [] for n in names}
    for _ in range(RUNS):  # interleaved passes, same rationale as Bench
        for n in names:
            t0 = time.time()
            con.execute(oracle[n]).fetchall()
            times[n].append(time.time() - t0)
    queries = {n: round(min(ts), 4) for n, ts in times.items()}
    doc = {"sf": sfdir, "runs": RUNS,
           "total_sec": round(sum(queries.values()), 3),
           "queries": queries}
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {len(queries)} queries, total {doc['total_sec']}s at {sfdir}")

if __name__ == "__main__":
    main(*sys.argv[1:])
