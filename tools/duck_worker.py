#!/usr/bin/env python3
"""Persistent DuckDB timing worker for graft.Bench's INTERLEAVED
protocol.

Round-8 lesson: when the Spark suite and the DuckDB suite run as two
separate passes, a host-load burst skews whichever pass it lands on and
the committed ratio measures the neighbor, not the engine (the r8
sample read 2.49x while the same tree's quiet-window pair read 1.54x).
graft.Bench therefore times each key's Spark run and DuckDB run
BACK-TO-BACK in the same window, asking this worker for the DuckDB half
over a line protocol:

    stdin:  run <key>\n          stdout:  ok <key> <seconds>\n
            quit\n                        err <key> <one-line msg>\n

Timing happens HERE around execute+fetchall so JVM<->python IPC never
counts against DuckDB. Startup: `duck_worker.py <sfdir> <oracle.json>`,
prints `ready <n_keys>` once views and SQL are loaded.
"""
import json
import os
import sys
import threading
import time

import duckdb

# Optional per-query ceiling: a single unbounded oracle (sf1's
# quadratic dd_semantic twin ran 1400+ s) must not hold the whole
# paired protocol hostage. On expiry the statement is interrupted and
# reported as `err <key> timeout` — the key simply records no duck
# sample for that pass.
TIMEOUT_SEC = float(os.environ.get("DUCK_TIMEOUT_SEC", "inf"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships flat files; ScaleUp writes Spark dirs
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(oracle_path))
    print(f"ready {len(oracle)}", flush=True)
    for line in sys.stdin:
        line = line.strip()
        if line == "quit" or not line:
            break
        if not line.startswith("run "):
            print(f"err _ bad command {line.split()[0] if line else ''}",
                  flush=True)
            continue
        key = line[4:].strip()
        sql = oracle.get(key)
        if sql is None:
            print(f"err {key} no oracle", flush=True)
            continue
        timer = None
        if TIMEOUT_SEC != float("inf"):
            timer = threading.Timer(TIMEOUT_SEC, con.interrupt)
            timer.start()
        try:
            t0 = time.time()
            con.execute(sql).fetchall()
            print(f"ok {key} {time.time() - t0:.6f}", flush=True)
        except Exception as e:  # keep serving: one bad key != dead worker
            msg = " ".join(str(e).split())[:200]
            if timer is not None and not timer.is_alive():
                msg = f"timeout after {TIMEOUT_SEC}s: {msg}"
            print(f"err {key} {msg}", flush=True)
        finally:
            if timer is not None:
                timer.cancel()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
