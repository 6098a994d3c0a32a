#!/usr/bin/env python3
"""Time the DuckDB oracle side of the bench comparison.

Runs every oracle SQL from a Verify output dir (oracle_sql.json) against the
given sf tables in DuckDB, min of N runs each, full materialization
(fetchall), and prints a sorted per-query table plus the total — the
baseline side of BASELINE.md's ratio.

Usage: python3 tools/bench_duck.py <sfDir> <verifyOutDir> [runs=2]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    times = {}
    for name in sorted(oracle):
        best = None
        for _ in range(runs):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = best
        print(f"{name:28s} {best:8.3f}s", flush=True)
    total = sum(times.values())
    print(f"{'TOTAL':28s} {total:8.3f}s  ({len(times)} queries, min of {runs})")
    json.dump({"total": total, "queries": times},
              open(f"{out_dir}/duck_times.json", "w"), indent=1)


if __name__ == "__main__":
    main()
