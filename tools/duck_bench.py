#!/usr/bin/env python3
"""Time every DuckDB oracle SQL on the same parquet (driver-side tooling,
the single-node throughput proxy BENCH_NOTES compares against).

Usage: python3 tools/duck_bench.py <sf_dir> <verify_out_dir_with_oracle_sql.json> [reps]
Prints one JSON line: {"total": s, "queries": {name: min_sec}}.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if reps < 1:
        sys.exit(f"reps must be >= 1, got {reps}")
    with open(f"{oracle_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name, sql in sorted(oracles.items()):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"[duck_bench] {name} FAILED: {e}", file=sys.stderr)
                best = -1.0  # any failed rep marks the query failed
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 4)
        if best < 0:
            times[name] = -1.0
    ok = {k: v for k, v in times.items() if v >= 0}
    print(json.dumps({"total": round(sum(ok.values()), 2),
                      "n": len(ok), "queries": times}))


if __name__ == "__main__":
    main()
