#!/usr/bin/env python3
"""Time every DuckDB oracle SQL on the same parquet (driver-side tooling,
the single-node throughput proxy BENCH_NOTES compares against).

Usage: python3 tools/duck_bench.py <sf_dir> <verify_out_dir_with_oracle_sql.json> [reps] [timeout_sec]
Prints one JSON line: {"total": s, "queries": {name: min_sec}}.
A query that exceeds timeout_sec (default: none) is interrupted and
reported as -2.0; its timeout floor is added to "timed_out_floor_sec"
so the total comparison stays honest (the engine needed AT LEAST that).
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main():
    sf_dir, oracle_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if reps < 1:
        sys.exit(f"reps must be >= 1, got {reps}")
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None
    with open(f"{oracle_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = connect(sf_dir)
    times = {}
    timed_out_floor = 0.0
    for name, sql in sorted(oracles.items()):
        best = None
        timed_out = False
        failed = False
        for _ in range(reps):
            # The timer callback re-checks `done` under the lock before
            # interrupting, so a rep that finishes just as the timer
            # fires is not misclassified; if the callback nonetheless
            # fired without the rep seeing an InterruptException, the
            # interrupt is pending on an idle connection and would hit
            # the NEXT rep/query — reopen the connection to discard it.
            timer = None
            lock = threading.Lock()
            state = {"done": False, "fired": False}
            if timeout is not None:
                def fire(st=state, lk=lock, c=con):
                    with lk:
                        if not st["done"]:
                            st["fired"] = True
                            c.interrupt()
                timer = threading.Timer(timeout, fire)
                timer.start()
            t0 = time.monotonic()
            interrupted = False
            try:
                con.sql(sql).fetchall()
            except duckdb.InterruptException:
                # classified by exception type, not wall clock: a slow
                # genuine failure stays a failure, an interrupt is a
                # timeout even if delivery lands marginally early/late
                dt = time.monotonic() - t0
                print(f"[duck_bench] {name} TIMEOUT after {dt:.1f}s",
                      file=sys.stderr)
                interrupted = True
                timed_out = True
            except Exception as e:
                print(f"[duck_bench] {name} FAILED: {e}", file=sys.stderr)
                best = -1.0  # a genuinely failed rep marks the query failed
                failed = True
            finally:
                with lock:
                    state["done"] = True
                if timer is not None:
                    timer.cancel()
            if state["fired"] and not interrupted:
                con = connect(sf_dir)
            if timed_out or failed:
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if timed_out and (best is None or best < 0):
            # only count the floor when NO rep ever completed: a valid
            # earlier measurement beats one contended/interrupted rep
            best = -2.0
            timed_out_floor += timeout
        times[name] = best if best < 0 else round(best, 4)
    ok = {k: v for k, v in times.items() if v >= 0}
    out = {"total": round(sum(ok.values()), 2), "n": len(ok),
           "queries": times}
    if timed_out_floor > 0:
        out["timed_out_floor_sec"] = round(timed_out_floor, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
