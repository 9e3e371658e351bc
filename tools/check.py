#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only;
the Scala library never depends on this). Runs after `graft.Verify` dumped
query results: for each query, executes the oracle SQL in DuckDB over the
same parquet tables and compares schema (sorted column names) + sorted rows.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, ncols):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            elif v is None:
                row.append("NULL")
            else:
                row.append(str(v))
        out.append(tuple(row))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in got_cols) +
                f" FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                " FROM (" + sql + ")").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        g, e = canon(got, len(got_cols)), canon(exp, len(exp_cols))
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"   got {a}\n   exp {b}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
