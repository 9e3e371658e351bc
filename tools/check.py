#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only;
the Scala library never depends on this). Runs after `graft.Verify` dumped
query results: for each query, executes the oracle SQL in DuckDB over the
same parquet tables and compares schema (sorted column names) + sorted rows.

Two comparison layers:
 1. exact values via fetchall() (semantic equality), and
 2. pandas-rendered values via .df() / read_parquet — the driver fetches
    through pandas, where DuckDB HUGEINT (sum of ints) and DECIMAL become
    float64/Decimal objects and hash differently from Spark's int64. Round 1
    lost 12 queries to exactly that, so the local gate now reproduces it.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else repr(v))
            elif v is None:
                row.append("NULL")
            else:
                row.append(str(v))
        out.append(tuple(row))
    out.sort()
    return out


def canon_pandas(df):
    """Canonicalize a pandas frame the way a value-hash over str(cell) would
    see it: column order by name, rows sorted, floats via repr."""
    df = df[sorted(df.columns)]
    out = []
    for r in df.itertuples(index=False, name=None):
        row = []
        for v in r:
            if isinstance(v, float):
                row.append("NaN" if math.isnan(v) else repr(v))
            elif v is None or v is pd.NaT:
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
            sel = "SELECT " + ", ".join(f'"{c}"' for c in got_cols)
            got = con.sql(
                sel + f" FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in exp_cols) +
                " FROM (" + sql + ")").fetchall()
            # pandas layer: spark result via pyarrow, oracle via duckdb .df()
            got_pd = pd.read_parquet(f"{out_dir}/{name}")
            exp_pd = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if g != e:
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            for a, b in [(a, b) for a, b in zip(g, e) if a != b][:3]:
                print(f"   got {a}\n   exp {b}")
            n_fail += 1
            continue
        gp, ep = canon_pandas(got_pd), canon_pandas(exp_pd)
        if gp != ep:
            print(f"FAIL {name}: pandas-rendered values differ "
                  f"(driver hash would mismatch)")
            print(f"   spark dtypes: {dict(got_pd.dtypes.astype(str))}")
            print(f"   oracle dtypes: {dict(exp_pd.dtypes.astype(str))}")
            for a, b in [(a, b) for a, b in zip(gp, ep) if a != b][:3]:
                print(f"   got {a}\n   exp {b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
