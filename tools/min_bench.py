#!/usr/bin/env python3
"""Per-query min of two bench JSON files (the plan-cost artifact: any
entry inflated by storage eviction in one heap configuration sits at
plan cost in the other, so min(48g, 96g) is the number that survives a
real cluster where caches spread across executors).

Usage: python3 tools/min_bench.py <a.json> <b.json> <out.json>
Fails loudly if the query sets differ or either side has a failed
(negative-time) entry the other cannot cover.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d["queries"], d


def main():
    a_path, b_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    qa, da = load(a_path)
    qb, _ = load(b_path)
    if set(qa) != set(qb):
        only_a = sorted(set(qa) - set(qb))
        only_b = sorted(set(qb) - set(qa))
        sys.exit(f"query sets differ: only in a={only_a} only in b={only_b}")
    queries = {k: min(qa[k], qb[k]) for k in qa}
    bad = sorted(k for k, v in queries.items() if v < 0)
    if bad:
        sys.exit(f"failed entries in both runs: {bad}")
    result = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "n_queries": len(queries),
        "queries": queries,
        "sf": da.get("sf"),
        "min_of": [a_path, b_path],
    }
    with open(out, "w") as f:
        json.dump(result, f)
    print(json.dumps({"total": result["value"], "n": len(queries),
                      "out": out}))


if __name__ == "__main__":
    main()
