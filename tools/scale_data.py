#!/usr/bin/env python3
"""Scale the driver's synthetic corpus by replicating with key offsets
(driver-side tooling, like check.py — NOT part of the Spark library).

Usage: python3 tools/scale_data.py <src_sf_dir> <dst_dir> <factor>

Replica i shifts every surrogate key by i * (max_key + 1), so per-key
densities, join fan-outs and value distributions match the source scale
point while row counts grow `factor`x. Text/embedding payloads are
perturbed per replica (word-level mutation / vector roll) so the dedup and
similarity operators see a genuinely larger corpus, not `factor` exact
copies of every document (which would explode near-dup pair counts
quadratically and misrepresent scaling). region/nation are dimension
constants and are copied as-is, mirroring TPC-H's fixed small dims.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def offset_cols(table, offsets, i):
    arrays = []
    for name in table.schema.names:
        col = table.column(name)
        if name in offsets and i > 0:
            col = pc.add(col, offsets[name] * i)
        arrays.append(col)
    return pa.table(arrays, schema=table.schema)


def key_space(src, name, col):
    """Stride for an entity's surrogate keys, from the entity's OWN
    table: a foreign key must shift by the REFERENCED dimension's key
    space, not its own max — offsetting o_custkey by max(o_custkey)+1
    silently breaks referential integrity whenever the highest custkey
    placed no orders (dense synthetic data hides this; real TPC-H has a
    third of customers orderless)."""
    t = pq.read_table(f"{src}/{name}.parquet", columns=[col])
    return pc.max(t.column(col)).as_py() + 1


def replicate(src, dst, name, offsets, factor, perturb=None):
    t = pq.read_table(f"{src}/{name}.parquet")
    parts = []
    for i in range(factor):
        r = offset_cols(t, offsets, i)
        if perturb is not None and i > 0:
            r = perturb(r, i)
        parts.append(r)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/{name}.parquet",
                   coerce_timestamps=None, store_schema=True,
                   use_deprecated_int96_timestamps=False,
                   version="2.6")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def mutate_text(table, i):
    """Deterministically mutate ~every 4th word per replica (position- and
    replica-keyed suffix). A word-level mutation breaks nearly every
    multi-word shingle — rotating word order does NOT (rotation preserves
    all consecutive pairs except the two junction points, so replicas
    band together as near-dups and pair counts explode quadratically at
    the larger scale). Word count, whitespace and length distributions
    stay close to the source, so scan/tokenize cost per row is unchanged."""
    texts = table.column("text").to_pylist()
    out = []
    for s in texts:
        w = s.split(" ")
        for p in range(len(w)):
            if (p * 31 + i * 7) % 4 == 0:
                w[p] = w[p] + chr(ord("a") + (i + p) % 26)
        out.append(" ".join(w))
    arrays = []
    for name in table.schema.names:
        if name == "text":
            arrays.append(pa.array(out, type=pa.string()))
        else:
            arrays.append(table.column(name))
    return pa.table(arrays, schema=table.schema)


def roll_embeddings(table, i):
    """Roll each vector by i positions — norm-preserving, direction-
    changing, so replicas are not embedding near-dups of the source."""
    emb = table.column("embedding").to_pylist()
    rolled = [np.roll(np.asarray(v, dtype=np.float32), i).tolist() for v in emb]
    arrays = []
    for name in table.schema.names:
        if name == "embedding":
            arrays.append(pa.array(rolled, type=table.schema.field("embedding").type))
        else:
            arrays.append(table.column(name))
    return pa.table(arrays, schema=table.schema)


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for dim in ("region", "nation"):
        shutil.copyfile(f"{src}/{dim}.parquet", f"{dst}/{dim}.parquet")
        print(f"{dim}: copied (fixed dimension)")
    custk = key_space(src, "customer", "c_custkey")
    suppk = key_space(src, "supplier", "s_suppkey")
    partk = key_space(src, "part", "p_partkey")
    orderk = key_space(src, "orders", "o_orderkey")
    replicate(src, dst, "customer", {"c_custkey": custk}, factor)
    replicate(src, dst, "supplier", {"s_suppkey": suppk}, factor)
    replicate(src, dst, "part", {"p_partkey": partk}, factor)
    replicate(src, dst, "orders",
              {"o_orderkey": orderk, "o_custkey": custk}, factor)
    replicate(src, dst, "lineitem",
              {"l_orderkey": orderk, "l_partkey": partk, "l_suppkey": suppk}, factor)
    replicate(src, dst, "events",
              {"event_id": key_space(src, "events", "event_id"),
               "user_id": key_space(src, "events", "user_id")}, factor)
    replicate(src, dst, "documents",
              {"doc_id": key_space(src, "documents", "doc_id")}, factor,
              perturb=mutate_text)
    replicate(src, dst, "embeddings",
              {"vec_id": key_space(src, "embeddings", "vec_id")}, factor,
              perturb=roll_embeddings)


if __name__ == "__main__":
    main()
