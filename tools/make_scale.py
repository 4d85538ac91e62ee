#!/usr/bin/env python3
"""Dev-only: build a key-jittered Nx copy of a testdata SF dir in /tmp
so operator runtimes can be measured at a larger scale. Keys are offset
per copy so join/dedup cardinality STRUCTURE is preserved (each copy is
its own world) — growth in runtime should then be ~linear in N for a
scale-healthy operator.

Usage: python3 tools/make_scale.py <src> <dst> <n> [tables]
  tables: optional comma-separated subset to scale (e.g.
  "documents,embeddings,events"); the rest are copied at base size.
  Round 15: copies STREAM to one ParquetWriter per table instead of a
  pandas concat — a 400x lineitem concat is a >20 GB single DataFrame,
  while streaming holds exactly one jittered copy in memory.

Example: python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/sf_big 5
"""
import sys
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# Small row groups so Spark can split the scan: pandas/pyarrow's
# default (1Mi rows) packs a 500k-row table into ONE row group, which
# makes every scan of it a single task — measurements then time one
# core doing the whole map stage, not the operator. 20k-row groups
# give local[32] full scan parallelism at every jitter factor.
ROW_GROUP = 20_000

KEY_OFFSETS = {
    "lineitem": {"l_orderkey": 10**9, "l_suppkey": 10**7, "l_partkey": 10**8},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**8},
    "events": {"event_id": 10**8, "user_id": 10**6},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
}
DIMS = ["region", "nation"]


def jitter_embeddings(c, i):
    """Per-copy SIGNED PERMUTATION of the embedding dims — an orthogonal
    transform, so every within-copy norm and inner product is preserved
    (each copy keeps the base corpus's exact ANN/near-dup structure, up
    to float summation order) while distinct copies become distinct
    vectors instead of bit-identical repeats. Copy 0 is the identity,
    pinning the base corpus. Fixes the round-16 measurement artifact
    (SURVEY §9): identical copies collapsed the adaptive quantizer's
    fine lists to base-count distinct cells at occupancy N, inflating
    the graph-ANN build's sum(|list|^2) ~6x over a natural corpus."""
    if i == 0:
        return c
    import numpy as np
    emb = np.asarray(c["embedding"].to_list(), dtype=np.float32)
    rng = np.random.default_rng(i)  # deterministic per copy index
    perm = rng.permutation(emb.shape[1])
    sign = (rng.integers(0, 2, emb.shape[1]) * 2 - 1).astype(np.float32)
    c = c.copy()
    c["embedding"] = list(emb[:, perm] * sign)
    return c


def write_scaled(src, dst, t, offs, n):
    base = pd.read_parquet(f"{src}/{t}.parquet")
    writer = None
    schema = None
    try:
        for i in range(n):
            c = base.copy()
            for col, off in offs.items():
                c[col] = c[col] + i * off
            if t == "documents":
                # distinct token prefix per copy: near-dup structure is
                # preserved within a copy, not collapsed across copies
                c["text"] = f"copy{i} " + c["text"]
            if t == "embeddings":
                c = jitter_embeddings(c, i)
            # pin copy 0's schema for every copy: the jittered float32
            # ndarrays would otherwise re-infer as list<double> and
            # break the single-writer append
            tbl = (pa.Table.from_pandas(c, preserve_index=False)
                   if schema is None else
                   pa.Table.from_pandas(c, schema=schema, preserve_index=False))
            if writer is None:
                schema = tbl.schema
                writer = pq.ParquetWriter(f"{dst}/{t}.parquet", tbl.schema)
            writer.write_table(tbl, row_group_size=ROW_GROUP)
    finally:
        if writer is not None:
            writer.close()
    print(f"{t}: {len(base)} -> {len(base) * n}")


def main(src, dst, n, scale_tables=None):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        pd.read_parquet(f"{src}/{t}.parquet").to_parquet(f"{dst}/{t}.parquet", index=False)
        print(f"{t}: dim copied")
    for t, offs in KEY_OFFSETS.items():
        if scale_tables is not None and t not in scale_tables:
            pd.read_parquet(f"{src}/{t}.parquet").to_parquet(
                f"{dst}/{t}.parquet", index=False, row_group_size=ROW_GROUP)
            print(f"{t}: copied at base size (not in scale set)")
            continue
        write_scaled(src, dst, t, offs, n)


if __name__ == "__main__":
    tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), tables)
