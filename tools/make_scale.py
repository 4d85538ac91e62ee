#!/usr/bin/env python3
"""Dev-only: build a key-jittered Nx copy of a testdata SF dir in /tmp
so operator runtimes can be measured at a larger scale. Keys are offset
per copy so join/dedup cardinality STRUCTURE is preserved (each copy is
its own world) — growth in runtime should then be ~linear in N for a
scale-healthy operator.

Usage: python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/sf_big 5
"""
import sys
import pandas as pd

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


def main(src, dst, n):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        pd.read_parquet(f"{src}/{t}.parquet").to_parquet(f"{dst}/{t}.parquet", index=False)
        print(f"{t}: dim copied")
    for t, offs in KEY_OFFSETS.items():
        base = pd.read_parquet(f"{src}/{t}.parquet")
        copies = []
        for i in range(n):
            c = base.copy()
            for col, off in offs.items():
                c[col] = c[col] + i * off
            if t == "documents":
                # distinct token prefix per copy: near-dup structure is
                # preserved within a copy, not collapsed across copies
                c["text"] = f"copy{i} " + c["text"]
            copies.append(c)
        big = pd.concat(copies, ignore_index=True)
        big.to_parquet(f"{dst}/{t}.parquet", index=False, row_group_size=ROW_GROUP)
        print(f"{t}: {len(base)} -> {len(big)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
