#!/usr/bin/env python3
"""Builds an sfN-equivalent scale-validation dataset (N*10 x sf0.1) at
/tmp/graft_sf<N> by replicating the FACT tables with shifted primary ids,
preserving parquet schemas exactly (incl. TIMESTAMP(NANOS) on events).
Usage: make_sf1.py [N]  (default 1 -> 10 copies at /tmp/graft_sf1;
N=3 -> 30 copies at /tmp/graft_sf3 for the r13 slope checkpoint).

Key design: o_orderkey and l_orderkey shift by the same per-copy offset so the
order<->lineitem join scales linearly (each copy joins its own copy); foreign
keys into the dimension tables (o_custkey, l_partkey, l_suppkey, user_id) are
left unshifted and the dims stay single-copy, keeping them broadcast-sized --
exactly the 100 TB shape (facts grow, dims don't).

Scale-validation only: correctness gates still run exclusively on the
driver-provided /root/testdata sfs.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import os

import sys
N = int(sys.argv[1]) if len(sys.argv) > 1 else 1
SRC = "/root/testdata/sf0.1"
DST = f"/tmp/graft_sf{N}"
COPIES = 10 * N
OFFSET = 1_000_000_000

# fact table -> columns to shift per copy (same offset everywhere => joins
# between facts stay within-copy); everything else passes through unchanged
FACTS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

os.makedirs(DST, exist_ok=True)
for t in DIMS:
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
    print(f"{t}: copied")

for t, keys in FACTS.items():
    src = pq.read_table(f"{SRC}/{t}.parquet")
    parts = []
    for k in range(COPIES):
        tbl = src
        for key in keys:
            i = tbl.schema.get_field_index(key)
            col = tbl.column(i)
            shifted = pa.compute.add(col, k * OFFSET).cast(tbl.schema.field(i).type)
            tbl = tbl.set_column(i, tbl.schema.field(i), shifted)
        parts.append(tbl)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{t}.parquet")
    print(f"{t}: {src.num_rows} -> {out.num_rows} rows")
print("done:", DST)
