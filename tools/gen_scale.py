#!/usr/bin/env python3
"""Scale up the driver-generated testdata by integer replication.

Derives sf{K*0.1} from /root/testdata/sf0.1 by concatenating K copies
of each fact/dim table with key columns shifted per replica, preserving
every distribution, the foreign-key structure (dense 0..N-1 keys), and
the exact parquet schemas (including events.ts TIMESTAMP(NANOS)) via
pyarrow. region/nation stay fixed (they are constant-size dims in the
TPC-H model); events keep their time range (more users in the same
window, which is how traffic actually scales).

Strictly local benchmarking tooling — not part of the library.
Usage: gen_scale.py <K> <outDir>   (K=10 -> sf1, K=100 -> sf10)
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> {column: stride} (stride = source table's key cardinality)
SHIFTS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                 "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}


def main(k, out_dir):
    for table, shifts in SHIFTS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        n = 1 if not shifts else k
        # Stream replica-by-replica so K=1000 (sf100) never holds the
        # full concatenation in memory (lineitem would be ~60 GB).
        with pq.ParquetWriter(f"{out_dir}/{table}.parquet", src.schema) as w:
            for r in range(n):
                w.write_table(shift(src, shifts, r),
                              row_group_size=1 << 20)
        print(f"{table}: {src.num_rows} -> {src.num_rows * n}", flush=True)


def shift(t, shifts, r):
    if r == 0:
        return t
    cols = []
    for name in t.column_names:
        c = t.column(name)
        if name in shifts:
            c = pc.add(c, pa.scalar(r * shifts[name], type=c.type))
        cols.append(c)
    return pa.table(cols, schema=t.schema)


if __name__ == "__main__":
    import os
    k, out = int(sys.argv[1]), sys.argv[2]
    os.makedirs(out, exist_ok=True)
    main(k, out)
