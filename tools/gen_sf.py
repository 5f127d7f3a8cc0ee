#!/usr/bin/env python3
"""Dev-only scale-up generator: emit sfN as FACTOR deterministic copies
of a source sf directory with id-key columns offset per copy, schemas
preserved bit-exactly (pyarrow round-trip, TIMESTAMP(NANOS) included).

Why replication: the driver owns the real generator (TESTDATA.md,
read-only, capped at sf0.1); local scale validation only needs MORE
rows with the SAME schema, distributions, and cross-table id
alignment. One global offset per copy keeps every id family
consistent — lineitem.l_orderkey follows orders.o_orderkey,
documents.doc_id stays join-aligned with embeddings.vec_id, and the
sentinel query vector vec_id=0 stays unique (copy 0 keeps original
ids). Literal-id query predicates (vec_id = 0, vec_id < 5) therefore
keep their meaning at any factor.

Usage: python3 tools/gen_sf.py [src] [dst] [factor]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id-key columns to offset per copy; everything else replicates as-is
ID_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

# dimension tables stay fixed (joins gain fanout, as TPC-H dims do)
FIXED = {"region", "nation"}

OFFSET = 10_000_000  # far above every source id family's max


def scale(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    for name, id_cols in ID_COLS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        if name in FIXED:
            copies = [t]
        else:
            for c in id_cols:
                hi = pc.max(t.column(c)).as_py()
                assert hi < OFFSET, f"{name}.{c} max {hi} >= offset"
            copies = []
            for k in range(factor):
                tk = t
                for c in id_cols:
                    i = tk.schema.get_field_index(c)
                    shifted = pc.add(tk.column(c), k * OFFSET).cast(t.schema.field(c).type)
                    tk = tk.set_column(i, tk.schema.field(c), shifted)
                copies.append(tk)
        out = pa.concat_tables(copies).replace_schema_metadata(None)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, factor)
