#!/usr/bin/env python3
"""Synthesize a 10x scale-up of sf0.1 into /tmp/sf1 for BENCH ONLY.

There is no driver-generated sf1 dataset; correctness stays gated on
the provided sf0.001/0.01/0.1. This replicates every fact table 10x
with key-shifted copies (referential integrity preserved: child FKs
shift by the same stride as their parent PKs), keeps the dimension
tables (region/nation) as-is, and preserves parquet physical types —
in particular events.ts stays INT64 TIMESTAMP(NANOS) so the
nanosAsLong contract holds.

Usage: python3 scripts/make_sf1.py [copies] [outdir]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
OUT.mkdir(parents=True, exist_ok=True)

def stride(table, col):
    return pc.max(table.column(col)).as_py() + 1

def shifted(table, shifts, i):
    """Copy i of `table` with each (col -> stride) shifted by i*stride."""
    cols = {}
    for name in table.column_names:
        col = table.column(name)
        if name in shifts and i > 0:
            cols[name] = pc.add(col, i * shifts[name]).cast(col.type)
        else:
            cols[name] = col
    return pa.table(cols)

# table -> {column: parent table+key it strides with}
PLAN = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {"o_orderkey": ("orders", "o_orderkey"),
               "o_custkey": ("customer", "c_custkey")},
    "lineitem": {"l_orderkey": ("orders", "o_orderkey"),
                 "l_partkey": ("part", "p_partkey"),
                 "l_suppkey": ("supplier", "s_suppkey")},
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}

tables = {t: pq.read_table(SRC / f"{t}.parquet") for t in PLAN}
strides = {}
for t, cols in PLAN.items():
    for col, (pt, pk) in cols.items():
        strides.setdefault((pt, pk), stride(tables[pt], pk))

for t, cols in PLAN.items():
    src = tables[t]
    shifts = {col: strides[key] for col, key in cols.items()}
    if not cols:  # pure dimension: single copy
        out = src
    else:
        out = pa.concat_tables([shifted(src, shifts, i) for i in range(COPIES)])
    # keep the original parquet logical/physical types (esp. ts nanos)
    pq.write_table(out, OUT / f"{t}.parquet",
                   coerce_timestamps=None, use_deprecated_int96_timestamps=False)
    print(f"{t}: {src.num_rows} -> {out.num_rows}")
