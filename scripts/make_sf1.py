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

# --- content perturbation (r8) ---------------------------------------
# Verbatim 10x replicas inflate TRUE near-dup pair counts ~quadratically
# (every replica of doc A is a near-dup of every replica of doc B),
# which masks real plan scaling for the whole dedup/ANN family: the
# measured sf1 ratio mixes plan cost with an unrealistic 10x-denser dup
# graph. Each replica therefore gets a content-space BIJECTION that
# (a) preserves the WITHIN-copy duplicate structure exactly — a
# bijection on tokens keeps exact-dup, jaccard, minhash, simhash and
# winnowing relations bit-comparable inside one copy — and
# (b) destroys CROSS-copy similarity (shifted alphabets / rotated
# coordinate bases share ~nothing), so the corpus-wide dup RATE stays
# that of sf0.1 instead of 10x'ing. documents.text: per-copy caesar
# shift of letters (mod 26) and digits (mod 10); lengths, token
# boundaries, punctuation and n_chars stay identical. embeddings: a
# per-copy circular shift of the 64 coordinates — norms and all
# within-copy angles are exactly preserved, cross-copy cosines decay
# to noise. Copy 0 is bit-identical to sf0.1.
import string

def _caesar_table(i):
    lo, up, dg = string.ascii_lowercase, string.ascii_uppercase, string.digits
    k, d = i % 26, i % 10
    return str.maketrans(lo + up + dg,
                         lo[k:] + lo[:k] + up[k:] + up[:k] + dg[d:] + dg[:d])

def perturbed(table, name, i):
    if i == 0:
        return table
    if name == "documents":
        tbl = _caesar_table(i)
        texts = [t if t is None else t.translate(tbl)
                 for t in table.column("text").to_pylist()]
        idx = table.column_names.index("text")
        return table.set_column(
            idx, "text", pa.array(texts, type=table.schema.field("text").type))
    if name == "embeddings":
        s = (i * 13) % 64
        vecs = [v if v is None else v[s:] + v[:s]
                for v in table.column("embedding").to_pylist()]
        idx = table.column_names.index("embedding")
        return table.set_column(
            idx, "embedding",
            pa.array(vecs, type=table.schema.field("embedding").type))
    return table

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
        out = pa.concat_tables([perturbed(shifted(src, shifts, i), t, i)
                                for i in range(COPIES)])
    # keep the original parquet logical/physical types (esp. ts nanos).
    # row_group_size (r8): the source files hold ONE row group per
    # table, and Spark cannot split a scan below a row group — so at
    # sf1 every scan-bound query was running its 1M-row parse on ONE
    # task/core, which misreads as "the family scales 10x per 10x".
    # A 100 TB table has millions of row groups and full scan
    # parallelism; 64k-row groups restore that property to the bench.
    # ~16 splits per table (floor 4096 rows, cap 64k) so the smaller
    # text/embedding tables parallelize too, not just the big facts
    rg = min(65536, max(4096, out.num_rows // 16))
    pq.write_table(out, OUT / f"{t}.parquet", row_group_size=rg,
                   coerce_timestamps=None, use_deprecated_int96_timestamps=False)
    print(f"{t}: {src.num_rows} -> {out.num_rows}")
