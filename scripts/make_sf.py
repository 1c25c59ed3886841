#!/usr/bin/env python3
"""Synthesize an N-copy scale-up of sf0.1 (sf1 = 10 copies, sf10 = 100)
for BENCH ONLY. Correctness stays gated on the driver-provided
sf0.001/0.01/0.1.

Replicates every fact table N times with key-shifted copies
(referential integrity preserved: child FKs shift by the same stride
as their parent PKs), keeps the dimension tables (region/nation)
as-is, and preserves parquet physical types — in particular events.ts
stays whatever the source physical type is (INT64 TIMESTAMP(NANOS) in
current drops) so the nanosAsLong contract holds.

Content perturbation (r8, generalized r9): verbatim replicas inflate
TRUE near-dup pair counts ~quadratically (every replica of doc A is a
near-dup of every replica of doc B), masking real plan scaling for the
dedup/ANN family. Each replica therefore gets a content-space
BIJECTION that (a) preserves the WITHIN-copy duplicate structure
exactly and (b) destroys CROSS-copy similarity, so the corpus-wide dup
RATE stays that of sf0.1 at any copy count:

- documents.text: a per-copy seeded PERMUTATION of [a-z] (applied to
  upper case too) and of [0-9] — lengths, token boundaries,
  punctuation, char classes and n_chars stay identical inside a copy,
  and unlike r8's caesar shift (which repeats every 26 copies and made
  letter-heavy docs cross-similar between copies i and i+26), two
  distinct seeded permutations share ~1/26 fixed points — nothing the
  shingle/minhash/simhash family can pair on. Copy 0 is bit-identical
  to sf0.1.
- embeddings.embedding: a per-copy circular coordinate shift COMPOSED
  with a per-copy seeded ±1 sign pattern. Norms and all within-copy
  angles are EXACTLY preserved ((s·v)·(s·w) = v·w when s ∈ {±1}^d);
  the rotation alone repeats every 64 copies, the sign pattern makes
  every copy pair decorrelated at any N.

Perturbation is fully vectorized (r8 round-tripped through Python
lists): text translates via a 256-byte lookup table applied to the
arrow string buffer with numpy; embeddings roll/flip as one (n, 64)
float32 matrix over the flattened list buffer.

Copies stream through a ParquetWriter one perturbed copy at a time —
peak memory is one copy of one table, not N — with ~64k-row groups so
scans parallelize (a parquet task cannot split inside a row group; the
single-row-group source files serialized every sf1 scan onto one core
before r8).

Usage: python3 scripts/make_sf.py [copies=10] [outdir=/tmp/sf1]
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pathlib import Path

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = Path("/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
OUT.mkdir(parents=True, exist_ok=True)


# --- deterministic per-copy bijections --------------------------------
def _lcg_stream(seed):
    """64-bit LCG (MMIX constants) — deterministic, dependency-free."""
    x = (seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        yield x >> 33


def _perm(n, rng):
    """Seeded Fisher-Yates permutation of range(n)."""
    p = list(range(n))
    for j in range(n - 1, 0, -1):
        k = next(rng) % (j + 1)
        p[j], p[k] = p[k], p[j]
    return p


def _byte_lut(i):
    """256-entry uint8 translation table for copy i: seeded permutation
    of the lowercase alphabet (mirrored to uppercase) and of digits;
    every other byte maps to itself. Identity for copy 0."""
    lut = np.arange(256, dtype=np.uint8)
    if i == 0:
        return lut
    rng = _lcg_stream(2 * i)
    lp = _perm(26, rng)
    dp = _perm(10, rng)
    for a, b in enumerate(lp):
        lut[ord('a') + a] = ord('a') + b
        lut[ord('A') + a] = ord('A') + b
    for a, b in enumerate(dp):
        lut[ord('0') + a] = ord('0') + b
    return lut


def _signs(i, dims):
    """±1 float32 pattern for copy i (all +1 for copy 0)."""
    if i == 0:
        return np.ones(dims, dtype=np.float32)
    rng = _lcg_stream(2 * i + 1)
    return np.array([1.0 if next(rng) & 1 else -1.0 for _ in range(dims)],
                    dtype=np.float32)


def _translate_text(table, colname, lut):
    """Apply a byte lookup table to a string column via its buffers."""
    col = table.column(colname)
    out_chunks = []
    for chunk in (col.chunks if isinstance(col, pa.ChunkedArray) else [col]):
        if chunk.offset != 0:
            chunk = chunk.combine_chunks() if hasattr(chunk, "combine_chunks") else chunk
        assert chunk.offset == 0, "sliced string chunk unsupported"
        validity, offsets, data = chunk.buffers()
        raw = np.frombuffer(data, dtype=np.uint8, count=len(data))
        new = pa.py_buffer(np.take(lut, raw).tobytes())
        out_chunks.append(pa.Array.from_buffers(
            chunk.type, len(chunk), [validity, offsets, new],
            null_count=chunk.null_count))
    idx = table.column_names.index(colname)
    return table.set_column(idx, colname, pa.chunked_array(out_chunks))


def _rotate_flip_vectors(table, colname, shift, signs):
    """Roll each fixed-length list left by `shift` and multiply by the
    ±1 `signs` pattern, as one flattened matrix op."""
    col = table.column(colname)
    dims = len(signs)
    out_chunks = []
    for chunk in (col.chunks if isinstance(col, pa.ChunkedArray) else [col]):
        assert chunk.null_count == 0 and chunk.offset == 0, \
            "null/sliced embedding chunk unsupported"
        offsets = chunk.offsets.to_numpy()
        assert (np.diff(offsets) == dims).all(), "ragged embedding lists"
        flat = chunk.values.to_numpy(zero_copy_only=False)
        mat = flat.reshape(-1, dims)
        # r8 semantics: new[k] = v[(k + shift) mod dims]
        rot = np.roll(mat, -shift, axis=1) * signs
        vals = pa.array(rot.ravel(), type=chunk.type.value_type)
        out_chunks.append(pa.ListArray.from_arrays(chunk.offsets, vals)
                          .cast(chunk.type))
    idx = table.column_names.index(colname)
    return table.set_column(idx, colname, pa.chunked_array(out_chunks))


def _shift_props_k(table, colname, i):
    """events.props is '{"k": N}' and N's residues (mod 2..23) drive
    the synthetic schema field model (Compat.fieldArrays): verbatim
    replicas give copy i's subject u+i*stride the IDENTICAL k sequence
    as copy 0's subject u, so every latest-field-set signature class
    (reg_similar identity classes, compat verdict streams) merges
    across copies and pair outputs grow with copies^2 — an adversarial
    workload, not plan scaling (r9 verdict #5; the stated "JSON key
    rewrite" would null the model out instead, since consumers parse
    $.k). The fix is a per-copy VALUE bijection k -> k + i: within-copy
    structure is exactly preserved (bijection), while copies i and j
    differ in every residue class unless i ≡ j (mod lcm(2..23) =
    53820 >> any copy count). Copy 0 stays bit-identical to sf0.1."""
    col = table.column(colname)
    pat = r'^\{"k": (\d+)\}$'
    assert pc.all(pc.match_substring_regex(col, pat)).as_py(), \
        "events.props no longer matches '{\"k\": N}' — update _shift_props_k"
    k = pc.cast(pc.replace_substring_regex(col, pat, r"\1"), pa.int64())
    new = pc.binary_join_element_wise(
        pa.scalar('{"k": '), pc.cast(pc.add(k, i), pa.string()), pa.scalar("}"), "")
    idx = table.column_names.index(colname)
    return table.set_column(idx, colname, new)


def perturbed(table, name, i):
    if i == 0:
        return table
    if name == "documents":
        return _translate_text(table, "text", _byte_lut(i))
    if name == "embeddings":
        return _rotate_flip_vectors(table, "embedding",
                                    (i * 13) % 64, _signs(i, 64))
    if name == "events":
        return _shift_props_k(table, "props", i)
    return table


# --- key-shifted replication -------------------------------------------
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

if __name__ == "__main__":
    tables = {t: pq.read_table(SRC / f"{t}.parquet") for t in PLAN}
    strides = {}
    for t, cols in PLAN.items():
        for col, (pt, pk) in cols.items():
            strides.setdefault((pt, pk), stride(tables[pt], pk))

    for t, cols in PLAN.items():
        src = tables[t]
        shifts = {col: strides[key] for col, key in cols.items()}
        ncopies = 1 if not cols else COPIES  # pure dimensions: single copy
        total = src.num_rows * ncopies
        # ~16+ splits per table (floor 4096 rows, cap 64k) so the smaller
        # text/embedding tables parallelize too, not just the big facts.
        rg = min(65536, max(4096, total // 16))
        with pq.ParquetWriter(OUT / f"{t}.parquet", src.schema,
                              coerce_timestamps=None,
                              use_deprecated_int96_timestamps=False) as w:
            for i in range(ncopies):
                w.write_table(perturbed(shifted(src, shifts, i), t, i),
                              row_group_size=rg)
        print(f"{t}: {src.num_rows} -> {total}")
