#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (already built) output against DuckDB oracles:
  1. sbt "runMain graft.Verify <sfDir> <outDir>"  (done by caller)
  2. python3 scripts/parity.py <sfDir> <outDir>

Compares per query: column names (sorted), row count, and a hash of
the value multiset with columns sorted by name — approximating the
driver's described compare.
"""
import sys, json, glob, os, time
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # driver-style value hashing tolerance: we round in-query, so
        # repr at 12 significant digits is enough to catch real drift
        return f"{v:.10g}"
    return str(v)

def table_hash(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None))
    import hashlib
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()

# DuckDB type → comparison class. The r6 driver hash failure on
# mm_batch_plan was a TYPE divergence with every value equal, so the
# local gate compares result dtypes, not just names. Classes:
#  - int widths bucket together through BIGINT (pandas itertuples
#    str()s int32 and int64 identically, and the r6 driver accepted a
#    live int32-vs-BIGINT column in text_dup_coverage), BUT
#  - HUGEINT is its OWN class: DuckDB widens sum()/window-sum results
#    to int128, pandas converts that to float64, and a str-canonical
#    hash then renders 0.0 vs 0 — the exact mm_batch_plan failure.
#    Every oracle must CAST hugeint outputs to BIGINT.
#  - FLOAT vs DOUBLE also differ (float32 repr drift).
def type_class(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t  # scale/precision matter
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t == "HUGEINT":
        return "INT128"
    if t == "FLOAT":
        return "FLOAT32"
    if t == "DOUBLE":
        return "FLOAT64"
    return t

def types_of(con, query):
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: type_class(r[1]) for r in rows}

def raw_types_of(con, query):
    rows = con.execute(f"DESCRIBE {query}").fetchall()
    return {r[0]: r[1].upper() for r in rows}

def main(sf_dir, out_dir, json_out=None, only=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    # Per-query oracle wall seconds (r11, VERDICT r10 #6): budget
    # exclusions at big scale factors become data, not prose.
    oracle_secs = {}
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
        try:
            t0 = time.monotonic()
            odf = con.execute(sql).df()
            oracle_secs[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            oracle_secs[name] = round(time.monotonic() - t0, 3)
            continue
        stypes = types_of(con, f"SELECT * FROM read_parquet({spark_files!r})")
        otypes = types_of(con, sql)
        sc, oc = sorted(sdf.columns), sorted(odf.columns)
        tdiff = {c: (stypes.get(c), otypes.get(c)) for c in sc
                 if c in otypes and stypes.get(c) != otypes.get(c)}
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif tdiff:
            results[name] = f"TYPE_MISMATCH {tdiff}"
        elif len(sdf) != len(odf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"
        elif table_hash(sdf) != table_hash(odf):
            results[name] = "HASH_MISMATCH"
        else:
            # int-width divergences (e.g. Spark INTEGER vs oracle
            # BIGINT) are driver-tolerated (str-canonical hash), but
            # note them: they're one max()/sum() away from becoming a
            # real divergence.
            srt, ort = raw_types_of(con, f"SELECT * FROM read_parquet({spark_files!r})"), raw_types_of(con, sql)
            note = {c: (srt.get(c), ort.get(c)) for c in sc
                    if c in ort and srt.get(c) != ort.get(c)}
            results[name] = f"OK (type note: {note})" if note else "OK"
    # queries with no oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if only is not None and name not in only:
            continue
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = len(con.execute(f"SELECT * FROM read_parquet({files!r})").df()) if files else 0
            results[name] = f"ROWS_ONLY n={n}" + (" OK" if n > 0 else " EMPTY!")
    bad = 0
    for name, r in sorted(results.items()):
        flag = "" if r.startswith("OK") or "ROWS_ONLY" in r and "OK" in r else "  <<< FAIL"
        if flag: bad += 1
        print(f"{name:28s} {r}{flag}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    if json_out:
        json.dump({"sf_dir": sf_dir, "pass": len(results) - bad,
                   "total": len(results), "results": results,
                   "oracle_secs": oracle_secs},
                  open(json_out, "w"), indent=1, sort_keys=True)
    return 1 if bad else 0

if __name__ == "__main__":
    # parity.py SF_DIR OUT_DIR [--json PATH] [--only a,b,c]
    argv = sys.argv[3:]
    jo = only = None
    while argv:
        if argv[0] == "--json" and len(argv) > 1:
            jo = argv[1]; argv = argv[2:]
        elif argv[0] == "--only" and len(argv) > 1:
            only = set(argv[1].split(",")); argv = argv[2:]
        else:
            print(f"unknown arg {argv[0]}"); sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2], jo, only))
