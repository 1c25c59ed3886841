#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (already built) output against DuckDB oracles:
  1. sbt "runMain graft.Verify <sfDir> <outDir>"  (done by caller)
  2. python3 scripts/parity.py <sfDir> <outDir>

Compares per query: column names (sorted), row count, and a hash of
the value multiset with columns sorted by name — approximating the
driver's described compare.
"""
import sys, json, glob, os
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        sc, oc = sorted(sdf.columns), sorted(odf.columns)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sdf) != len(odf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"
        elif table_hash(sdf) != table_hash(odf):
            results[name] = "HASH_MISMATCH"
        else:
            results[name] = "OK"
    # queries with no oracle → rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = len(con.execute(f"SELECT * FROM read_parquet({files!r})").df()) if files else 0
            results[name] = f"ROWS_ONLY n={n}" + (" OK" if n > 0 else " EMPTY!")
    bad = 0
    for name, r in sorted(results.items()):
        flag = "" if r == "OK" or "ROWS_ONLY" in r and "OK" in r else "  <<< FAIL"
        if flag: bad += 1
        print(f"{name:28s} {r}{flag}")
    print(f"\n{len(results)-bad}/{len(results)} pass")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
