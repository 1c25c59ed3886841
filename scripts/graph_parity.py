#!/usr/bin/env python3
"""Staged DuckDB oracle for the graph/recursive queries (r11, VERDICT
r10 #5).

The four graph ops (ann_graph_recall, dedup_clusters,
dedup_semantic_clusters, dedup_survivors) blow parity.py's single-query
420s budget at sf10: the recursive `reach` CTE materializes (id, label)
for every reachable label — quadratic in component size — and the ANN
recall card recomputes the shared candidate CTEs inside one statement.
This gate runs the SAME oracle decomposed:

  - every top-level CTE is materialized to a TEMP TABLE in order, each
    with its own timing (the per-stage budget is the accepted form of
    the 420s rule — VERDICT r10 #5 "oracle each stage separately");
  - the recursive pair `reach(id, lab)` + `members` is replaced by an
    EXACT union-find over the materialized `edges` table, preserving
    the min-label semantics (cluster_id = min doc/vec id in the
    component) — identical output, linear not quadratic;
  - the final SELECT runs against the materialized stages and is
    hash-compared to the Spark output exactly like parity.py.

Usage: graph_parity.py SF_DIR OUT_DIR [--json PATH] [--only a,b,c]
  --json merges per-query rows into an existing CORRECTNESS-style file
  (results + oracle_secs) instead of overwriting it.
"""
import sys, json, glob, re, time
import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from parity import table_hash, type_class

GRAPH_OPS = ["ann_graph_recall", "dedup_clusters",
             "dedup_semantic_clusters", "dedup_survivors"]

MEMBERS_RE = re.compile(
    r"members AS \(\s*SELECT id AS (\w+), min\(lab\) AS cluster_id "
    r"FROM reach GROUP BY id\)", re.S)


def split_ctes(sql):
    """Splits `WITH [RECURSIVE] a AS (...), b(...) AS (...), ... SELECT`
    into ([(name, body)...], final_select) with a paren-aware scan."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.S | re.I)
    i = m.end()
    ctes = []
    while True:
        h = re.match(r"\s*([\w]+)\s*(\([^)]*\))?\s+AS\s*\(", sql[i:], re.S | re.I)
        if not h:
            break
        name = h.group(1)
        j = i + h.end()  # first char inside the CTE body
        depth = 1
        while depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, sql[i + h.end():j - 1]))
        i = j
        k = re.match(r"\s*,", sql[i:])
        if not k:
            break
        i += k.end()
    return ctes, sql[i:]


def union_find(edges):
    """Min-label connected components: returns {id: min id in comp}
    for EVERY id appearing in edges (roots included — the recursive
    `reach` seeds SELECT DISTINCT src, src FROM edges)."""
    parent = {}
    seen = set()

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by label: smaller id becomes the root, so every
            # root IS the component minimum (mirrors min(lab))
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def run_staged(con, sql, secs):
    ctes, final = split_ctes(sql)
    mm = MEMBERS_RE.search(sql)
    idcol = mm.group(1) if mm else None
    for name, body in ctes:
        t0 = time.monotonic()
        if name == "reach":
            continue  # replaced by union-find at the members stage
        if name == "members" and idcol is not None:
            edges = con.execute("SELECT src, dst FROM edges").fetchall()
            roots = union_find(edges)
            con.execute(f"CREATE TEMP TABLE members ({idcol} BIGINT, cluster_id BIGINT)")
            if roots:
                con.executemany("INSERT INTO members VALUES (?, ?)",
                                [(x, r) for x, r in roots.items()])
        else:
            con.execute(f"CREATE TEMP TABLE {name} AS {body}")
        secs[name] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    df = con.execute(final).df()
    secs["final"] = round(time.monotonic() - t0, 3)
    for name, _ in ctes:
        if name != "reach":
            con.execute(f"DROP TABLE IF EXISTS {name}")
    return df


def main(sf_dir, out_dir, json_out=None, only=None):
    ops = [o for o in GRAPH_OPS if only is None or o in only]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results, oracle_secs, stage_secs = {}, {}, {}
    for name in ops:
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").df()
        secs = {}
        t0 = time.monotonic()
        try:
            odf = run_staged(con, oracle[name], secs)
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            oracle_secs[name] = round(time.monotonic() - t0, 3)
            stage_secs[name] = secs
            continue
        oracle_secs[name] = round(time.monotonic() - t0, 3)
        stage_secs[name] = secs
        sc, oc = sorted(sdf.columns), sorted(odf.columns)
        if sc != oc:
            results[name] = f"SCHEMA_MISMATCH spark={sc} oracle={oc}"
        elif len(sdf) != len(odf):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(sdf)} oracle={len(odf)}"
        elif table_hash(sdf) != table_hash(odf):
            results[name] = "HASH_MISMATCH"
        else:
            results[name] = "OK (staged graph oracle: union-find CC + per-stage tables)"
        con.close()
    bad = 0
    for name, r in sorted(results.items()):
        flag = "" if r.startswith("OK") else "  <<< FAIL"
        if flag:
            bad += 1
        print(f"{name:28s} {r}  stages={stage_secs.get(name)}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    if json_out:
        try:
            doc = json.load(open(json_out))
        except (OSError, json.JSONDecodeError):
            doc = {"sf_dir": sf_dir, "results": {}, "oracle_secs": {}}
        doc.setdefault("results", {}).update(results)
        doc.setdefault("oracle_secs", {}).update(oracle_secs)
        doc["stage_secs"] = {**doc.get("stage_secs", {}), **stage_secs}
        ok = sum(1 for r in doc["results"].values() if str(r).startswith("OK"))
        doc["pass"], doc["total"] = ok, len(doc["results"])
        json.dump(doc, open(json_out, "w"), indent=1, sort_keys=True)
    return 1 if bad else 0


if __name__ == "__main__":
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
