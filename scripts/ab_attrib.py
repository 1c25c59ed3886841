#!/usr/bin/env python3
"""A/B attribution of cross-round cpu-second swings (r11, VERDICT r10
#2): run the SAME four queries under the r9 jar and the current jar,
interleaved back-to-back on the same sf0.1 data in the same host
window, and table the per-query median wall / summed task / cpu
seconds. If both jars agree now, the r10 official numbers' 10-25x
swings were host co-tenancy; if the current jar is slower on an
identical plan, it's a real regression to diff.

Usage: ab_attrib.py R9_JAR CUR_JAR [rounds]
Writes AB_ATTRIB_r11.json in the cwd and prints a table.
"""
import json, os, subprocess, sys, tempfile, time

QUERIES = "text_langid,compat_explain,text_dup_coverage,an_enum_drift"
SPARK_JARS = "/opt/spark/jars/*"


def run_bench(jar, label, workdir):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_QUERIES=QUERIES,
               SPARK_GRAFT_REQUEUE_MAX="0")
    t0 = time.monotonic()
    load0 = open("/proc/loadavg").read().split()[0]
    p = subprocess.run(
        ["java", "-Xmx96g", "-cp", f"{SPARK_JARS}:{jar}",
         "--add-opens=java.base/java.lang=ALL-UNNAMED",
         "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
         "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
         "--add-opens=java.base/java.io=ALL-UNNAMED",
         "--add-opens=java.base/java.net=ALL-UNNAMED",
         "--add-opens=java.base/java.nio=ALL-UNNAMED",
         "--add-opens=java.base/java.util=ALL-UNNAMED",
         "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
         "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
         "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
         "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
         "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
         "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
         "graft.Bench"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=3600)
    wall = round(time.monotonic() - t0, 1)
    load1 = open("/proc/loadavg").read().split()[0]
    detail_path = os.path.join(workdir, "bench_detail.json")
    detail = {}
    if os.path.exists(detail_path):
        detail = json.load(open(detail_path))
        os.remove(detail_path)
    if p.returncode != 0 and not detail:
        print(p.stdout[-1500:], p.stderr[-1500:])
        raise SystemExit(f"{label}: bench failed rc={p.returncode}")
    return {"label": label, "wall_s": wall, "load": [load0, load1],
            "queries": detail.get("queries", {}),
            "task": detail.get("task", {}), "cpu": detail.get("cpu", {}),
            "plans": detail.get("plans", {}), "cal": detail.get("cal")}


def main(r9_jar, cur_jar, rounds=2):
    runs = []
    with tempfile.TemporaryDirectory() as d9, tempfile.TemporaryDirectory() as dc:
        for i in range(rounds):
            runs.append(run_bench(r9_jar, f"r9#{i}", d9))
            runs.append(run_bench(cur_jar, f"cur#{i}", dc))
    names = QUERIES.split(",")
    print(f"{'query':20s} " + " ".join(f"{r['label']:>12s}" for r in runs))
    table = {}
    for metric in ("queries", "task", "cpu"):
        print(f"-- {metric} (s)")
        for q in names:
            vals = [r[metric].get(q, -1) for r in runs]
            table.setdefault(metric, {})[q] = vals
            print(f"{q:20s} " + " ".join(f"{v:12.2f}" for v in vals))
    out = {"queries_run": names, "rounds": rounds,
           "runs": [{k: r[k] for k in ("label", "wall_s", "load", "cal")}
                    for r in runs],
           "per_metric": table,
           "plans": {r["label"]: r["plans"] for r in runs}}
    json.dump(out, open("AB_ATTRIB_r11.json", "w"), indent=1, sort_keys=True)
    print("wrote AB_ATTRIB_r11.json")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
