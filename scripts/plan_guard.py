#!/usr/bin/env python3
"""Plan-shape guard across scale factors (r8, VERDICT r7 #7).

Compares the per-query plan-shape triples (sh = shuffle exchanges,
bc = broadcast exchanges, ws = whole-stage-codegen spans) between two
bench_detail-style artifacts — normally the sf0.1 bench_detail.json and
BENCH_sf1_detail.json. Under AQE a plan must not change shape with data
size except for documented skew splits; a divergence here means an
operator's physical strategy flipped with scale (e.g. a broadcast join
fell back to shuffle), which is exactly the regression the 100 TB
design cares about.

Exit 0 when every common query matches (adaptive-plane ops may be
allow-listed with --allow name because their plan is DEFINED to change
with corpus size); exit 1 with a per-query diff otherwise.

Usage: python3 scripts/plan_guard.py bench_detail.json BENCH_sf1_detail.json [--allow q1 --allow q2]
"""
import json
import sys

args = [a for a in sys.argv[1:]]
allow = set()
while "--allow" in args:
    i = args.index("--allow")
    allow.add(args[i + 1])
    del args[i:i + 2]
a, b = (json.load(open(p)) for p in args[:2])
pa, pb = a.get("plans", {}), b.get("plans", {})
common = sorted(set(pa) & set(pb))
if not common:
    print("plan_guard: no common queries — nothing to compare")
    sys.exit(1)
bad = []
for q in common:
    if pa[q] != pb[q] and q not in allow:
        bad.append((q, pa[q], pb[q]))
skipped = sorted(q for q in common if q in allow and pa[q] != pb[q])
for q, x, y in bad:
    print(f"PLAN SHAPE DIVERGED {q}: {args[0]}={x} {args[1]}={y}")
for q in skipped:
    print(f"allowed divergence (documented scale-adaptive plan): {q}")
print(f"{len(common) - len(bad)}/{len(common)} plan shapes stable across scale"
      + (f" ({len(skipped)} allowed)" if skipped else ""))
sys.exit(1 if bad else 0)
