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
with corpus size); exit 1 with a per-query diff otherwise. Exit 3 when
the guard otherwise passes but one or more task-ratio exceedances were
suppressed because either artifact measured that query in a
>2x-contended window — the run is NOT a pass, it needs a re-bench on a
quieter host (ADVICE r10: a noisy baseline must not silently disable
the ratio gate). The suppressed count is also printed machine-readably
as `suppressed_contended=N`.

When both artifacts carry per-query summed executor task time (the
"task" map, r9), the guard also reports task-time ratios (b/a) —
scheduler-noise-free scaling evidence next to the wall-clock medians.
Informational by default; --max-task-ratio R makes any query whose
task-time ratio exceeds R fail the guard.

Usage: python3 scripts/plan_guard.py bench_detail.json BENCH_sf1_detail.json
         [--allow q1 --allow q2] [--max-task-ratio R]
"""
import json
import sys

USAGE = ("usage: plan_guard.py A.json B.json [--allow q]... "
         "[--max-task-ratio R]")

args = [a for a in sys.argv[1:]]
allow = set()
max_ratio = None
while "--allow" in args:
    i = args.index("--allow")
    if i + 1 >= len(args):
        print(USAGE + "\n--allow needs a query name")
        sys.exit(2)
    allow.add(args[i + 1])
    del args[i:i + 2]
if "--max-task-ratio" in args:
    i = args.index("--max-task-ratio")
    if i + 1 >= len(args):
        print(USAGE + "\n--max-task-ratio needs a number")
        sys.exit(2)
    try:
        max_ratio = float(args[i + 1])
    except ValueError:
        print(USAGE + "\n--max-task-ratio needs a number")
        sys.exit(2)
    del args[i:i + 2]
if len(args) < 2:
    print(USAGE)
    sys.exit(2)
try:
    a, b = (json.load(open(p)) for p in args[:2])
except (OSError, json.JSONDecodeError) as e:
    print(f"{USAGE}\ncannot read artifacts: {e}")
    sys.exit(2)
# --- host context (r10): artifacts carry per-query calibration-probe
# window inflation ("infl") and probe samples ("cal"). Surface them
# first so every number below is read against its host state, and a
# contended run is identifiable from the guard output alone.
ia, ib = a.get("infl", {}), b.get("infl", {})
for label, art, infl in ((args[0], a, ia), (args[1], b, ib)):
    cal = art.get("cal")
    if cal:
        print(f"host context {label}: med_infl {cal.get('med_infl')}x "
              f"max_infl {cal.get('max_infl')}x over ref {cal.get('ref')}s, "
              f"{len(cal.get('requeued', {}))} requeued, "
              f"loadavg(end) {art.get('loadavg', '?')}")
    elif infl:
        vals = sorted(infl.values())
        print(f"host context {label}: med_infl {vals[len(vals)//2]:.2f}x "
              f"max_infl {vals[-1]:.2f}x")
    else:
        print(f"host context {label}: no calibration data (pre-r10 artifact)")

def contended(q):
    """True when either artifact measured q in a >2x-inflated window."""
    return max(ia.get(q, 0), ib.get(q, 0)) > 2.0

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

# --- task-time ratios (r9): summed executor task time is immune to the
# host's scheduler/GC band that makes wall-clock medians jump ±30%
# between identical-code runs; the b/a ratio per query is the honest
# per-10x scaling number.
ta, tb = a.get("task", {}), b.get("task", {})
tcommon = [q for q in common if ta.get(q, 0) and tb.get(q, 0) and
           ta[q] > 0 and tb[q] > 0]
ratio_bad = []
suppressed = []  # exceedances skipped because the window was contended
if tcommon:
    ratios = sorted((tb[q] / ta[q], q) for q in tcommon)
    med = ratios[len(ratios) // 2][0]
    print(f"task-time ratio ({args[1]} / {args[0]}): median {med:.2f}x "
          f"over {len(tcommon)} queries")
    # A ratio measured in a contended window (either side) is host
    # noise, not plan evidence: report it, but never fail the guard on
    # it — the r9 driver dispute (10-34x task inflation on identical
    # plans) is exactly the case this separates.
    for r, q in ratios[-8:][::-1]:
        flag = ""
        if max_ratio is not None and r > max_ratio and q not in allow:
            if contended(q):
                suppressed.append(q)
                flag = "  contended-window (infl>2x) — SUPPRESSED, re-bench"
            else:
                ratio_bad.append(q)
                flag = f"  EXCEEDS --max-task-ratio {max_ratio}"
        print(f"  {q}: {r:.2f}x ({ta[q]:.2f}s -> {tb[q]:.2f}s task time){flag}")
    if max_ratio is not None:
        for r, q in ratios[:-8]:
            if r > max_ratio and q not in allow:
                if contended(q):
                    suppressed.append(q)
                    print(f"  {q}: {r:.2f}x contended-window (infl>2x) — "
                          "SUPPRESSED, re-bench")
                else:
                    ratio_bad.append(q)
                    print(f"  {q}: {r:.2f}x EXCEEDS --max-task-ratio {max_ratio}")
# Machine-readable suppression signal: a guard that skipped exceedances
# as contended has NOT validated those queries. Distinct exit code 3
# (vs 1 = real failure, 0 = clean pass) so callers know a re-bench is
# required instead of reading the run as passing.
print(f"suppressed_contended={len(suppressed)}"
      + (f" ({' '.join(sorted(suppressed))})" if suppressed else ""))
if bad or ratio_bad:
    sys.exit(1)
sys.exit(3 if suppressed else 0)
