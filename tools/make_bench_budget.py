#!/usr/bin/env python3
"""Derive per-query bench regression budgets from a CLEAN BENCH_DETAIL.json.

Budget = max(3 x min-iteration-time, 1.0 s) per query: 3x headroom absorbs
JIT/GC/IO jitter, the 1 s floor keeps sub-second queries from flaking the
gate on scheduler noise. Refuses to derive budgets from a contended run
(loadavg_start > threshold) -- a budget baked from a loaded machine would
be uselessly loose.

Usage: tools/make_bench_budget.py [BENCH_DETAIL.json [BENCH_BUDGET.json]]
"""
import json
import sys

MAX_LOADAVG = 2.0
HEADROOM = 3.0
FLOOR_S = 1.0
# Canary thresholds are deliberately TIGHTER than budgets (2x vs 3x, 0.5 s
# vs 1 s floor): if canaries shared the budget headroom, any global engine
# regression big enough to trip budgets (>3x) would also trip the canaries
# and be misread as machine contention, self-skipping the gate (ADVICE r6).
# With 2x canaries, a 2-3x global slowdown trips budgets while canaries
# stay green -> the gate FAILS instead of skipping.
CANARY_HEADROOM = 2.0
CANARY_FLOOR_S = 0.5
# Trivial fixed-shape queries whose clean time is sub-second and stable;
# if one of these runs slow, the MACHINE is slow (contention), not the
# engine -- the gate skips itself. loadavg alone missed this twice (r2/r3
# parse bug, r5 guard miss: a 1-min average lags a burst that starts with
# the run).
CANARIES = ["distinct_rows", "tpch_q6", "h2o_q1"]

detail_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
budget_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BUDGET.json"

d = json.load(open(detail_path))
load = d.get("loadavg_start", 99.0)
if load > MAX_LOADAVG:
    sys.exit(f"refusing: loadavg_start {load} > {MAX_LOADAVG} (contended run)")
if d.get("errors"):
    sys.exit(f"refusing: bench had errors {d['errors']}")

budgets = {
    name: round(max(HEADROOM * min(times), FLOOR_S), 3)
    for name, times in sorted(d["times"].items())
}
canaries = {
    name: round(max(CANARY_HEADROOM * min(d["times"][name]), CANARY_FLOOR_S), 3)
    for name in CANARIES if name in d["times"]
}
if not canaries:
    sys.exit(f"refusing: none of the canary queries {CANARIES} in detail")
out = {
    "derived_from": {
        "sf": d.get("sf"),
        "loadavg_start": load,
        "total_sec": d.get("value"),
    },
    "headroom": HEADROOM,
    "floor_sec": FLOOR_S,
    "max_loadavg_for_gate": MAX_LOADAVG,
    "canary_sec": canaries,
    "budget_sec": budgets,
}
json.dump(out, open(budget_path, "w"), indent=1)
print(f"wrote {budget_path}: {len(budgets)} budgets, "
      f"total clean {d.get('value')}s at loadavg {load}")
