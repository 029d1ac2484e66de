"""Aggregate a saved jax.profiler trace by op family, phase-aware.

Usage: python scripts/trace_report.py /tmp/prof_dir
Parses the device rows of ``plugins/profile/*/*.trace.json.gz`` directly
(the xprof op_profile converter reports zero times through the axon
tunnel).  For each top-level `while` (one per scan phase) it prints
duration, the covered fraction (the profiler truncates around ~1M events —
a partially covered while means per-op attribution stops there, NOT that
the device idled), and the per-op-family totals normalized per covered
step, assuming 50-step phases unless overridden with PHASE_STEPS=<n>.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

OUT = sys.argv[1]
PHASE_STEPS = int(os.environ.get("PHASE_STEPS", "50"))

paths = sorted(glob.glob(OUT + "/plugins/profile/*/*.trace.json.gz"))
assert paths, f"no trace under {OUT}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "device" in n}

lanes = collections.defaultdict(list)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        lanes[(e["pid"], e["tid"])].append(e)

# the op lane is the one that contains top-level `while` events
op_lane = None
for key, evs in lanes.items():
    if any(ev["name"].startswith("while") for ev in evs):
        op_lane = key
assert op_lane is not None, "no while events found on any device lane"

evs = lanes[op_lane]
whiles = sorted(
    (e for e in evs if e["name"].startswith("while")), key=lambda e: e["ts"]
)
ops = [e for e in evs if not e["name"].startswith("while")]

grand = 0.0
for w in whiles:
    ws, we = w["ts"], w["ts"] + w["dur"]
    inside = sorted((e for e in ops if ws <= e["ts"] < we), key=lambda e: e["ts"])
    dur_s = w["dur"] / 1e6
    grand += dur_s
    if not inside:
        print(f"== {w['name']}: {dur_s:.2f}s (no op events — trace truncated) ==")
        continue
    last = max(e["ts"] + e["dur"] for e in inside)
    covered = (last - ws) / (we - ws)
    nsteps = PHASE_STEPS * covered
    fam = collections.Counter()
    cnt = collections.Counter()
    for e in inside:
        base = re.sub(r"[.\d]+$", "", e["name"])
        fam[base] += e["dur"] / 1e3
        cnt[base] += 1
    print(
        f"== {w['name']}: {dur_s:.2f}s total, op events cover "
        f"{covered:5.1%} (~{nsteps:.1f} of {PHASE_STEPS} steps) =="
    )
    shown = 0.0
    for name, d in fam.most_common(25):
        print(f"{d/nsteps:9.3f} ms/step {cnt[name]/nsteps:9.1f}/step  {name[:70]}")
        shown += d
    print(f"   (top families {shown/nsteps:.1f} ms/step of "
          f"{dur_s*1e3*covered/nsteps:.1f} covered)")
print(f"scan phases device total: {grand:.2f}s")
