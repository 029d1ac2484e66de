"""Aggregate a saved jax.profiler trace by op family.

Usage: python scripts/trace_report.py /tmp/prof_plain [n_iters]
Groups XLA op names by their base name (trailing .N / digits stripped) and
prints ms/iter per family plus the grand total; excludes the enclosing
jit_* parent events to avoid double counting.
"""

import collections
import glob
import gzip
import json
import re
import sys

OUT = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6

paths = sorted(glob.glob(OUT + "/plugins/profile/*/*.trace.json.gz"))
assert paths, f"no trace under {OUT}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

fam = collections.Counter()
cnt = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname:
        continue
    name = e.get("name", "")
    if name.startswith("jit_") or name.startswith("__inference"):
        continue  # parent span
    d = e.get("dur", 0) / 1e3
    base = re.sub(r"[.\d]+$", "", name)
    fam[base] += d
    cnt[base] += 1
    total += d

print(f"device total (children): {total:.1f} ms over {N} iters = {total/N:.1f} ms/iter")
print(f"{'ms/iter':>9} {'count/iter':>10}  family")
for name, d in fam.most_common(60):
    print(f"{d/N:9.3f} {cnt[name]/N:10.1f}  {name[:100]}")
