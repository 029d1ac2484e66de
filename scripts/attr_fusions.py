"""Definitive guided-step attribution: trace + HLO-metadata join.

Regenerates PERF.md's guided-step pass table in one command:

    python scripts/attr_fusions.py [trace_out_dir]

Method (the ``attr_fusions`` pattern PERF.md cites): lower the jitted
guided chunk (the exact executable the pipeline dispatches), parse every
HLO instruction's ``metadata={op_name=...}`` to map trace op instances
back to (a) the autodiff pass that produced them — ``transpose(jvp(...))``
= backward, ``jvp(...)`` = differentiated forward, neither = plain — and
(b) the model module in whose scope they ran (down_blocks.N / mid_block /
up_blocks.N / scheduler-glue).  Then trace ONE dispatch of the chunk on
the real chip, join device op events to that map by instruction name, and
print ms/step per pass with the top modules and op families.

Run on an otherwise-idle machine with no other TPU client (CLAUDE.md).
The xprof op_profile converter reports zero times through the axon
tunnel, hence this direct trace parse (same approach as trace_report.py).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

from motionclone_tpu.config import (  # noqa: E402
    InferenceConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel  # noqa: E402
from motionclone_tpu.pipeline.motionclone import make_sampling_fns  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/attr_guided"

MODULE_RE = re.compile(r"(down_blocks_\d+|up_blocks_\d+|mid_block|conv_in|conv_out|time_embedding|ddim|loss)")


def classify_pass(op_name):
    if "transpose(" in op_name:
        return "BWD"
    if "jvp(" in op_name:
        return "GRADFWD"
    return "PLAIN"


def classify_module(op_name):
    m = MODULE_RE.search(op_name)
    return m.group(1) if m else "(glue)"


def main():
    unet_cfg = UNet3DConfig()
    infer_cfg = InferenceConfig(
        inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
        warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
        motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
        video_length=16, cfg_scale=7.5,
    )
    dtype = jnp.bfloat16
    B, F, H, W = 1, 16, 64, 64

    print(f"devices: {jax.devices()}", flush=True)
    model = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=("up_blocks.1",), dtype=dtype
    )
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, F, H, W, 4), dtype),
        jnp.array([1]), jnp.zeros((B, 77, 768), dtype)))()
    jax.block_until_ready(params)

    fns = make_sampling_fns(unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype)
    g_xs, _ = fns.phase_xs
    nsteps = len(g_xs[0])

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)
    uncond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
    cond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
    s_hw = 16 * 16
    rep = {}
    for m in range(3):
        for a in range(2):
            name = (f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                    f".transformer_blocks.0.attention_blocks.{a}")
            rep[name] = (
                jnp.asarray(rng.uniform(0.2, 0.9, size=(B, s_hw, 8, F, 1)),
                            jnp.float32),
                jnp.asarray(rng.integers(0, F, size=(B, s_hw, 8, F, 1)),
                            np.uint8),
            )
    chunk_args = (params, lat, uncond, cond, rep, None, None, g_xs)

    # --- HLO metadata map: instruction name -> op_name
    lowered = fns.guided_chunk.lower(*chunk_args)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    meta = {}
    inst_re = re.compile(r"%?([\w.-]+) = .*metadata=\{[^}]*op_name=\"([^\"]*)\"")
    for line in hlo.splitlines():
        m = inst_re.search(line)
        if m:
            meta[m.group(1)] = m.group(2)
    print(f"HLO: {len(hlo)} bytes, {len(meta)} instructions with op_name",
          flush=True)

    # warm (compiles via cache), then trace one fresh dispatch
    out = fns.guided_chunk(*chunk_args)
    jax.block_until_ready(out)
    lat2 = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)
    with jax.profiler.trace(OUT):
        out = fns.guided_chunk(params, lat2, uncond, cond, rep, None, None, g_xs)
        jax.block_until_ready(out)
    print(f"traced to {OUT}", flush=True)

    # --- parse device op lane (see trace_report.py for the rationale)
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
    op_lane = None
    for key, evs in lanes.items():
        if any(ev["name"].startswith("while") for ev in evs):
            op_lane = key
    assert op_lane is not None, "no while events found on any device lane"
    evs = lanes[op_lane]
    whiles = sorted((e for e in evs if e["name"].startswith("while")),
                    key=lambda e: e["ts"])
    w = max(whiles, key=lambda e: e["dur"])
    ws, we = w["ts"], w["ts"] + w["dur"]
    inside = [e for e in evs
              if not e["name"].startswith("while") and ws <= e["ts"] < we]
    assert inside, "trace truncated before the while body — rerun"
    last = max(e["ts"] + e["dur"] for e in inside)
    covered_steps = nsteps * (last - ws) / (we - ws)
    print(f"guided while: {w['dur']/1e6:.2f}s, op events cover "
          f"~{covered_steps:.1f} of {nsteps} steps", flush=True)

    per_pass = collections.Counter()
    per_pass_mod = collections.defaultdict(collections.Counter)
    per_pass_fam = collections.defaultdict(collections.Counter)
    unmatched = collections.Counter()
    for e in inside:
        ms = e["dur"] / 1e3
        op_name = meta.get(e["name"])
        if op_name is None:
            unmatched[re.sub(r"[.\d]+$", "", e["name"])] += ms
            continue
        p = classify_pass(op_name)
        per_pass[p] += ms
        per_pass_mod[p][classify_module(op_name)] += ms
        per_pass_fam[p][re.sub(r"[.\d]+$", "", e["name"])] += ms

    print("\n=== guided-step pass table (ms/step) ===")
    total = 0.0
    for p in ("PLAIN", "GRADFWD", "BWD"):
        ms_step = per_pass[p] / covered_steps
        total += ms_step
        mods = "  ".join(f"{k} {v/covered_steps:.1f}"
                         for k, v in per_pass_mod[p].most_common(5))
        print(f"{p:8s} {ms_step:7.1f} ms/step | {mods}")
        for fam, v in per_pass_fam[p].most_common(6):
            print(f"         {v/covered_steps:7.2f}  {fam}")
    if unmatched:
        um = sum(unmatched.values()) / covered_steps
        total += um
        tops = "  ".join(f"{k} {v/covered_steps:.1f}"
                         for k, v in unmatched.most_common(4))
        print(f"UNMATCHED {um:6.1f} ms/step | {tops}")
    print(f"TOTAL    {total:7.1f} ms/step attributed "
          f"(wall {w['dur']/1e3/nsteps:.1f} ms/step)")


if __name__ == "__main__":
    main()
