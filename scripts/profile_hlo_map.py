"""Map the hottest trace ops of the denoise segment to their HLO bodies.

Usage: python scripts/profile_hlo_map.py [--frames 24] [--steps 2] \
           [--trace-dir /tmp/me_trace]

Compiles the same _jit_denoise_segment as scripts/profile_step.py, dumps
the optimized HLO, and for the top-N trace ops prints the fusion's root
expression, its operand/result shapes, an HBM byte estimate and the implied
roofline fraction — the per-bucket evidence format of PERF.md's round-2
audit. Reuses an existing trace dir if present (run profile_step.py first
for identical op names).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os.path as osp
import re
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

HBM_GBPS = 819e9  # v5e


def _trace_ops(log_dir: str):
    ops, counts = collections.Counter(), collections.Counter()
    for fpath in glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(fpath, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev and "args" in ev:
                name = ev.get("name", "?")
                if name.startswith(("$", "jit_", "Pjit")) or name == "while":
                    continue
                ops[name] += ev["dur"]
                counts[name] += 1
    return ops, counts


_SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|s8|u8|pred)\[([\d,]*)\]")


def _bytes_of(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "s8": 1,
                      "u8": 1, "pred": 1}[dt]
    return total


def _parse_fusions(hlo: str):
    """name -> (signature line, root line, computation name)."""
    sigs = {}
    # instruction lines: %name = <shape> fusion(...), kind=..., calls=%comp
    for m in re.finditer(r"%?([\w.-]+) = ([^\n]*?) fusion\(([^\n]*)\)", hlo):
        name, shape, rest = m.group(1), m.group(2), m.group(3)
        cm = re.search(r"calls=%?([\w.-]+)", rest)
        sigs[name] = {"out": shape, "args": rest, "comp": cm.group(1) if cm else None}
    for m in re.finditer(r"%?([\w.-]+) = ([^\n]*?) (copy|convolution)\(([^\n]*)\)", hlo):
        name, shape, kind, rest = m.groups()
        sigs[name] = {"out": shape, "args": rest, "comp": None, "kind": kind}
    # computation bodies: %comp (...) -> ... { ... ROOT ... }
    comps = {}
    for m in re.finditer(r"%([\w.-]+) \([^)]*\) -> [^\{]+\{(.*?)\n\}", hlo, re.S):
        body = m.group(2)
        rm = re.search(r"ROOT[^\n]*", body)
        kinds = collections.Counter(
            k for k in re.findall(r"= [\w\[\],: ]*?(\w+)\(", body)
        )
        comps[m.group(1)] = {
            "root": rm.group(0)[:300] if rm else "?",
            "kinds": dict(kinds.most_common(8)),
        }
    return sigs, comps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--trace-dir", default="/tmp/me_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.control.injection import (
        InjectionSpec,
        prepare_injection_masks,
    )
    from motioneditor_tpu.models.controlnet import controlnet_config, init_controlnet
    from motioneditor_tpu.models.unet import UNetConfig, init_unet
    from motioneditor_tpu.pipelines.editor import _jit_denoise_segment
    from motioneditor_tpu.schedulers import DiffusionSchedule

    dtype = jnp.bfloat16
    f, hw = args.frames, 64
    config, cn_config = UNetConfig(), controlnet_config()
    schedule = DiffusionSchedule()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.tree_util.tree_map(lambda x: x.astype(dtype), init_unet(k1, config))
    cn_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_controlnet(k2, cn_config)
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, f, hw, hw, 4), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 768), dtype)
    uncond = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 768), dtype)
    # cond embedding: tiny precompute, run it for real
    from motioneditor_tpu.models.controlnet import precompute_cond_embedding

    cond_image = jax.random.uniform(jax.random.PRNGKey(4), (2, f, 512, 512, 3), dtype)
    cond_emb = jax.jit(precompute_cond_embedding)(cn_params, cond_image)
    masks = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), prepare_injection_masks(jnp.ones((f, hw, hw)), f)
    )
    spec = InjectionSpec.from_start_layer(10)
    all_ts = jnp.asarray(schedule.inference_timesteps(50))
    seg_fn = _jit_denoise_segment(
        config, cn_config, schedule, 50, spec, 7.5, 1.0, True, False
    )
    dummy_uncond = jnp.zeros((args.steps, 1, 1, 1), dtype)
    fargs = (
        unet_params, cn_params, lat, all_ts[4 : 4 + args.steps],
        cond, uncond, dummy_uncond, cond_emb, masks, jnp.zeros(()),
    )
    compiled = jax.jit(lambda *a: seg_fn(*a)).lower(*fargs).compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo)} chars")
    sigs, comps = _parse_fusions(hlo)

    ops, counts = _trace_ops(args.trace_dir)
    print(f"(durations normalized per step: /{args.steps})\n")
    for name, dur in ops.most_common(args.top):
        ms = dur / 1e3 / args.steps
        if ms < 1.0:
            continue
        info = sigs.get(name)
        line = f"{ms:7.2f} ms  {name}"
        if info:
            nbytes = _bytes_of(info["out"]) + _bytes_of(info["args"])
            roof_ms = nbytes / HBM_GBPS * 1e3
            line += f"  bytes~{nbytes/1e6:.1f}MB roof~{roof_ms:.2f}ms ({100*roof_ms/ms:.0f}% of HBM roof)"
        print(line)
        if info and info.get("comp") and info["comp"] in comps:
            c = comps[info["comp"]]
            print(f"           kinds={c['kinds']}")
            print(f"           {c['root'][:220]}")
        elif info:
            print(f"           out={info['out'][:120]}")
            print(f"           args={info['args'][:200]}")


if __name__ == "__main__":
    main()
