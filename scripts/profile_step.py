"""Profile the denoise-segment hot loop and print a per-op-family summary.

Usage: python scripts/profile_step.py [--frames 8] [--steps 2]
Writes the perfetto trace under /tmp/me_trace and prints the aggregated
device-time table (utils/profiling.summarize_trace).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--trace-dir", default="/tmp/me_trace")
    args = ap.parse_args()

    os.environ["BENCH_FRAMES"] = str(args.frames)
    os.environ["BENCH_STEPS"] = str(args.steps)

    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.control.injection import (
        InjectionSpec,
        prepare_injection_masks,
    )
    from motioneditor_tpu.models.controlnet import (
        controlnet_config,
        init_controlnet,
        precompute_cond_embedding,
    )
    from motioneditor_tpu.models.unet import UNetConfig, init_unet
    from motioneditor_tpu.pipelines.editor import _jit_denoise_segment
    from motioneditor_tpu.schedulers import DiffusionSchedule
    from motioneditor_tpu.utils.profiling import summarize_trace, trace

    dtype = jnp.bfloat16
    f = args.frames
    hw = 64

    config = UNetConfig()
    cn_config = controlnet_config()
    schedule = DiffusionSchedule()

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_unet(k1, config)
    )
    cn_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_controlnet(k2, cn_config)
    )

    lat = jax.random.normal(jax.random.PRNGKey(1), (2, f, hw, hw, 4), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 768), dtype)
    uncond = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 768), dtype)
    cond_image = jax.random.uniform(
        jax.random.PRNGKey(4), (2, f, 512, 512, 3), dtype
    )
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

    def run(latents):
        out, _ = seg_fn(
            unet_params, cn_params, latents, all_ts[4 : 4 + args.steps],
            cond, uncond, dummy_uncond, cond_emb, masks, jnp.zeros(()),
        )
        return out

    out = run(lat)  # compile + warmup
    float(jnp.sum(out))

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    with trace(args.trace_dir):
        out = run(lat)
        float(jnp.sum(out))
    print(summarize_trace(args.trace_dir, top=30))


if __name__ == "__main__":
    main()
