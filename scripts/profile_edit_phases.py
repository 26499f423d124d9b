"""Wall-clock the full edit's phases at the north-star workload: VAE encode,
DDIM inversion, null-text optimization, injected denoise, VAE decode.

Usage: python scripts/profile_edit_phases.py [--frames 8] [--steps 10]
(steps bounds the scan lengths so first-compile stays tolerable; per-step
numbers extrapolate linearly to the 50-step product setting).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.models.unet import UNetConfig, init_unet
    from motioneditor_tpu.models.vae import (
        VAEConfig,
        init_vae,
        vae_decode_video,
        vae_encode_video,
    )
    from motioneditor_tpu.pipelines.editor import (
        _jit_ddim_invert,
        _jit_null_optimization,
    )
    from motioneditor_tpu.schedulers import DiffusionSchedule

    dtype = jnp.bfloat16
    f, hw = args.frames, 64
    steps = args.steps

    config = UNetConfig()
    schedule = DiffusionSchedule()
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_unet(jax.random.PRNGKey(0), config)
    )
    vae_config = VAEConfig()
    vae_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_vae(jax.random.PRNGKey(1), vae_config)
    )

    lat = jax.random.normal(jax.random.PRNGKey(2), (1, f, hw, hw, 4), dtype)
    video = jax.random.uniform(jax.random.PRNGKey(3), (1, f, 512, 512, 3), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(4), (1, 77, 768), dtype)
    ts = jnp.asarray(schedule.inference_timesteps(50)[:steps])

    def timeit(label, fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt*1e3:9.1f} ms total  ({dt*1e3/steps:7.2f} ms/step)")
        return dt

    enc = jax.jit(lambda p, v: vae_encode_video(p, v, sample=False, config=vae_config))
    dec = jax.jit(lambda p, l: vae_decode_video(p, l, config=vae_config))

    out = enc(vae_params, video)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = enc(vae_params, video)
    float(jnp.sum(out))
    print(f"{'vae encode (once)':28s} {(time.perf_counter()-t0)*1e3:9.1f} ms total")

    inv_fn = _jit_ddim_invert(config, schedule, steps, True, True)
    timeit("ddim inversion", inv_fn, unet_params, lat, cond, ts)

    all_lat = jnp.broadcast_to(lat[None], (steps + 1,) + lat.shape)
    c32 = cond.astype(jnp.float32)
    opt_fn = _jit_null_optimization(
        config, schedule, steps, 1, 1e-2, 7.5, True, "bfloat16"
    )
    timeit("null-text opt (bf16, inner=1)", opt_fn, unet_params,
           all_lat.astype(jnp.float32), c32, c32, ts)
    if os.environ.get("PROFILE_NULL_FP32"):
        opt32 = _jit_null_optimization(
            config, schedule, steps, 1, 1e-2, 7.5, True, "float32"
        )
        timeit("null-text opt (fp32, inner=1)", opt32, unet_params,
               all_lat.astype(jnp.float32), c32, c32, ts)

    t0 = time.perf_counter()
    out = dec(vae_params, lat)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = dec(vae_params, lat)
    float(jnp.sum(out))
    print(f"{'vae decode (once)':28s} {(time.perf_counter()-t0)*1e3:9.1f} ms total")


if __name__ == "__main__":
    main()
