"""Benchmark: the two-branch denoise hot loop on the BASELINE workload shape.

Measures one full denoise step — batch-4 video UNet (with injection + adapter
plumbing) + 2-row ControlNet + CFG + DDIM update — at 512x512, bf16, on the
north-star 24-frame clip (BASELINE.md: 24-frame 512^2 edit, 50 DDIM steps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = UNet denoise milliseconds per step per frame (lower is better).
vs_baseline compares against the recorded A100+xformers reference estimate
in BASELINE_MS_PER_STEP_PER_FRAME below (the repo publishes no numbers —
BASELINE.json "published": {} — so this constant documents our measured
stand-in and is updated when a real reference measurement lands).
"""

from __future__ import annotations

import json
import os
import time

# A100 + xformers fp16 reference stand-in (ms per denoise step per frame for
# the full batch-4 step). No published number exists (BASELINE.md); this is
# the working target to beat and is revised when a measured number lands.
BASELINE_MS_PER_STEP_PER_FRAME = 60.0

FRAMES = int(os.environ.get("BENCH_FRAMES", "24"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))


def main():
    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.control.injection import (
        InjectionSpec,
        prepare_injection_masks,
    )
    from motioneditor_tpu.models.controlnet import controlnet_config, init_controlnet
    from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from motioneditor_tpu.models.controlnet import controlnet_apply
    from motioneditor_tpu.schedulers import DiffusionSchedule, ddim_step

    dtype = jnp.bfloat16
    f = FRAMES
    hw = 64

    config = UNetConfig()
    cn_config = controlnet_config()
    schedule = DiffusionSchedule()

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    unet_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_unet(k1, config)
    )
    cn_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), init_controlnet(k2, cn_config)
    )

    lat = jax.random.normal(jax.random.PRNGKey(1), (2, f, hw, hw, 4), dtype)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 768), dtype)
    uncond = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 768), dtype)
    cond_image = jax.random.uniform(jax.random.PRNGKey(4), (2, f, 512, 512, 3), dtype)
    masks = prepare_injection_masks(jnp.ones((f, hw, hw)), f)
    masks = jax.tree_util.tree_map(lambda x: x.astype(dtype), masks)
    spec = InjectionSpec.from_start_layer(10)

    @jax.jit
    def denoise_step(lat, t):
        latent_in = jnp.concatenate([lat, lat], axis=0)
        text_in = jnp.concatenate([uncond, cond], axis=0)
        import numpy as np

        cn_lat = latent_in[jnp.asarray([1, 3])]
        cn_text = text_in[jnp.asarray([1, 3])]
        down_res, mid_res = controlnet_apply(
            cn_params, cn_config, cn_lat, t, cn_text, cond_image
        )
        zero_mid = jnp.zeros_like(mid_res[:1])
        mid4 = jnp.concatenate([zero_mid, mid_res[:1], zero_mid, mid_res[1:2]], axis=0)
        eps = unet_apply(
            unet_params, config, latent_in, t, text_in,
            injection=spec, injection_masks=masks,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid4,
        )
        eps_u, eps_c = jnp.split(eps, 2, axis=0)
        eps_g = eps_u + 7.5 * (eps_c - eps_u)
        return ddim_step(schedule, eps_g, t, lat, 50)

    t = jnp.asarray(501)
    # warmup / compile
    out = denoise_step(lat, t)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    cur = lat
    for i in range(STEPS):
        cur = denoise_step(cur, t)
    jax.block_until_ready(cur)
    dt = (time.perf_counter() - t0) / STEPS

    ms_per_step = dt * 1e3
    ms_per_step_per_frame = ms_per_step / f
    print(
        json.dumps(
            {
                "metric": f"unet_denoise_ms_per_step_per_frame_{f}f_512px_bf16",
                "value": round(ms_per_step_per_frame, 3),
                "unit": "ms/step/frame",
                "vs_baseline": round(
                    BASELINE_MS_PER_STEP_PER_FRAME / ms_per_step_per_frame, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
