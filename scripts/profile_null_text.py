"""Roofline audit of the null-text optimization step (PERF.md round-4).

The null-text phase (pipelines/editor.py:_jit_null_optimization, reference
null_text_optimization.py:136-169) is, at the shipped ``null_inner_steps: 1``,
structurally

    per outer step:  fwd(cond) + [fwd(u) + dx-bwd(u)] + fwd(u_final)
                     = 3 forwards + 1 embedding-gradient backward

which is LESS model work than the reference's own loop (3 forwards + bwd +
a batch-2 advance forward = 4F + B: :148 cond fwd, :150 inner fwd, :155 bwd,
:167 batch-2 get_noise_pred). This script measures each piece at the BASELINE
workload shape (24f 512px bf16) and prints the implied structural floor, so
"within X% of floor" is a recorded number instead of a guess.

Pieces:
  F   one batch-1 video-UNet forward       (2-step fwd-only scan)
  F+B one value_and_grad(loss) iteration   (2-step fwd+bwd scan)
  S   one full null-text outer step        (_jit_null_optimization, 2 steps)

floor = 3F + B;  overhead = S / floor - 1.

Usage: python scripts/profile_null_text.py [--frames 24] [--steps 2]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp

    from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply
    from motioneditor_tpu.pipelines.editor import _jit_null_optimization
    from motioneditor_tpu.schedulers import DiffusionSchedule, ddim_step

    cdt = jnp.dtype(args.dtype)
    f, hw, steps = args.frames, 64, args.steps
    config = DiffusionSchedule(), UNetConfig()
    schedule, config = config
    num_steps = 50

    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), init_unet(jax.random.PRNGKey(0), config)
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, f, hw, hw, 4), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), jnp.float32)
    ts = jnp.asarray(schedule.inference_timesteps(num_steps))[:steps]

    def eps_fn(p, l, t, emb):
        return unet_apply(
            p, config, l.astype(cdt), t, emb.astype(cdt),
            normal_infer=False, use_flash=True,
        ).astype(jnp.float32)

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # d2h: axon sync
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return (time.perf_counter() - t0) / steps * 1e3

    # F: forward-only scan
    @jax.jit
    def fwd_scan(p, l, c):
        def body(carry, i):
            e = eps_fn(p, carry, ts[i], c)
            # fold eps back in so the scan can't be collapsed
            return carry + 1e-6 * e, ()

        out, _ = jax.lax.scan(body, l, jnp.arange(steps))
        return out

    f_ms = timeit(fwd_scan, params, lat, cond)

    # F+B: value_and_grad of the trajectory loss w.r.t. the embedding
    @jax.jit
    def grad_scan(p, l, c, target):
        def body(carry, i):
            u = carry
            t = ts[i]

            def loss_fn(u_):
                e_u = eps_fn(p, l, t, u_)
                prev = ddim_step(schedule, e_u, t, l, num_steps)
                return jnp.mean((prev - target) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(u)
            return u - 1e-2 * g, loss

        out, losses = jax.lax.scan(body, c, jnp.arange(steps))
        return out

    fb_ms = timeit(grad_scan, params, lat, cond, lat * 0.9)

    # S: the shipped null-text step (inner=1, bf16 masters-fp32)
    nt_fn = _jit_null_optimization(
        config, schedule, steps, 1, 1e-2, 7.5, True, args.dtype
    )
    all_lat = jnp.broadcast_to(lat[None], (steps + 1,) + lat.shape)
    s_ms = timeit(nt_fn, params, all_lat, cond, cond, ts)

    b_ms = fb_ms - f_ms
    floor = 3 * f_ms + b_ms
    print(json.dumps({
        "frames": f,
        "fwd_ms": round(f_ms, 1),
        "fwd_bwd_ms": round(fb_ms, 1),
        "bwd_ms": round(b_ms, 1),
        "null_step_ms": round(s_ms, 1),
        "floor_3F_plus_B_ms": round(floor, 1),
        "overhead_vs_floor": round(s_ms / floor - 1, 3),
        "reference_structure_4F_plus_B_ms": round(4 * f_ms + b_ms, 1),
    }))


if __name__ == "__main__":
    main()
