"""Microbench: nearest-2x upsample + 3x3 conv vs its transposed-conv rewrite.

The UNet up path runs `upsample_nearest_2x` + 3x3 conv at three sites per
step (resnet_2d.py:77 Upsample3D in the reference; models/unet.py:573-575
here). Because nearest-2x duplicates pixels in 2x2 blocks, the pair is
EXACTLY a stride-2 transposed conv whose 4x4 kernel is the 3x3 kernel
box-filtered with ones(2,2):

    y = conv3x3(nearest2x(x), W)  ==  conv_transpose_s2(x, W (*) ones(2,2))

Each output pixel then reads 2x2 input pixels instead of 3x3 duplicated
ones -> 4/9 the MXU flops, and the 4x-size upsampled intermediate is never
materialized in HBM (conv operands cannot fuse producers, so the broadcast
tensor is a real HBM round-trip today).

Variants measured per site shape (B rows = 4 x frames, bf16):
  A: current   nearest2x + lax.conv 3x3
  B: lhs-dilated conv (lax.conv_general_dilated, lhs_dilation=2) w/ 4x4 kernel
  C: 4 phase 2x2 convs on the original grid + interleave reshape

Usage: python scripts/profile_upconv.py [--frames 24] [--iters 20]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from motioneditor_tpu.utils.runtime import setup

    setup()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from motioneditor_tpu.utils.profiling import timeit

    def kernel_4x4(w):  # [3,3,I,O] -> [4,4,I,O], box-filter with ones(2,2)
        k = jnp.zeros((4, 4) + w.shape[2:], w.dtype)
        for a in range(3):
            for b in range(3):
                for da in range(2):
                    for db in range(2):
                        k = k.at[a + da, b + db].add(w[a, b])
        return k

    def variant_a(x, w):
        b, h, ww, c = x.shape
        u = jnp.broadcast_to(
            x.reshape(b, h, 1, ww, 1, c), (b, h, 2, ww, 2, c)
        ).reshape(b, 2 * h, 2 * ww, c)
        return jax.lax.conv_general_dilated(
            u, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def variant_b(x, w):
        # y[m] = sum_i x[i] * k4[2i - m + 2]  (k4 = box-filtered kernel);
        # lhs_dilation=2 + pad (2,2) + kernel 4 gives exactly the 2h output
        k = kernel_4x4(w).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def variant_c(x, w):
        # phase decomposition of B: even outputs = cross-corr with k4[0::2]
        # pad (1,0); odd = k4[1::2] pad (0,1) (per axis), then interleave
        k = kernel_4x4(w).astype(x.dtype)
        b, h, ww, c = x.shape
        o = k.shape[-1]
        pads = {0: (1, 0), 1: (0, 1)}
        outs = []
        for p in range(2):
            row = []
            for q in range(2):
                kp = k[p :: 2, q :: 2]  # [2,2,I,O]
                row.append(
                    jax.lax.conv_general_dilated(
                        x, kp, (1, 1), [pads[p], pads[q]],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                )
            outs.append(row)
        y = jnp.stack(
            [jnp.stack(r, axis=3) for r in outs], axis=2
        )  # [b, h, 2, w, 2, o]
        return y.reshape(b, 2 * h, 2 * ww, o)

    shapes = [  # (h_in, w_in, cin, cout) — the three UNet up sites at 512px
        (8, 8, 1280, 1280),    # up block 0: 8 -> 16
        (16, 16, 1280, 1280),  # up block 1: 16 -> 32
        (32, 32, 640, 640),    # up block 2: 32 -> 64
    ]
    rows = 4 * args.frames
    key = jax.random.PRNGKey(0)
    for h, w_, ci, co in shapes:
        x = jax.random.normal(key, (rows, h, w_, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * 0.05
        fa = jax.jit(lambda x, w=w.astype(jnp.bfloat16): variant_a(x, w))
        fb = jax.jit(lambda x, w=w.astype(jnp.bfloat16): variant_b(x, w))
        fc = jax.jit(lambda x, w=w.astype(jnp.bfloat16): variant_c(x, w))
        # compare pairwise with fp32 diff reduced on device (the three
        # fp32 copies of a [96,128,128,640] result OOM a v5e otherwise)
        diff = jax.jit(
            lambda u, v: jnp.max(
                jnp.abs(u.astype(jnp.float32) - v.astype(jnp.float32))
            )
        )
        ya = fa(x)
        ea = float(diff(ya, fb(x)))
        ec = float(diff(ya, fc(x)))
        sd = float(jnp.std(ya.astype(jnp.float32)))
        del ya
        ta = timeit(fa, x, iters=args.iters)
        tb = timeit(fb, x, iters=args.iters)
        tc = timeit(fc, x, iters=args.iters)
        # B reduces over 2x2 input taps per output; A over 3x3 on the
        # 4x-size upsampled input = 9/4 the MXU flops
        flops_b = 2 * rows * (2 * h) * (2 * w_) * (4 * ci) * co
        print(
            f"[{rows}x{h}x{w_}x{ci}->{co}] A(up+3x3) {ta*1e3:7.3f} ms  "
            f"B(lhs-dil 4x4) {tb*1e3:7.3f} ms  C(4-phase) {tc*1e3:7.3f} ms  "
            f"| max|A-B| {ea:.2e} max|A-C| {ec:.2e} (std {sd:.3f}) "
            f"| A-roofline {9 * flops_b / 4 / 197e12 * 1e3:.3f} ms, "
            f"B-roofline {flops_b / 197e12 * 1e3:.3f} ms"
        )


if __name__ == "__main__":
    main()
