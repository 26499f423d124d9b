"""Multi-scale deformable attention — JAX equivalent of GroundingDINO's CUDA
kernel (the reference's only first-party native code: data_preparation/
GroundedSAM/GroundingDINO/.../csrc/MsDeformAttn, SURVEY §2.7 N1-N3).

Semantics match the reference's own PyTorch fallback
(``multi_scale_deformable_attn_pytorch``, ms_deform_attn.py:338): bilinear
grid-sampling (align_corners=False, zero padding) of per-level value maps at
predicted sampling locations, combined by attention weights.

This is host-side preprocessing in the TPU design (mask extraction), so a
fused-XLA implementation is the faithful equivalent; gathers lower to
efficient dynamic-slices on TPU. Oracle-tested against the reference's
PyTorch fallback (tests/test_prep.py). Called by the first-party
GroundingDINO port (models/grounding_dino._msdeform_apply — the encoder's
deformable self-attention and the decoder's deformable cross-attention),
which prep/masks.py runs with ``--dino_backend native``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(mode=bilinear, padding=zeros, align_corners=False).

    value: [N, H, W, C]; grid: [N, P, 2] normalized to [-1, 1] (x, y).
    Returns [N, P, C].
    """
    n, h, w, c = value.shape
    x = (grid[..., 0] + 1.0) * (w / 2.0) - 0.5
    y = (grid[..., 1] + 1.0) * (h / 2.0) - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = value.reshape(n, h * w, c)
        idx = yi_c * w + xi_c  # [N, P]
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * inside[..., None]

    out = (
        gather(y0, x0) * (wy0 * wx0)[..., None]
        + gather(y0, x1) * (wy0 * wx1)[..., None]
        + gather(y1, x0) * (wy1 * wx0)[..., None]
        + gather(y1, x1) * (wy1 * wx1)[..., None]
    )
    return out


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention core.

    value: [B, sum(H_l*W_l), heads, dim]
    spatial_shapes: static list of (H_l, W_l) per level
    sampling_locations: [B, Nq, heads, L, P, 2] in [0, 1]
    attention_weights: [B, Nq, heads, L, P]
    Returns [B, Nq, heads * dim].
    """
    b, _, heads, dim = value.shape
    _, nq, _, num_levels, num_points, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    # host-side indices: spatial_shapes is static, and jnp.cumsum would turn
    # the split points into tracers under jit
    value_list = jnp.split(value, list(np.cumsum(splits)[:-1]), axis=1)

    outputs = []
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value_list[lvl].reshape(b, hl, wl, heads, dim)
        v = v.transpose(0, 3, 1, 2, 4).reshape(b * heads, hl, wl, dim)
        grid = sampling_locations[:, :, :, lvl]  # [B, Nq, heads, P, 2]
        grid = 2.0 * grid - 1.0
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(b * heads, nq * num_points, 2)
        sampled = _bilinear_sample(v, grid)  # [B*heads, Nq*P, dim]
        outputs.append(sampled.reshape(b, heads, nq, num_points, dim))

    stacked = jnp.stack(outputs, axis=3)  # [B, heads, Nq, L, P, dim]
    weights = attention_weights.transpose(0, 2, 1, 3, 4)  # [B, heads, Nq, L, P]
    out = (stacked * weights[..., None]).sum(axis=(3, 4))  # [B, heads, Nq, dim]
    return out.transpose(0, 2, 1, 3).reshape(b, nq, heads * dim)
