"""Functional Swin Transformer backbone (JAX, NHWC) for the GroundingDINO
port.

Re-design of the reference backbone
(data_preparation/GroundedSAM/GroundingDINO/groundingdino/models/GroundingDINO/
backbone/swin_transformer.py:1-650) in the repo's functional style: params are
plain pytrees, every module is a pure function, shapes are static so the whole
backbone jit-compiles once per input resolution. Host-side prep runs batch-1
images; window partitioning is pure reshape/transpose (no gather), the
shifted-window mask is a compile-time constant, and attention uses plain XLA
sdpa — window sequences are 49/144 tokens, far below the Pallas kernel
break-even (ops/attention._FLASH_MIN_Q).

Variants (reference swin_transformer.py:762-786):
  swin_T_224_1k: embed_dim 96,  depths [2,2,6,2],  heads [3,6,12,24], ws 7
  swin_B_384_22k: embed_dim 128, depths [2,2,18,2], heads [4,8,16,32], ws 12
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import (
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, i: int) -> int:
        return self.embed_dim * (2**i)

    @property
    def num_channels(self) -> Tuple[int, ...]:
        return tuple(self.stage_dim(i) for i in self.out_indices)


SWIN_T = SwinConfig()
SWIN_B_384 = SwinConfig(
    embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32), window_size=12
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_window_attention(key, dim: int, heads: int, window: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qkv": init_linear(k1, dim, dim * 3),
        "proj": init_linear(k2, dim, dim),
        # trunc-normal(0.02) in the reference; table covers all relative
        # offsets in a (window, window) grid
        "rel_bias_table": 0.02
        * jax.random.truncated_normal(
            k3, -2.0, 2.0, ((2 * window - 1) * (2 * window - 1), heads), jnp.float32
        ),
    }


def _init_block(key, dim: int, heads: int, window: int, mlp_ratio: float):
    ks = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": init_layer_norm(dim),
        "attn": _init_window_attention(ks[0], dim, heads, window),
        "norm2": init_layer_norm(dim),
        "fc1": init_linear(ks[1], dim, hidden),
        "fc2": init_linear(ks[2], hidden, dim),
    }


def init_swin(key, config: SwinConfig = SWIN_T):
    keys = jax.random.split(key, config.num_stages + 1)
    params = {
        "patch_embed": {
            "proj": init_conv2d(keys[0], 3, config.embed_dim, config.patch_size),
            "norm": init_layer_norm(config.embed_dim),
        },
        "stages": [],
    }
    for i in range(config.num_stages):
        dim = config.stage_dim(i)
        bkeys = jax.random.split(keys[i + 1], config.depths[i] + 1)
        stage = {
            "blocks": [
                _init_block(
                    bkeys[j], dim, config.num_heads[i], config.window_size,
                    config.mlp_ratio,
                )
                for j in range(config.depths[i])
            ]
        }
        if i < config.num_stages - 1:  # PatchMerging after stages 0..n-2
            stage["downsample"] = {
                "norm": init_layer_norm(4 * dim),
                "reduction": init_linear(bkeys[-1], 4 * dim, 2 * dim, bias=False),
            }
        params["stages"].append(stage)
    for i in config.out_indices:
        params[f"out_norm{i}"] = init_layer_norm(config.stage_dim(i))
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rel_position_index(window: int) -> np.ndarray:
    """[ws*ws, ws*ws] index into the (2w-1)^2 bias table
    (swin_transformer.py:114-124)."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _shift_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask [nW, n, n] for SW-MSA
    (swin_transformer.py:231-249), computed at trace time (static shapes)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    win = (
        img.reshape(hp // window, window, wp // window, window)
        .transpose(0, 2, 1, 3)
        .reshape(-1, window * window)
    )
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, heads: int, window: int, mask: np.ndarray | None):
    """x: [B_, n, C] windows; mask: [nW, n, n] or None."""
    b_, n, c = x.shape
    d = c // heads
    qkv = linear(p["qkv"], x).reshape(b_, n, 3, heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [B_, H, n, d]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    idx = _rel_position_index(window).reshape(-1)
    bias = p["rel_bias_table"][idx].reshape(n, n, heads).transpose(2, 0, 1)
    s = s + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(b_ // nw, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
        s = s.reshape(b_, heads, n, n)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
    return linear(p["proj"], out.reshape(b_, n, c))


def _swin_block(p, x, h: int, w: int, heads: int, window: int, shift: int):
    """x: [B, H*W, C]. Pre-norm attention + MLP with residuals
    (swin_transformer.py:252-307)."""
    b, _, c = x.shape
    shortcut = x
    x = layer_norm(p["norm1"], x).reshape(b, h, w, c)

    hp = int(math.ceil(h / window)) * window
    wp = int(math.ceil(w / window)) * window
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, window, shift)
    else:
        mask = None
    # partition: [B, hp/ws, ws, wp/ws, ws, C] -> [B*nW, ws*ws, C]
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    x = _window_attention(p["attn"], x, heads, window, mask)
    x = x.reshape(b, hp // window, wp // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :h, :w].reshape(b, h * w, c)

    x = shortcut + x
    y = layer_norm(p["norm2"], x)
    y = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], y), approximate=False))
    return x + y


def _patch_merging(p, x, h: int, w: int):
    """[B, H*W, C] -> [B, (H/2)*(W/2), 2C] (swin_transformer.py:310-345)."""
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    pad_h, pad_w = h % 2, w % 2
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    )  # order matches the reference concat (x0, x1, x2, x3)
    x = x.reshape(b, -1, 4 * c)
    return linear(p["reduction"], layer_norm(p["norm"], x))


def swin_apply(params, images, config: SwinConfig = SWIN_T):
    """images: [B, H, W, 3] -> list of [B, Hi, Wi, Ci] feature maps for
    config.out_indices (stride 8/16/32 for the default (1, 2, 3))."""
    from motioneditor_tpu.models.layers import conv2d

    x = conv2d(
        params["patch_embed"]["proj"], images, stride=config.patch_size,
        padding="VALID",
    )
    b, h, w, c = x.shape
    x = layer_norm(params["patch_embed"]["norm"], x.reshape(b, h * w, c))

    outs = []
    for i, stage in enumerate(params["stages"]):
        dim = config.stage_dim(i)
        for j, blk in enumerate(stage["blocks"]):
            shift = 0 if j % 2 == 0 else config.window_size // 2
            # degenerate case: window covers the whole map -> no shift
            if min(h, w) <= config.window_size:
                shift = 0
            x = _swin_block(
                blk, x, h, w, config.num_heads[i], config.window_size, shift
            )
        if i in config.out_indices:
            y = layer_norm(params[f"out_norm{i}"], x)
            outs.append(y.reshape(b, h, w, dim))
        if "downsample" in stage:
            x = _patch_merging(stage["downsample"], x, h, w)
            h, w = (h + 1) // 2, (w + 1) // 2
    return outs
