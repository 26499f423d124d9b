"""Functional NN primitives (NHWC, explicit param pytrees).

These are the building blocks for the video UNet / VAE / CLIP / ControlNet /
adapter stacks. Every primitive is a pair of functions:

  ``init_*`` -> param dict (leaves are jnp arrays)
  ``*``      -> pure apply

Conventions:
  - images / features: NHWC;   video: [B, F, H, W, C]
  - linear kernels: (in, out)  (transposed from torch's (out, in))
  - conv kernels:   HWIO       (transposed from torch's OIHW)
  - temporal conv kernels: WIO over the frame axis

Reference primitives being re-expressed:
  InflatedConv3d / TemporalConv / Upsample2D / Downsample2D:
    motion_editor/models/resnet_2d.py:10-125
  GEGLU feed-forward: diffusers FeedForward as used at attention_2d.py:427
  Timesteps/TimestepEmbedding: unet_2d_condition.py:163-166
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers (match torch defaults so random-init scales are comparable)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, zero_init: bool = False):
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    params = {
        "kernel": (
            jnp.zeros((in_dim, out_dim), jnp.float32)
            if zero_init
            else _uniform(kkey, (in_dim, out_dim), bound)
        )
    }
    if bias:
        params["bias"] = (
            jnp.zeros((out_dim,), jnp.float32) if zero_init else _uniform(bkey, (out_dim,), bound)
        )
    return params


def linear(params, x):
    y = x @ params["kernel"].astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def init_conv2d(
    key,
    in_ch: int,
    out_ch: int,
    kernel_size: int,
    bias: bool = True,
    zero_init: bool = False,
):
    kkey, bkey = jax.random.split(key)
    fan_in = in_ch * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    shape = (kernel_size, kernel_size, in_ch, out_ch)
    params = {
        "kernel": jnp.zeros(shape, jnp.float32) if zero_init else _uniform(kkey, shape, bound)
    }
    if bias:
        params["bias"] = (
            jnp.zeros((out_ch,), jnp.float32) if zero_init else _uniform(bkey, (out_ch,), bound)
        )
    return params


def conv2d(params, x, stride: int = 1, padding="SAME"):
    """NHWC conv. ``padding`` is "SAME", "VALID", or an int."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def inflated_conv3d(params, video, stride: int = 1, padding="SAME"):
    """Per-frame 2D conv on [B, F, H, W, C] (resnet_2d.py:28-36 InflatedConv3d)."""
    b, f, h, w, c = video.shape
    y = conv2d(params, video.reshape(b * f, h, w, c), stride=stride, padding=padding)
    return y.reshape(b, f, *y.shape[1:])


def init_temporal_conv(key, channels: int, kernel_size: int = 3, zero_init: bool = True):
    """Conv1d over the frame axis; zero-init by default so the inflated UNet
    is a per-frame SD UNet at init (resnet_2d.py:14-16)."""
    del key
    if zero_init:
        kernel = jnp.zeros((kernel_size, channels, channels), jnp.float32)
        bias = jnp.zeros((channels,), jnp.float32)
    else:
        raise NotImplementedError("reference always zero-inits TemporalConv")
    return {"kernel": kernel, "bias": bias}


def _tc_matmul_enabled() -> bool:
    """Default: TPU-only. The K-term matmul form is a TPU-layout optimization
    (avoids relayout copies, see temporal_conv note); its frame-axis pads and
    slices are expensive to SPMD-partition on other backends — round 4
    shipped it unconditionally and the virtual-CPU-mesh multichip dryrun
    (frame-sharded, ~70 temporal_conv sites per program) blew its compile
    budget (MULTICHIP_r04 rc=124). MOTIONEDITOR_TC_MATMUL=0/1 overrides."""
    env = os.environ.get("MOTIONEDITOR_TC_MATMUL")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "off", "")
    return jax.default_backend() == "tpu"


def temporal_conv(params, video, padding="SAME"):
    """[B, F, H, W, C] -> conv over F at each spatial site (resnet_2d.py:18-26).

    Layout note (measured on v5e, round-4 copy audit, 24f denoise bench):
    the obvious ``transpose -> lax.conv NWC -> transpose back`` lowering
    relayouts the full activation twice per call (~16 ms/step of pure
    copies in the 24f trace; 72.88 ms/step/frame end-to-end). Two
    native-layout reformulations were measured:
      - K shifted channel-matmuls (this form, TPU default): out[f] =
        sum_k (video @ W[k])[f + k - pad_lo]; frame shifts are pad/slice
        fusions. 72.40 ms/step/frame.
      - (K, 1)-window 2D conv over spatial dims (F, H*W): keeps conv
        layouts end-to-end, but the conv itself runs slower than the
        co-scheduled small-N dots. 72.53 ms/step/frame.
    The matmul form wins on TPU and ships there; off-TPU (CPU mesh tests,
    the multichip dryrun) the single transpose->lax.conv NWC form is used
    instead — layout copies are a TPU-only concern, and one conv op is far
    cheaper to trace/partition than K einsum+pad terms (_tc_matmul_enabled).
    Both forms are numerically identical (test_temporal_conv_forms_agree)."""
    if not _tc_matmul_enabled():
        b, f, h, w, c = video.shape
        x = video.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        y = jax.lax.conv_general_dilated(
            x,
            params["kernel"].astype(x.dtype),
            window_strides=(1,),
            padding=padding,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + params["bias"].astype(x.dtype)
        return y.reshape(b, h, w, y.shape[1], c).transpose(0, 3, 1, 2, 4)
    b, f, h, w, c = video.shape
    kernel = params["kernel"].astype(video.dtype)  # [K, C_in, C_out]
    ksz = kernel.shape[0]
    if padding == "SAME":
        pad_lo = (ksz - 1) // 2  # lax SAME for stride 1: lo=(K-1)//2
        f_out = f
    elif padding == "VALID":
        pad_lo = 0
        f_out = f - ksz + 1
    else:
        raise ValueError(f"temporal_conv: unsupported padding {padding!r}")
    acc = None
    for kk in range(ksz):
        u = jnp.einsum("bfhwc,cd->bfhwd", video, kernel[kk])
        lo = kk - pad_lo  # out[t] reads u[t + lo]
        src_start = max(lo, 0)
        src_stop = min(f, f_out + lo)
        term = u[:, src_start:src_stop]
        dst_start = src_start - lo
        term = jnp.pad(
            term,
            (
                (0, 0),
                (dst_start, f_out - (src_stop - lo)),
                (0, 0),
                (0, 0),
                (0, 0),
            ),
        )
        acc = term if acc is None else acc + term
    return acc + params["bias"].astype(video.dtype)


def init_group_norm(num_channels: int):
    return {
        "scale": jnp.ones((num_channels,), jnp.float32),
        "bias": jnp.zeros((num_channels,), jnp.float32),
    }


def group_norm(params, x, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over channel-last tensors of any rank [..., C].

    Stats are computed in fp32 over all non-leading-batch axes per group,
    matching torch GroupNorm semantics (normalize over (C/G, *spatial)).
    The leading axis is batch; everything between is spatial.

    Layout note (measured on v5e): reshaping the big tensor to
    ``(b, s, G, C/G)`` makes the group axis a 10-wide minor reduce, which XLA
    implements as a full fp32 relayout copy of the activation — ~100 ms/step
    in the denoise loop. Instead we reduce over the spatial axes in the
    native channel-minor layout (per-channel sum/sumsq), collapse the tiny
    ``[B, C]`` result to groups, and normalize with one fused multiply-add.

    Numerics note: the one-pass E[x^2] - E[x]^2 variance cancels when
    |mean| >> std. With fp32 accumulation the relative variance error is
    ~(mean/std)^2 * 2^-24, i.e. < 6e-4 for |mean|/std <= 100 — far beyond
    any activation statistic seen in SD UNets (post-conv GN inputs have
    |mean|/std < 10). tests/test_layers.py::test_group_norm_high_mean_stats
    pins this bound against the centered two-pass formulation.

    Kernel note (round 4): a Pallas pair-stats kernel for these reduces
    exists (ops/gn_stats.py, exact custom VJP) but is DEFAULT-OFF — the
    round-4 2x2 ablation measured it as an end-to-end regression (24f
    denoise 72.88 -> 75.26 ms/step/frame): XLA fuses the stats as epilogues
    of the producing conv/matmul fusions, and an opaque kernel strands
    those epilogues into extra HBM round-trips. MOTIONEDITOR_FUSED_GN=1
    opts in (e.g. to re-measure on another chip generation).
    """
    from motioneditor_tpu.ops.gn_stats import group_norm_fused

    fused = group_norm_fused(params, x, num_groups, eps)
    if fused is not None:
        return fused
    orig_dtype = x.dtype
    c = x.shape[-1]
    b = x.shape[0]
    cpg = c // num_groups
    red_axes = tuple(range(1, x.ndim - 1))
    n = float(np.prod(x.shape[1:-1]) * cpg)

    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=red_axes).reshape(b, num_groups, cpg).sum(axis=-1)
    s2 = jnp.sum(xf * xf, axis=red_axes).reshape(b, num_groups, cpg).sum(axis=-1)
    mean = s1 / n  # [B, G]
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)

    # fold affine params into per-channel gain/offset: out = x * g + o
    scale = params["scale"].reshape(num_groups, cpg)
    bias = params["bias"].reshape(num_groups, cpg)
    gain = (inv[..., None] * scale).reshape(b, c)
    offset = (bias - (mean * inv)[..., None] * scale).reshape(b, c)
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = xf * gain.reshape(bshape) + offset.reshape(bshape)
    return out.astype(orig_dtype)


def init_layer_norm(dim: int):
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def _ln_dot_stats_enabled() -> bool:
    """Default: TPU-only (measured end-to-end win there, see layer_norm
    note). The dot-against-ones stats form is a TPU layout/MXU optimization;
    on other backends it is at best neutral and it costs extra HLO, so the
    default follows the backend (the gn_stats lesson: gate TPU-layout
    optimizations on backend, not env alone).
    MOTIONEDITOR_LN_DOT_STATS=0/1 overrides either way."""
    env = os.environ.get("MOTIONEDITOR_LN_DOT_STATS")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "off", "")
    return jax.default_backend() == "tpu"


def layer_norm(params, x, eps: float = 1e-5):
    """LayerNorm over the minor (channel) axis, fp32 stats.

    bf16 stats form (round 4, measured): XLA lowers the minor-dim
    convert+reduce for mean/var as standalone ``convert_reduce`` fusions
    that run at ~20% of HBM roofline in the denoise program (8.33 ms/step
    per level-0 site vs a 0.9 ms roofline — the reduce is over the 128-lane
    minor dim, and the fusion's input sits in whatever layout the producer
    chose). Computing the channel sums as an MXU dot against a ones vector
    instead (both s1 and s2, fp32 accumulation) measures end-to-end
    72.07 -> 70.65 ms/step/frame at the BASELINE shape (24f 512px bf16,
    MFU 0.398 -> 0.406). Numerics: the one-pass variance is computed from
    bf16-rounded squares (each ~2^-9 relative), so after the E[x^2]-mean^2
    cancellation the variance error is ~(mean/std)^2 * 2^-9 / sqrt(C)
    relative — ~1% normalized-output error at |mean|/std=5 (the realistic
    ceiling for SD transformer LN inputs), pinned by
    test_layer_norm_bf16_high_mean_stats. fp32 inputs — the parity path
    (mixed_precision: "no") — keep the exact fp32 reduce form.
    Default TPU-only; MOTIONEDITOR_LN_DOT_STATS=0/1 overrides.
    """
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16 and _ln_dot_stats_enabled():
        c = x.shape[-1]
        ones = jnp.ones((c, 1), jnp.bfloat16)
        dims = (((x.ndim - 1,), (0,)), ((), ()))
        s1 = jax.lax.dot_general(x, ones, dims,
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(x * x, ones, dims,
                                 preferred_element_type=jnp.float32)
        mean = s1 / c
        var = jnp.maximum(s2 / c - jnp.square(mean), 0.0)
        out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
        out = out * params["scale"] + params["bias"]
        return out.astype(orig_dtype)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * params["scale"] + params["bias"]
    return out.astype(orig_dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# GEGLU feed-forward (diffusers FeedForward, mult=4)
# ---------------------------------------------------------------------------


def init_feed_forward(key, dim: int, mult: int = 4):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj_in": init_linear(k1, dim, inner * 2),
        "proj_out": init_linear(k2, inner, dim),
    }


def feed_forward(params, x):
    h = linear(params["proj_in"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return linear(params["proj_out"], h)


# ---------------------------------------------------------------------------
# timestep embedding
# ---------------------------------------------------------------------------


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """diffusers get_timestep_embedding, SD UNet config (flip=True, shift=0)."""
    half = dim // 2
    # frequencies as host-side fp64 constants: TPU's approximate exp() costs
    # ~1e-6 relative on each frequency, which becomes ~1e-3 absolute in the
    # angle at t~1000
    freqs = jnp.asarray(
        np.exp(
            -math.log(max_period)
            * np.arange(half, dtype=np.float64)
            / (half - downscale_freq_shift)
        ),
        dtype=jnp.float32,
    )
    emb = freqs[None, :] * timesteps.astype(jnp.float32)[:, None]
    # explicit 2-pi range reduction keeps fp32 sin/cos accurate at t~1000
    two_pi = 2.0 * math.pi
    emb = emb - two_pi * jnp.floor(emb / two_pi)
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def init_timestep_embedding_mlp(key, in_dim: int, time_embed_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_linear(k1, in_dim, time_embed_dim),
        "linear_2": init_linear(k2, time_embed_dim, time_embed_dim),
    }


def timestep_embedding_mlp(params, t_emb):
    return linear(params["linear_2"], silu(linear(params["linear_1"], t_emb)))


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


def upsample_nearest_2x(video):
    """[B, F, H, W, C] -> [B, F, 2H, 2W, C] nearest (resnet_2d.py:77 with
    scale_factor [1, 2, 2])."""
    b, f, h, w, c = video.shape
    x = video.reshape(b, f, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (b, f, h, 2, w, 2, c))
    return x.reshape(b, f, h * 2, w * 2, c)


def _upconv_fused_enabled() -> bool:
    """Default: TPU-only, like _tc_matmul_enabled. The transposed-conv form
    is a TPU flop/HBM optimization; off-TPU (CPU mesh tests, the multichip
    dryrun) the two-op reference form keeps trace/partition cost minimal.
    MOTIONEDITOR_UPCONV_FUSED=0/1 overrides."""
    env = os.environ.get("MOTIONEDITOR_UPCONV_FUSED")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "off", "")
    return jax.default_backend() == "tpu"


def _boxfilter_kernel_4x4(w):
    """[3,3,I,O] -> [4,4,I,O]: k4[u,v] = sum_{da,db in {0,1}} w[u-da, v-db]
    (the 3x3 kernel convolved with ones(2,2))."""
    pads = []
    for da in (0, 1):
        for db in (0, 1):
            pads.append(jnp.pad(w, ((da, 1 - da), (db, 1 - db), (0, 0), (0, 0))))
    return pads[0] + pads[1] + pads[2] + pads[3]


def upsample_conv2d_2x(params, x):
    """Fused nearest-2x upsample + SAME 3x3 conv: [N,H,W,C] -> [N,2H,2W,C'].

    Because nearest-2x repeats each pixel in a 2x2 block, the pair
    ``conv3x3(nearest2x(x))`` is EXACTLY a stride-2 transposed conv whose
    4x4 kernel is the 3x3 kernel box-filtered with ones(2,2): output
    m = 2i+p reads x[i+du] with weight k4[2 - (m - 2(i+du))] per axis.
    Each output pixel then reduces over 2x2 input pixels instead of 3x3
    duplicated ones — 4/9 the MXU flops — and the 4x-size upsampled
    intermediate (a real HBM round-trip today: conv operands cannot have
    fused producers) is never materialized. Exact-parity-tested against
    the two-op form (tests/test_layers.py::test_upsample_conv_forms_agree).
    Reference semantics: resnet_2d.py:60-85 Upsample3D (interpolate
    scale=2 nearest + SAME conv3x3).
    """
    if not _upconv_fused_enabled():
        n, h, w, c = x.shape
        u = jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
        ).reshape(n, 2 * h, 2 * w, c)
        return conv2d(params, u, padding=1)
    k4 = _boxfilter_kernel_4x4(params["kernel"]).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def upsample_conv3d_2x(params, video):
    """Per-frame fused upsample+conv on [B, F, H, W, C] (the UNet up-block
    tail: resnet_2d.py:77 Upsample3D with scale_factor [1, 2, 2])."""
    b, f, h, w, c = video.shape
    y = upsample_conv2d_2x(params, video.reshape(b * f, h, w, c))
    return y.reshape(b, f, *y.shape[1:])


def nearest_resize(x, size: Tuple[int, int]):
    """Nearest-neighbor resize of [..., H, W, C] to match torch
    F.interpolate(mode="nearest") index selection (floor of scaled index)."""
    h, w = x.shape[-3], x.shape[-2]
    th, tw = size
    rows = jnp.floor(jnp.arange(th) * (h / th)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(tw) * (w / tw)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=-3)
    return jnp.take(x, cols, axis=-2)
