"""Attention primitives and video K/V-selection variants.

Re-expresses the reference's attention zoo (motion_editor/models/
attention_2d.py) as pure functions over a video token tensor
``[B, F, N, C]`` (B = branch/batch, F = frames, N = H*W tokens):

  - normal        per-frame self-attention           (attention_2d.py:115-170)
  - sparse_causal K/V = [frame0, prev frame]         (attention_2d.py:573-580)
  - motion_frame  K/V = [prev frame, current frame]  (attention_2d.py:732-740)
  - dense         K/V = all frames                   (attention_2d.py:651-657)
  - temporal      attention over the frame axis with a causal additive mask
                  (attention_2d.py:535-544, temporal_attn.py)

The scaled-dot-product core upcasts softmax to fp32 and can route through the
Pallas flash kernel (ops/flash_attention.py) for long sequences.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import init_linear, linear

# Attention modes (static strings keep dispatch trace-time only).
NORMAL = "normal"
SPARSE_CAUSAL = "sparse_causal"
MOTION_FRAME = "motion_frame"
DENSE = "dense"

_FLASH_MIN_Q = 1024  # below this, XLA's fused softmax path is already fine


def init_attention(
    key,
    query_dim: int,
    cross_dim: Optional[int] = None,
    heads: int = 8,
    dim_head: Optional[int] = None,
    zero_out: bool = False,
):
    """q/k/v have no bias, out has bias (attention_2d.py:83-93)."""
    cross_dim = cross_dim if cross_dim is not None else query_dim
    inner = heads * (dim_head if dim_head is not None else query_dim // heads)
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "to_q": init_linear(kq, query_dim, inner, bias=False),
        "to_k": init_linear(kk, cross_dim, inner, bias=False),
        "to_v": init_linear(kv, cross_dim, inner, bias=False),
        "to_out": init_linear(ko, inner, query_dim, zero_init=zero_out),
    }


def split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[..., N, H*D] -> [..., H, N, D]"""
    *lead, n, c = x.shape
    x = x.reshape(*lead, n, heads, c // heads)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., H, N, D] -> [..., N, H*D]"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, n, h, d = x.shape
    return x.reshape(*lead, n, h * d)


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention over [..., H, N, D] with fp32 softmax.

    Equivalent to CrossAttention._attention (attention_2d.py:172-201); the
    xformers memory-efficient path maps to the Pallas flash kernel.
    """
    if use_flash and bias is None and q.shape[-2] >= _FLASH_MIN_Q:
        from motioneditor_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale)

    scores = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)


def attention_probs(
    q: jnp.ndarray, k: jnp.ndarray, scale: float, bias: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Explicit softmax probabilities (needed by p2p controllers and the
    16x16 cross-attn map collection at fully_control.py:430-432)."""
    scores = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    return jax.nn.softmax(scores, axis=-1)


# ---------------------------------------------------------------------------
# frame-selection K/V builders on [B, F, N, C]
# ---------------------------------------------------------------------------


def _former_frame_index(f: int) -> np.ndarray:
    idx = np.arange(f) - 1
    idx[0] = 0
    return idx


def select_kv(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Build per-frame K/V source tokens from video tokens [B, F, N, C].

    normal        -> [B, F, N, C]
    sparse_causal -> [B, F, 2N, C]  ([frame0, prev])
    motion_frame  -> [B, F, 2N, C]  ([prev, cur])
    dense         -> [B, F, F*N, C] (all frames, frame-major)
    """
    b, f, n, c = x.shape
    if mode == NORMAL:
        return x
    former = _former_frame_index(f)
    if mode == SPARSE_CAUSAL:
        first = jnp.broadcast_to(x[:, :1], (b, f, n, c))
        return jnp.concatenate([first, x[:, former]], axis=2)
    if mode == MOTION_FRAME:
        return jnp.concatenate([x[:, former], x], axis=2)
    if mode == DENSE:
        flat = x.reshape(b, 1, f * n, c)
        return jnp.broadcast_to(flat, (b, f, f * n, c))
    raise ValueError(f"unknown attention mode {mode}")


def spatial_self_attention(
    params,
    x: jnp.ndarray,
    mode: str,
    heads: int,
    use_flash: bool = True,
    prob_editor=None,
    shard=None,
) -> jnp.ndarray:
    """Video self-attention with per-frame K/V selection.

    x: [B, F, N, C]. Queries stay per-frame; keys/values are chosen by
    ``mode``. This covers CrossAttention/SparseCausalAttention/
    MotionFrameAttention/SpatialTemporalAttention (normal_infer toggles map
    to mode=NORMAL).

    ``prob_editor``: optional (probs, is_cross=False) -> probs hook — the
    p2p self-attn map replacement (p2p_stable.py:135-139, applied only at
    Q <= 16^2 so the big resolutions keep the fused kernel path).

    ``shard``: optional FrameShardingCtx — run the kernel per frame shard
    via shard_map with explicit halo collectives (parallel/flash_sharding);
    when set but unsupported, the op stays on the GSPMD einsum path (an
    unsharded pallas_call under a mesh would replicate on every device).
    """
    b, f, n, c = x.shape
    q = linear(params["to_q"], x)
    k = linear(params["to_k"], x)
    v = linear(params["to_v"], x)
    inner = q.shape[-1]
    dim_head = inner // heads
    scale = dim_head**-0.5

    if prob_editor is not None and n <= 256:
        kk = select_kv(k, mode)
        vv = select_kv(v, mode)
        qh = split_heads(q, heads)
        kh = split_heads(kk, heads)
        vh = split_heads(vv, heads)
        probs = attention_probs(qh, kh, scale)  # [B, F, H, N, KV]
        probs = prob_editor(probs, False)
        out = jnp.einsum("...qk,...kd->...qd", probs.astype(vh.dtype), vh)
        return linear(params["to_out"], merge_heads(out))

    if shard is not None:
        if use_flash and n >= _FLASH_MIN_Q:
            from motioneditor_tpu.parallel.flash_sharding import (
                sharded_spatial_flash,
            )

            out = sharded_spatial_flash(q, k, v, mode, scale, heads, shard)
            if out is not None:
                return linear(params["to_out"], out)
        use_flash = False

    if use_flash and n >= _FLASH_MIN_Q:
        from motioneditor_tpu.ops.video_flash import (
            video_flash_attention,
            video_flash_supported,
        )

        if video_flash_supported(n, inner, heads, q.dtype.itemsize):
            # packed-head kernel: head split AND frame-selection K/V happen
            # in-kernel — no select_kv concat or split_heads relayouts in HBM
            out = video_flash_attention(q, k, v, mode, scale, heads)
            return linear(params["to_out"], out)

    k = select_kv(k, mode)
    v = select_kv(v, mode)
    qh = split_heads(q, heads)  # [B, F, H, N, D]
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)
    out = sdpa(qh, kh, vh, scale, use_flash=use_flash)
    return linear(params["to_out"], merge_heads(out))


def cross_attention(
    params,
    x: jnp.ndarray,
    encoder_states: jnp.ndarray,
    heads: int,
    use_flash: bool = False,
    collect_maps_into: Optional[list] = None,
    prob_editor=None,
) -> jnp.ndarray:
    """Text cross-attention. x: [B, F, N, C]; encoder_states: [B, L, D_text]
    (repeated per frame, attention_2d.py:343).

    ``collect_maps_into``: when given, appends the mean-over-heads attention
    probabilities [(B F), N, L] — the cross-attn map collection the MaskAuto
    editor consumes (fully_control.py:430-432).

    ``prob_editor``: optional (probs, is_cross=True) -> probs hook over the
    [B, F, H, N, L] softmax probabilities — the p2p controller intercept
    (ptp_utils.py:226). Maps are collected PRE-edit, matching the reference
    (AttentionControlEdit.forward stores via super() before editing,
    p2p_stable.py:146-148)."""
    b, f, n, c = x.shape
    q = linear(params["to_q"], x)
    k = linear(params["to_k"], encoder_states)  # [B, L, C]
    v = linear(params["to_v"], encoder_states)
    dim_head = q.shape[-1] // heads
    scale = dim_head**-0.5
    qh = split_heads(q, heads)  # [B, F, H, N, D]
    kh = split_heads(k, heads)[:, None]  # [B, 1, H, L, D] broadcast over frames
    vh = split_heads(v, heads)[:, None]
    kb = jnp.broadcast_to(kh, (b, f) + kh.shape[2:])
    vb = jnp.broadcast_to(vh, (b, f) + vh.shape[2:])
    if collect_maps_into is not None or prob_editor is not None:
        probs = attention_probs(qh, kb, scale)  # [B, F, H, N, L]
        if collect_maps_into is not None:
            collect_maps_into.append(
                probs.mean(axis=2).reshape(b * f, n, probs.shape[-1])
            )
        if prob_editor is not None:
            probs = prob_editor(probs, True)
        out = jnp.einsum("bfhqk,bfhkd->bfhqd", probs.astype(vb.dtype), vb)
    else:
        out = sdpa(qh, kb, vb, scale, use_flash=use_flash)
    return linear(params["to_out"], merge_heads(out))


def causal_temporal_bias(f: int) -> jnp.ndarray:
    """(1 - tril) * -1e4 over frames (attention_2d.py:542-543)."""
    mask = jnp.tril(jnp.ones((f, f), jnp.float32))
    return (1.0 - mask) * -10000.0


def temporal_self_attention(
    params,
    x: jnp.ndarray,
    heads: int,
    causal: bool = True,
    kv_override: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over the frame axis at each spatial site.

    x: [B, N, F, C] (tokens transposed so frames are the sequence).
    ``kv_override`` (same shape) substitutes the K/V source — used by the
    temporal injection editor where the edit branch reads the reconstruction
    branch's K/V (temporal_control.py:82-86).
    """
    b, n, f, c = x.shape
    kv_src = x if kv_override is None else kv_override
    q = linear(params["to_q"], x)
    k = linear(params["to_k"], kv_src)
    v = linear(params["to_v"], kv_src)
    dim_head = q.shape[-1] // heads
    scale = dim_head**-0.5
    qh = split_heads(q, heads)  # [B, N, H, F, D]
    kh = split_heads(k, heads)
    vh = split_heads(v, heads)
    bias = causal_temporal_bias(f) if causal else None
    out = sdpa(qh, kh, vh, scale, bias=bias, use_flash=False)
    return linear(params["to_out"], merge_heads(out))


def temporal_self_attention_video(
    params,
    x: jnp.ndarray,
    heads: int,
    causal: bool = True,
    kv_override: Optional[jnp.ndarray] = None,
    use_kernel: bool = True,
    shard=None,
) -> jnp.ndarray:
    """Temporal attention taking video tokens in their NATIVE layout
    [B, F, N, C] — same math as :func:`temporal_self_attention`, without the
    [B, N, F, C] transpose round-trip at the call site.

    With ``use_kernel`` the Pallas kernel (ops/temporal_flash.py) runs the
    whole attention in the native layout: no head-split relayout copies and
    no HBM-materialized [B, N, H, F, F] score tensor (the XLA lowering's
    measured overheads at 64x64 — see PERF.md).

    ``shard``: optional FrameShardingCtx — K/V all-gathered over the frame
    axis, kernel runs on the local frame shard with a global causal mask
    (parallel/flash_sharding.sharded_temporal_flash).
    """
    b, f, n, c = x.shape
    kv_src = x if kv_override is None else kv_override
    if shard is not None:
        if use_kernel and n >= 512 and c % heads == 0:
            from motioneditor_tpu.parallel.flash_sharding import (
                sharded_temporal_flash,
            )

            q = linear(params["to_q"], x)
            k = linear(params["to_k"], kv_src)
            v = linear(params["to_v"], kv_src)
            scale = (q.shape[-1] // heads) ** -0.5
            out = sharded_temporal_flash(q, k, v, scale, heads, causal, shard)
            if out is not None:
                return linear(params["to_out"], out)
        use_kernel = False
    # measured crossover (PERF.md): the kernel wins for large token counts
    # (2.1x at N=4096/C=320) but loses below N=512 where its F^2 elementwise
    # products over full C outweigh the XLA path's relayout copies
    if use_kernel and n >= 512 and c % heads == 0:
        from motioneditor_tpu.ops.temporal_flash import temporal_flash_attention

        q = linear(params["to_q"], x)
        k = linear(params["to_k"], kv_src)
        v = linear(params["to_v"], kv_src)
        scale = (q.shape[-1] // heads) ** -0.5
        out = temporal_flash_attention(q, k, v, scale, heads, causal=causal)
        return linear(params["to_out"], out)
    xt = x.transpose(0, 2, 1, 3)
    kvt = None if kv_override is None else kv_src.transpose(0, 2, 1, 3)
    out = temporal_self_attention(params, xt, heads, causal=causal, kv_override=kvt)
    return out.transpose(0, 2, 1, 3)
