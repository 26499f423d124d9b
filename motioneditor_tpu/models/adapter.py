"""Content-aware motion ControlAdapter — the paper's core novelty.

Port of motion_editor/models/controlnet_adapter.py:411-566. Twelve blocks
(4 channel stages x nums_rb=3, channels chosen by flat block index:
idx<=3 -> 320, 3<idx<=6 -> 640, else 1280, :443-448) consume the 12
ControlNet down-residuals; each block blends

  conv branch:  zero-init TemporalConv(k3) -> ReLU -> zero-init
                TemporalConv(k1) + input skip           (:503-510)
  attn branch:  sparse-causal self-attn (K/V=[frame0, prev], :332-407)
                -> cross-attn to source UNet features    (:516-519)
                -> GEGLU FF                              (:520)
                -> causal temporal self-attn, zero-init out (:485-494, :525-527)

and returns conv + attn (:532). The live config is ksize=1, sk=True
(unet_2d_condition.py:292), so there is no skep conv.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from motioneditor_tpu.models.layers import (
    feed_forward,
    init_feed_forward,
    init_layer_norm,
    init_temporal_conv,
    layer_norm,
    temporal_conv,
)
from motioneditor_tpu.ops.attention import (
    SPARSE_CAUSAL,
    cross_attention,
    init_attention,
    spatial_self_attention,
    temporal_self_attention_video,
)

ADAPTER_HEADS = 8
NUM_ADAPTER_BLOCKS = 12

SD15_BLOCK_CHANNELS = (320, 640, 1280, 1280)


def adapter_block_channels(
    idx: int, block_out_channels: Tuple[int, ...] = SD15_BLOCK_CHANNELS
) -> int:
    """Flat-index -> channel map (controlnet_adapter.py:443-448). Matches the
    channel layout of the UNet's 12 down res-samples:
    [c0 x4, c1 x3, c2 x3, c3 x2] with c2 == c3 in SD-1.5."""
    c0, c1, c2, c3 = block_out_channels
    if idx <= 3:
        return c0
    if idx <= 6:
        return c1
    if idx <= 9:
        return c2
    return c3


def init_adapter_block(key, idx: int, block_out_channels=SD15_BLOCK_CHANNELS):
    ch = adapter_block_channels(idx, block_out_channels)
    keys = jax.random.split(key, 8)
    return {
        "block1": init_temporal_conv(keys[0], ch, kernel_size=3),
        "block2": init_temporal_conv(keys[1], ch, kernel_size=1),
        "norm_temp": init_layer_norm(ch),
        "attn_temp": init_attention(keys[2], ch, cross_dim=ch, heads=ADAPTER_HEADS),
        "cross_pose_norm": init_layer_norm(ch),
        "attn_pose": init_attention(keys[3], ch, cross_dim=ch, heads=ADAPTER_HEADS),
        "ff_norm": init_layer_norm(ch),
        "ff": init_feed_forward(keys[4], ch),
        "norm_self_temp": init_layer_norm(ch),
        "attn_self_temp": init_attention(keys[5], ch, heads=ADAPTER_HEADS, zero_out=True),
    }


def init_control_adapter(key, block_out_channels=SD15_BLOCK_CHANNELS):
    keys = jax.random.split(key, NUM_ADAPTER_BLOCKS)
    return {
        "body": [
            init_adapter_block(keys[i], i, block_out_channels)
            for i in range(NUM_ADAPTER_BLOCKS)
        ]
    }


def adapter_block_apply(params, x, source_hidden, use_flash: bool = True,
                        shard=None):
    """x, source_hidden: [B, F, h, w, C] (ControlNet residual / UNet feature).

    Mirrors ResnetBlock.forward (controlnet_adapter.py:497-534).
    """
    b, f, h, w, c = x.shape

    # conv branch (zero-init at start: identity)
    conv = temporal_conv(params["block1"], x)
    conv = jax.nn.relu(conv)
    conv = temporal_conv(params["block2"], conv, padding="VALID")
    conv = conv + x  # skep is None in the live config (sk=True)

    # attention branch on tokens
    tokens = x.reshape(b, f, h * w, c)
    n = layer_norm(params["norm_temp"], tokens)
    tokens = tokens + spatial_self_attention(
        params["attn_temp"], n, SPARSE_CAUSAL, ADAPTER_HEADS, use_flash=use_flash,
        shard=shard,
    )

    src_tokens = source_hidden.reshape(b, f, h * w, c)
    n = layer_norm(params["cross_pose_norm"], tokens)
    # cross-attn per frame: query = adapter tokens, K/V = source UNet feature
    # tokens of the same frame (controlnet_adapter.py:516-519 flattens (b f)).
    tokens = tokens + _per_frame_cross_attention(
        params["attn_pose"], n, src_tokens, use_flash=use_flash, shard=shard
    )

    tokens = tokens + feed_forward(params["ff"], layer_norm(params["ff_norm"], tokens))

    nt = layer_norm(params["norm_self_temp"], tokens)
    tokens = tokens + temporal_self_attention_video(
        params["attn_self_temp"], nt, ADAPTER_HEADS, causal=True,
        use_kernel=use_flash, shard=shard,
    )

    attn = tokens.reshape(b, f, h, w, c)
    return attn + conv


def _per_frame_cross_attention(params, q_tokens, kv_tokens, use_flash: bool,
                               shard=None):
    """Cross attention where both sides are per-frame token tensors
    [B, F, N, C]; each frame attends to the matching source frame."""
    from motioneditor_tpu.models.layers import linear
    from motioneditor_tpu.ops.attention import merge_heads, sdpa, split_heads

    q = linear(params["to_q"], q_tokens)
    k = linear(params["to_k"], kv_tokens)
    v = linear(params["to_v"], kv_tokens)
    heads = ADAPTER_HEADS
    inner = q.shape[-1]
    n = q.shape[-2]
    scale = (inner // heads) ** -0.5

    if shard is not None:
        if use_flash and n >= 1024:
            # per-frame cross attention is frame-local: the sharded wrapper
            # in mode=normal runs the kernel on each frame shard, no comm
            from motioneditor_tpu.parallel.flash_sharding import (
                sharded_spatial_flash,
            )

            out = sharded_spatial_flash(q, k, v, "normal", scale, heads, shard)
            if out is not None:
                return linear(params["to_out"], out)
        use_flash = False
    elif use_flash and n >= 1024:
        from motioneditor_tpu.ops.video_flash import (
            video_flash_attention,
            video_flash_supported,
        )

        if video_flash_supported(n, inner, heads, q.dtype.itemsize):
            # packed-head kernel, mode=normal: each frame attends to the
            # matching source frame with no head-split relayouts in HBM
            out = video_flash_attention(q, k, v, "normal", scale, heads)
            return linear(params["to_out"], out)

    out = sdpa(
        split_heads(q, heads),
        split_heads(k, heads),
        split_heads(v, heads),
        scale,
        use_flash=use_flash,
    )
    return linear(params["to_out"], merge_heads(out))


def control_adapter_apply(
    params,
    x_list: Sequence[jnp.ndarray],
    source_hidden_states: Sequence[jnp.ndarray],
    use_flash: bool = True,
    shard=None,
) -> List[jnp.ndarray]:
    """Adapt the 12 ControlNet residuals (controlnet_adapter.py:554-565)."""
    assert len(x_list) == NUM_ADAPTER_BLOCKS
    assert len(source_hidden_states) == NUM_ADAPTER_BLOCKS
    return [
        adapter_block_apply(
            params["body"][i], x_list[i], source_hidden_states[i], use_flash,
            shard=shard,
        )
        for i in range(NUM_ADAPTER_BLOCKS)
    ]
