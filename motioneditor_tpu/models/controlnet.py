"""ControlNet (openpose) — 2D per-frame conditioning network.

Functional port of diffusers ControlNetModel as the reference uses it
(loaded at inference.py:156, driven per-frame at
pipeline_motion_editor.py:613-625 and train_adaptor.py:347-371): the SD UNet
encoder + zero-conv output heads + a conditioning embedding CNN.

Shares the video block functions from models/unet.py; ControlNet parameter
dicts simply omit the temporal modules (video=False), which makes the blocks
exact 2D per-frame computations.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from motioneditor_tpu.models.layers import (
    conv2d,
    init_conv2d,
    init_group_norm,
    init_timestep_embedding_mlp,
    silu,
    sinusoidal_timestep_embedding,
    timestep_embedding_mlp,
)
from motioneditor_tpu.models.unet import (
    AttnContext,
    UNetConfig,
    _init_resnet,
    _init_transformer2d,
    resnet_block,
    transformer2d,
)
from motioneditor_tpu.ops.attention import NORMAL

COND_EMBED_CHANNELS = (16, 32, 96, 256)


def controlnet_config() -> UNetConfig:
    return UNetConfig(video=False, use_sc_attn=False, use_st_attn=False)


def init_controlnet(key, config: UNetConfig | None = None):
    c = config or controlnet_config()
    keys = iter(jax.random.split(key, 128))
    time_dim = c.block_out_channels[0] * 4
    params = {
        "conv_in": init_conv2d(next(keys), c.in_channels, c.block_out_channels[0], 3),
        "time_embedding": init_timestep_embedding_mlp(
            next(keys), c.block_out_channels[0], time_dim
        ),
        "down_blocks": [],
    }

    # conditioning embedding CNN (diffusers ControlNetConditioningEmbedding)
    emb = {"conv_in": init_conv2d(next(keys), 3, COND_EMBED_CHANNELS[0], 3), "blocks": []}
    for i in range(len(COND_EMBED_CHANNELS) - 1):
        ch_in, ch_out = COND_EMBED_CHANNELS[i], COND_EMBED_CHANNELS[i + 1]
        emb["blocks"].append(init_conv2d(next(keys), ch_in, ch_in, 3))
        emb["blocks"].append(init_conv2d(next(keys), ch_in, ch_out, 3))
    emb["conv_out"] = init_conv2d(
        next(keys), COND_EMBED_CHANNELS[-1], c.block_out_channels[0], 3, zero_init=True
    )
    params["controlnet_cond_embedding"] = emb

    out_ch = c.block_out_channels[0]
    zero_convs = [init_conv2d(next(keys), out_ch, out_ch, 1, zero_init=True)]
    for i, btype in enumerate(c.down_block_types):
        in_ch = out_ch
        out_ch = c.block_out_channels[i]
        is_final = i == len(c.block_out_channels) - 1
        block = {"resnets": [], "attentions": []}
        for j in range(c.layers_per_block):
            r_in = in_ch if j == 0 else out_ch
            block["resnets"].append(
                _init_resnet(next(keys), r_in, out_ch, time_dim, video=False)
            )
            zero_convs.append(init_conv2d(next(keys), out_ch, out_ch, 1, zero_init=True))
            if btype == "CrossAttnDownBlock2D":
                block["attentions"].append(
                    _init_transformer2d(
                        next(keys), out_ch, c.cross_attention_dim, c.attention_heads,
                        video=False,
                    )
                )
        if not is_final:
            block["downsamplers"] = [init_conv2d(next(keys), out_ch, out_ch, 3)]
            zero_convs.append(init_conv2d(next(keys), out_ch, out_ch, 1, zero_init=True))
        params["down_blocks"].append(block)

    mid_ch = c.block_out_channels[-1]
    params["mid_block"] = {
        "resnets": [
            _init_resnet(next(keys), mid_ch, mid_ch, time_dim, video=False),
            _init_resnet(next(keys), mid_ch, mid_ch, time_dim, video=False),
        ],
        "attentions": [
            _init_transformer2d(
                next(keys), mid_ch, c.cross_attention_dim, c.attention_heads, video=False
            )
        ],
    }
    params["controlnet_down_blocks"] = zero_convs
    params["controlnet_mid_block"] = init_conv2d(
        next(keys), mid_ch, mid_ch, 1, zero_init=True
    )
    return params


def _cond_embedding(params, image):
    """image: [N, H, W, 3] in [0,1] -> [N, H/8, W/8, 320]."""
    x = silu(conv2d(params["conv_in"], image, padding=1))
    for i, bp in enumerate(params["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        x = silu(conv2d(bp, x, stride=stride, padding=1))
    return conv2d(params["conv_out"], x, padding=1)


def precompute_cond_embedding(params, controlnet_cond: jnp.ndarray) -> jnp.ndarray:
    """Embed the conditioning image once: it is constant across all denoise
    steps (the reference recomputes this 512x512 conv stack every step,
    pipeline_motion_editor.py:618-625 — hoisting it out of the scan removes
    that work entirely).

    controlnet_cond: [B, F, H, W, 3] in [0,1] -> [B, F, H/8, W/8, 320].
    """
    b, f = controlnet_cond.shape[:2]
    emb = _cond_embedding(
        params["controlnet_cond_embedding"],
        controlnet_cond.reshape(b * f, *controlnet_cond.shape[2:]),
    )
    return emb.reshape(b, f, *emb.shape[1:])


def controlnet_apply(
    params,
    config: UNetConfig,
    sample: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    controlnet_cond: jnp.ndarray = None,
    conditioning_scale: float = 1.0,
    use_flash: bool = True,
    cond_embedding: jnp.ndarray = None,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Run ControlNet per-frame.

    sample: [B, F, h, w, 4] latents; controlnet_cond: [B, F, H, W, 3] skeleton
    images in [0,1] (or pass ``cond_embedding`` precomputed by
    ``precompute_cond_embedding``); encoder_hidden_states: [B, L, 768].
    Returns (12 down residuals, mid residual) as video tensors [B, F, ...].
    """
    c = config
    b, f = sample.shape[:2]
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (b,))
    t_emb = sinusoidal_timestep_embedding(timesteps, c.block_out_channels[0])
    temb = timestep_embedding_mlp(params["time_embedding"], t_emb.astype(sample.dtype))

    ctx = AttnContext(
        encoder_hidden_states=encoder_hidden_states,
        heads=c.attention_heads,
        attn1_mode=NORMAL,
        use_flash=use_flash,
    )

    from motioneditor_tpu.models.layers import inflated_conv3d

    h = inflated_conv3d(params["conv_in"], sample, padding=1)
    if cond_embedding is None:
        cond_embedding = precompute_cond_embedding(params, controlnet_cond)
    h = h + cond_embedding.reshape(h.shape)

    res_samples = [h]
    layer_idx = 0
    for i, block in enumerate(params["down_blocks"]):
        btype = c.down_block_types[i]
        for j, rp in enumerate(block["resnets"]):
            h = resnet_block(rp, h, temb, groups=c.norm_num_groups, eps=c.norm_eps,
                             per_frame_gn=True)
            if btype == "CrossAttnDownBlock2D":
                h = transformer2d(
                    block["attentions"][j], h, ctx, layer_idx, NORMAL,
                    groups=c.norm_num_groups, eps=c.transformer_norm_eps,
                )
                layer_idx += 1
            res_samples.append(h)
        if "downsamplers" in block:
            bb, ff_, hh, ww, cc = h.shape
            h2 = conv2d(block["downsamplers"][0], h.reshape(bb * ff_, hh, ww, cc),
                        stride=2, padding=1)
            h = h2.reshape(bb, ff_, *h2.shape[1:])
            res_samples.append(h)

    mb = params["mid_block"]
    h = resnet_block(mb["resnets"][0], h, temb, groups=c.norm_num_groups,
                     eps=c.norm_eps, per_frame_gn=True)
    h = transformer2d(
        mb["attentions"][0], h, ctx, layer_idx, NORMAL,
        groups=c.norm_num_groups, eps=c.transformer_norm_eps,
    )
    h = resnet_block(mb["resnets"][1], h, temb, groups=c.norm_num_groups,
                     eps=c.norm_eps, per_frame_gn=True)

    down_out = []
    for r, zc in zip(res_samples, params["controlnet_down_blocks"]):
        bb, ff_, hh, ww, cc = r.shape
        z = conv2d(zc, r.reshape(bb * ff_, hh, ww, cc), padding=0)
        down_out.append(z.reshape(bb, ff_, hh, ww, cc) * conditioning_scale)
    bb, ff_, hh, ww, cc = h.shape
    mid_out = (
        conv2d(params["controlnet_mid_block"], h.reshape(bb * ff_, hh, ww, cc), padding=0)
        .reshape(bb, ff_, hh, ww, cc)
        * conditioning_scale
    )
    return down_out, mid_out
