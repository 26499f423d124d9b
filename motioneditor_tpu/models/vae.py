"""AutoencoderKL (SD VAE) — functional encoder/decoder, NHWC.

The reference uses the stock diffusers VAE per frame:
  encode: inference.py:262-265 (latents * 0.18215), train_bg.py:323-326
  decode: pipeline_motion_editor.py:346-355 (latents / 0.18215)

On TPU the per-frame map is just a batch reshape — frames are embarrassingly
parallel and shard cleanly over the mesh frame axis.

Architecture (SD-1.5 vae config): block_out_channels (128, 256, 512, 512),
layers_per_block=2, attention at the 64x64 bottleneck (single head),
GroupNorm(32, eps=1e-6), latent_channels=4, scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from motioneditor_tpu.models.layers import (
    conv2d,
    group_norm,
    init_conv2d,
    init_group_norm,
    init_linear,
    linear,
    silu,
    upsample_conv2d_2x,
)

SCALING_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6


def _init_vae_resnet(key, in_ch, out_ch):
    keys = jax.random.split(key, 3)
    p = {
        "norm1": init_group_norm(in_ch),
        "conv1": init_conv2d(keys[0], in_ch, out_ch, 3),
        "norm2": init_group_norm(out_ch),
        "conv2": init_conv2d(keys[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv2d(keys[2], in_ch, out_ch, 1)
    return p


def _vae_resnet(params, x, groups, eps):
    h = silu(group_norm(params["norm1"], x, groups, eps))
    h = conv2d(params["conv1"], h, padding=1)
    h = silu(group_norm(params["norm2"], h, groups, eps))
    h = conv2d(params["conv2"], h, padding=1)
    skip = x
    if "conv_shortcut" in params:
        skip = conv2d(params["conv_shortcut"], skip, padding=0)
    return skip + h


def _init_vae_attention(key, ch):
    keys = jax.random.split(key, 4)
    return {
        "group_norm": init_group_norm(ch),
        "to_q": init_linear(keys[0], ch, ch),
        "to_k": init_linear(keys[1], ch, ch),
        "to_v": init_linear(keys[2], ch, ch),
        "to_out": init_linear(keys[3], ch, ch),
    }


def _vae_attention(params, x, groups, eps):
    """Single-head spatial self-attention at the bottleneck."""
    b, h, w, c = x.shape
    n = group_norm(params["group_norm"], x, groups, eps).reshape(b, h * w, c)
    q = linear(params["to_q"], n)
    k = linear(params["to_k"], n)
    v = linear(params["to_v"], n)
    scale = c**-0.5
    scores = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkd->bqd", probs, v)
    out = linear(params["to_out"], out)
    return x + out.reshape(b, h, w, c)


def init_vae(key, config: VAEConfig = VAEConfig()):
    c = config
    keys = iter(jax.random.split(key, 128))
    enc = {
        "conv_in": init_conv2d(next(keys), c.in_channels, c.block_out_channels[0], 3),
        "down_blocks": [],
        "conv_norm_out": init_group_norm(c.block_out_channels[-1]),
        "conv_out": init_conv2d(
            next(keys), c.block_out_channels[-1], 2 * c.latent_channels, 3
        ),
    }
    out_ch = c.block_out_channels[0]
    for i, ch in enumerate(c.block_out_channels):
        in_ch = out_ch
        out_ch = ch
        block = {"resnets": []}
        for j in range(c.layers_per_block):
            block["resnets"].append(
                _init_vae_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch)
            )
        if i < len(c.block_out_channels) - 1:
            block["downsamplers"] = [init_conv2d(next(keys), out_ch, out_ch, 3)]
        enc["down_blocks"].append(block)
    enc["mid_block"] = {
        "resnets": [
            _init_vae_resnet(next(keys), out_ch, out_ch),
            _init_vae_resnet(next(keys), out_ch, out_ch),
        ],
        "attentions": [_init_vae_attention(next(keys), out_ch)],
    }

    dec = {
        "conv_in": init_conv2d(next(keys), c.latent_channels, c.block_out_channels[-1], 3),
        "up_blocks": [],
        "conv_norm_out": init_group_norm(c.block_out_channels[0]),
        "conv_out": init_conv2d(next(keys), c.block_out_channels[0], c.out_channels, 3),
    }
    dec["mid_block"] = {
        "resnets": [
            _init_vae_resnet(next(keys), c.block_out_channels[-1], c.block_out_channels[-1]),
            _init_vae_resnet(next(keys), c.block_out_channels[-1], c.block_out_channels[-1]),
        ],
        "attentions": [_init_vae_attention(next(keys), c.block_out_channels[-1])],
    }
    rev = list(reversed(c.block_out_channels))
    out_ch = rev[0]
    for i, ch in enumerate(rev):
        in_ch = out_ch
        out_ch = ch
        block = {"resnets": []}
        for j in range(c.layers_per_block + 1):
            block["resnets"].append(
                _init_vae_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch)
            )
        if i < len(rev) - 1:
            block["upsamplers"] = [init_conv2d(next(keys), out_ch, out_ch, 3)]
        dec["up_blocks"].append(block)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv2d(next(keys), 2 * c.latent_channels, 2 * c.latent_channels, 1),
        "post_quant_conv": init_conv2d(next(keys), c.latent_channels, c.latent_channels, 1),
    }


def vae_encode_moments(params, images, config: VAEConfig = VAEConfig()):
    """images: [N, H, W, 3] in [-1, 1] -> (mean, logvar) each [N, h, w, 4]."""
    c = config
    e = params["encoder"]
    x = conv2d(e["conv_in"], images, padding=1)
    for i, block in enumerate(e["down_blocks"]):
        for rp in block["resnets"]:
            x = _vae_resnet(rp, x, c.norm_num_groups, c.norm_eps)
        if "downsamplers" in block:
            # diffusers VAE downsample pads (0,1,0,1) asymmetric
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(block["downsamplers"][0], x, stride=2, padding="VALID")
    mb = e["mid_block"]
    x = _vae_resnet(mb["resnets"][0], x, c.norm_num_groups, c.norm_eps)
    x = _vae_attention(mb["attentions"][0], x, c.norm_num_groups, c.norm_eps)
    x = _vae_resnet(mb["resnets"][1], x, c.norm_num_groups, c.norm_eps)
    x = silu(group_norm(e["conv_norm_out"], x, c.norm_num_groups, c.norm_eps))
    moments = conv2d(e["conv_out"], x, padding=1)
    moments = conv2d(params["quant_conv"], moments, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode(params, images, rng=None, sample: bool = True,
               config: VAEConfig = VAEConfig()):
    """DiagonalGaussian sample (or mean) scaled by 0.18215."""
    mean, logvar = vae_encode_moments(params, images, config)
    if sample and rng is not None:
        std = jnp.exp(0.5 * logvar)
        mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * SCALING_FACTOR


def vae_decode(params, latents, config: VAEConfig = VAEConfig()):
    """latents: [N, h, w, 4] (scaled) -> images [N, H, W, 3] in [-1, 1]."""
    c = config
    d = params["decoder"]
    z = latents / SCALING_FACTOR
    z = conv2d(params["post_quant_conv"], z, padding=0)
    x = conv2d(d["conv_in"], z, padding=1)
    mb = d["mid_block"]
    x = _vae_resnet(mb["resnets"][0], x, c.norm_num_groups, c.norm_eps)
    x = _vae_attention(mb["attentions"][0], x, c.norm_num_groups, c.norm_eps)
    x = _vae_resnet(mb["resnets"][1], x, c.norm_num_groups, c.norm_eps)
    for block in d["up_blocks"]:
        for rp in block["resnets"]:
            x = _vae_resnet(rp, x, c.norm_num_groups, c.norm_eps)
        if "upsamplers" in block:
            x = upsample_conv2d_2x(block["upsamplers"][0], x)
    x = silu(group_norm(d["conv_norm_out"], x, c.norm_num_groups, c.norm_eps))
    return conv2d(d["conv_out"], x, padding=1)


def vae_encode_video(params, video, rng=None, sample=True,
                     config: VAEConfig = VAEConfig()):
    """[B, F, H, W, 3] -> [B, F, h, w, 4]; frames fold into the batch."""
    b, f = video.shape[:2]
    flat = video.reshape(b * f, *video.shape[2:])
    lat = vae_encode(params, flat, rng=rng, sample=sample, config=config)
    return lat.reshape(b, f, *lat.shape[1:])


def vae_decode_video(params, latents, config: VAEConfig = VAEConfig()):
    b, f = latents.shape[:2]
    flat = latents.reshape(b * f, *latents.shape[2:])
    img = vae_decode(params, flat, config=config)
    return img.reshape(b, f, *img.shape[1:])
