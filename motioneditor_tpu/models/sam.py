"""Functional Segment Anything (SAM) — JAX port of the reference's
box-prompted mask stage.

Re-design of data_preparation/GroundedSAM/segment_anything/segment_anything/
modeling/{image_encoder.py,prompt_encoder.py,mask_decoder.py,transformer.py}
(+ build_sam.py geometry) in the repo's functional style: param pytrees, pure
functions, static shapes (the encoder compiles once for the fixed 1024x1024
input the reference also uses). Inference-only; the video_masks pipeline
prompts SAM with ONE box per frame (video_masks.py:234-253), so the
prompt/decoder path implements the box prompt (points/mask prompts are not
used by the reference pipeline).

TPU notes: the ViT-H encoder is plain dense attention at 64x64 tokens
(global blocks) and 14x14 windows — XLA sdpa shapes; the 2x2-stride
ConvTranspose upscaling lowers to one einsum + reshape (exact, MXU-shaped).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import (
    conv2d,
    init_conv2d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280          # vit_h (build_sam.py:14-23)
    depth: int = 32
    num_heads: int = 16
    global_attn: Tuple[int, ...] = (7, 15, 23, 31)
    window: int = 14
    prompt_dim: int = 256
    mlp_ratio: float = 4.0
    mask_in_chans: int = 16
    num_multimask: int = 3
    twoway_depth: int = 2
    twoway_heads: int = 8
    twoway_mlp: int = 2048

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size


SAM_VIT_H = SAMConfig()
SAM_VIT_B = SAMConfig(embed_dim=768, depth=12, num_heads=12,
                      global_attn=(2, 5, 8, 11))

# ImageNet-scale normalization constants (build_sam.py:99-100), 0-255 input
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_vit_block(key, cfg: SAMConfig, windowed: bool):
    ks = jax.random.split(key, 4)
    d = cfg.embed_dim
    hd = d // cfg.num_heads
    size = cfg.window if windowed else cfg.grid
    return {
        "norm1": init_layer_norm(d),
        "qkv": init_linear(ks[0], d, 3 * d),
        "proj": init_linear(ks[1], d, d),
        "rel_pos_h": jnp.zeros((2 * size - 1, hd), jnp.float32),
        "rel_pos_w": jnp.zeros((2 * size - 1, hd), jnp.float32),
        "norm2": init_layer_norm(d),
        "fc1": init_linear(ks[2], d, int(d * cfg.mlp_ratio)),
        "fc2": init_linear(ks[3], int(d * cfg.mlp_ratio), d),
    }


def _init_twoway_attn(key, dim: int, internal: int):
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], dim, internal),
        "k": init_linear(ks[1], dim, internal),
        "v": init_linear(ks[2], dim, internal),
        "out": init_linear(ks[3], internal, dim),
    }


def _init_twoway_block(key, cfg: SAMConfig):
    ks = jax.random.split(key, 5)
    d = cfg.prompt_dim
    return {
        "self_attn": _init_twoway_attn(ks[0], d, d),
        "norm1": init_layer_norm(d),
        "ca_t2i": _init_twoway_attn(ks[1], d, d // 2),
        "norm2": init_layer_norm(d),
        "fc1": init_linear(ks[2], d, cfg.twoway_mlp),
        "fc2": init_linear(ks[3], cfg.twoway_mlp, d),
        "norm3": init_layer_norm(d),
        "ca_i2t": _init_twoway_attn(ks[4], d, d // 2),
        "norm4": init_layer_norm(d),
    }


def _init_mlp(key, dims):
    ks = jax.random.split(key, len(dims) - 1)
    return {"layers": [init_linear(ks[i], dims[i], dims[i + 1])
                       for i in range(len(dims) - 1)]}


def init_sam(key, cfg: SAMConfig = SAM_VIT_B):
    keys = jax.random.split(key, cfg.depth + 10)
    d, p = cfg.embed_dim, cfg.prompt_dim
    params = {
        "patch_embed": init_conv2d(keys[0], 3, d, cfg.patch_size),
        "pos_embed": jnp.zeros((cfg.grid, cfg.grid, d), jnp.float32),
        "blocks": [
            _init_vit_block(keys[1 + i], cfg, i not in cfg.global_attn)
            for i in range(cfg.depth)
        ],
        "neck_conv1": init_conv2d(keys[cfg.depth + 1], d, p, 1, bias=False),
        "neck_ln1": init_layer_norm(p),
        "neck_conv2": init_conv2d(keys[cfg.depth + 2], p, p, 3, bias=False),
        "neck_ln2": init_layer_norm(p),
        # prompt encoder (prompt_encoder.py:25-112): box corners + dense PE
        "pe_gaussian": jax.random.normal(keys[cfg.depth + 3], (2, p // 2)),
        "point_embed": 0.02
        * jax.random.normal(keys[cfg.depth + 4], (4, p), jnp.float32),
        "not_a_point": jnp.zeros((p,), jnp.float32),
        "no_mask_embed": jnp.zeros((p,), jnp.float32),
        # mask decoder
        "iou_token": 0.02 * jax.random.normal(keys[cfg.depth + 5], (1, p)),
        "mask_tokens": 0.02
        * jax.random.normal(keys[cfg.depth + 6], (cfg.num_multimask + 1, p)),
        "twoway": [
            _init_twoway_block(jax.random.fold_in(keys[cfg.depth + 7], i), cfg)
            for i in range(cfg.twoway_depth)
        ],
        "final_attn": _init_twoway_attn(keys[cfg.depth + 8], p, p // 2),
        "norm_final": init_layer_norm(p),
        "up_conv1": {  # ConvTranspose2d weights [C_in, C_out, 2, 2]
            "kernel": 0.02
            * jax.random.normal(keys[cfg.depth + 9], (p, p // 4, 2, 2)),
            "bias": jnp.zeros((p // 4,), jnp.float32),
        },
        "up_ln": init_layer_norm(p // 4),
        "up_conv2": {
            "kernel": 0.02
            * jax.random.normal(
                jax.random.fold_in(keys[cfg.depth + 9], 1), (p // 4, p // 8, 2, 2)
            ),
            "bias": jnp.zeros((p // 8,), jnp.float32),
        },
        # 3-layer MLPs (mask_decoder.py:60-70: MLP(dim, dim, dim//8, 3) and
        # MLP(dim, iou_hidden, n_tokens, 3))
        "hyper_mlps": [
            _init_mlp(jax.random.fold_in(keys[cfg.depth + 7], 100 + i),
                      (p, p, p, p // 8))
            for i in range(cfg.num_multimask + 1)
        ],
        "iou_head": _init_mlp(
            jax.random.fold_in(keys[cfg.depth + 8], 1),
            (p, 256, 256, cfg.num_multimask + 1),
        ),
    }
    return params


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------


def _rel_pos_bias(q, rel_pos_h, rel_pos_w, h: int, w: int):
    """Decomposed rel-pos (image_encoder.py:324-360) for q_size == k_size.
    q: [B_, H*W, hd]. Returns additive bias [B_, H*W, H*W]."""
    idx = np.arange(h)[:, None] - np.arange(h)[None, :] + (h - 1)
    rh = rel_pos_h[idx]  # [h, h, hd]
    idx = np.arange(w)[:, None] - np.arange(w)[None, :] + (w - 1)
    rw = rel_pos_w[idx]  # [w, w, hd]
    rq = q.reshape(-1, h, w, q.shape[-1])
    rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    bias = rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]  # [B_, h, w, h, w]
    return bias.reshape(-1, h * w, h * w)


def _vit_attention(p, x, heads: int, h: int, w: int):
    """x: [B_, h, w, C] -> same. Global dense attention + decomposed rel pos
    (image_encoder.py:186-240)."""
    b_, _, _, c = x.shape
    hd = c // heads
    n = h * w
    qkv = linear(p["qkv"], x.reshape(b_, n, c)).reshape(b_, n, 3, heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, b_ * heads, n, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bqd,bkd->bqk", q * (hd**-0.5), k,
                   preferred_element_type=jnp.float32)
    s = s + _rel_pos_bias(q, p["rel_pos_h"], p["rel_pos_w"], h, w)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkd->bqd", probs, v)
    out = out.reshape(b_, heads, n, hd).transpose(0, 2, 1, 3).reshape(b_, h, w, c)
    return linear(p["proj"], out)


def _vit_block(p, x, cfg: SAMConfig, window: int):
    b, h, w, c = x.shape
    shortcut = x
    x = layer_norm(p["norm1"], x, eps=1e-6)
    if window > 0:
        ph = (window - h % window) % window
        pw = (window - w % window) % window
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        x = x.reshape(b, hp // window, window, wp // window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
        x = _vit_attention(p, x, cfg.num_heads, window, window)
        x = x.reshape(b, hp // window, wp // window, window, window, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)[:, :h, :w]
    else:
        x = _vit_attention(p, x, cfg.num_heads, h, w)
    x = shortcut + x
    y = layer_norm(p["norm2"], x, eps=1e-6)
    y = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], y), approximate=False))
    return x + y


def sam_encode_image(params, image, cfg: SAMConfig = SAM_VIT_B):
    """image: [B, img_size, img_size, 3], already (x - mean) / std.
    Returns [B, grid, grid, prompt_dim]."""
    x = conv2d(params["patch_embed"], image, stride=cfg.patch_size,
               padding="VALID")
    x = x + params["pos_embed"][None]
    for i, blk in enumerate(params["blocks"]):
        x = _vit_block(blk, x, cfg, 0 if i in cfg.global_attn else cfg.window)
    x = conv2d(params["neck_conv1"], x, padding="VALID")
    x = layer_norm(params["neck_ln1"], x, eps=1e-6)
    x = conv2d(params["neck_conv2"], x, padding="SAME")
    return layer_norm(params["neck_ln2"], x, eps=1e-6)


# ---------------------------------------------------------------------------
# prompt encoder (box prompts) + dense PE
# ---------------------------------------------------------------------------


def _pe_encode(gaussian, coords01):
    """[..., 2] in [0,1] -> [..., prompt_dim] (prompt_encoder.py:185-192)."""
    c = (2.0 * coords01 - 1.0) @ gaussian * (2.0 * math.pi)
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def sam_dense_pe(params, cfg: SAMConfig = SAM_VIT_B):
    """[grid, grid, prompt_dim] positional encoding of the embedding grid."""
    g = cfg.grid
    ys = (np.arange(g, dtype=np.float32) + 0.5) / g
    xs = (np.arange(g, dtype=np.float32) + 0.5) / g
    grid = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1)  # [g, g, 2] (x, y)
    return _pe_encode(params["pe_gaussian"], jnp.asarray(grid))


def sam_embed_boxes(params, boxes, cfg: SAMConfig = SAM_VIT_B):
    """boxes: [B, 4] xyxy in input-image pixels -> sparse embeddings
    [B, 2, prompt_dim] (prompt_encoder.py:133-141)."""
    size = cfg.img_size
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / size
    emb = _pe_encode(params["pe_gaussian"], corners)
    offs = jnp.stack([params["point_embed"][2], params["point_embed"][3]])
    return emb + offs[None]


# ---------------------------------------------------------------------------
# mask decoder
# ---------------------------------------------------------------------------


def _twoway_attention(p, q_in, k_in, v_in, heads: int):
    q = linear(p["q"], q_in)
    k = linear(p["k"], k_in)
    v = linear(p["v"], v_in)
    b, n, c = q.shape
    hd = c // heads

    def split(y):
        return y.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhqd,bhkd->bhqk", split(q) * (hd**-0.5), split(k),
                   preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return linear(p["out"], out)


def _conv_transpose_2x2(p, x):
    """Exact torch ConvTranspose2d(k=2, s=2): each input pixel emits a 2x2
    block. weight [C_in, C_out, 2, 2]."""
    y = jnp.einsum("bhwc,coij->bhiwjo", x, p["kernel"])
    b, h, _, w, _, o = y.shape
    return y.reshape(b, h * 2, w * 2, o) + p["bias"]


def sam_decode_masks(params, image_emb, boxes, cfg: SAMConfig = SAM_VIT_B,
                     multimask: bool = False):
    """image_emb [1, grid, grid, prompt_dim]; boxes [B, 4] xyxy input px.
    Returns (mask logits [B, n_masks, 4*grid, 4*grid], iou [B, n_masks]) —
    mask_decoder.py:112-149 + transformer.py:62-107."""
    g, p = cfg.grid, cfg.prompt_dim
    sparse = sam_embed_boxes(params, boxes, cfg)  # [B, 2, p]
    b = sparse.shape[0]
    out_tokens = jnp.concatenate([params["iou_token"], params["mask_tokens"]], 0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens[None], (b,) + out_tokens.shape), sparse], 1
    )
    src = jnp.broadcast_to(image_emb, (b, g, g, p)) + params["no_mask_embed"]
    pe = jnp.broadcast_to(sam_dense_pe(params, cfg)[None], (b, g, g, p))
    keys = src.reshape(b, g * g, p)
    key_pe = pe.reshape(b, g * g, p)

    queries = tokens
    for i, blk in enumerate(params["twoway"]):
        if i == 0:  # skip_first_layer_pe (transformer.py:151-157)
            queries = _twoway_attention(
                blk["self_attn"], queries, queries, queries, cfg.twoway_heads
            )
        else:
            q = queries + tokens
            queries = queries + _twoway_attention(
                blk["self_attn"], q, q, queries, cfg.twoway_heads
            )
        queries = layer_norm(blk["norm1"], queries)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _twoway_attention(
            blk["ca_t2i"], q, k, keys, cfg.twoway_heads
        )
        queries = layer_norm(blk["norm2"], queries)
        y = linear(blk["fc2"], jax.nn.relu(linear(blk["fc1"], queries)))
        queries = layer_norm(blk["norm3"], queries + y)
        q = queries + tokens
        keys = keys + _twoway_attention(
            blk["ca_i2t"], k, q, queries, cfg.twoway_heads
        )
        keys = layer_norm(blk["norm4"], keys)

    q = queries + tokens
    k = keys + key_pe
    queries = queries + _twoway_attention(
        params["final_attn"], q, k, keys, cfg.twoway_heads
    )
    queries = layer_norm(params["norm_final"], queries)

    iou_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + cfg.num_multimask + 1]

    up = _conv_transpose_2x2(params["up_conv1"], keys.reshape(b, g, g, p))
    up = jax.nn.gelu(layer_norm(params["up_ln"], up, eps=1e-6),
                     approximate=False)
    up = jax.nn.gelu(_conv_transpose_2x2(params["up_conv2"], up),
                     approximate=False)  # [B, 4g, 4g, p//8]
    hyper = jnp.stack(
        [
            _mlp(params["hyper_mlps"][i], mask_tokens_out[:, i])
            for i in range(cfg.num_multimask + 1)
        ],
        axis=1,
    )  # [B, n_tokens, p//8]
    masks = jnp.einsum("btc,bhwc->bthw", hyper, up)
    iou = _mlp(params["iou_head"], iou_out)
    if multimask:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]


def _mlp(p, x):
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# end-to-end predictor (SamPredictor box path, predictor.py:17-262)
# ---------------------------------------------------------------------------


def sam_preprocess(image_np: np.ndarray, cfg: SAMConfig = SAM_VIT_B):
    """uint8 HWC image -> (padded normalized [1, S, S, 3], resized (h, w)).
    Longest side -> img_size, pad bottom/right (predictor.py:53-95)."""
    from PIL import Image

    h0, w0 = image_np.shape[:2]
    scale = cfg.img_size / max(h0, w0)
    nh, nw = int(h0 * scale + 0.5), int(w0 * scale + 0.5)
    im = Image.fromarray(image_np).resize((nw, nh), Image.BILINEAR)
    x = (np.asarray(im, np.float32) - PIXEL_MEAN) / PIXEL_STD
    pad = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
    pad[:nh, :nw] = x
    return jnp.asarray(pad)[None], (nh, nw)


def sam_predict_box(params, image_np: np.ndarray, box_xyxy,
                    cfg: SAMConfig = SAM_VIT_B):
    """Full box-prompted prediction on one image. Returns a bool mask at the
    original resolution (threshold 0.0, predictor.py:160-176)."""
    x, (nh, nw) = sam_preprocess(image_np, cfg)
    h0, w0 = image_np.shape[:2]
    scale = cfg.img_size / max(h0, w0)
    box = jnp.asarray(np.asarray(box_xyxy, np.float32) * scale)[None]
    emb = jax.jit(sam_encode_image, static_argnames=("cfg",))(params, x, cfg=cfg)
    masks, _ = jax.jit(sam_decode_masks, static_argnames=("cfg", "multimask"))(
        params, emb, box, cfg=cfg
    )
    m = np.asarray(
        jax.image.resize(masks[0, 0], (cfg.img_size, cfg.img_size), "bilinear")
    )[:nh, :nw]
    m = np.asarray(
        jax.image.resize(jnp.asarray(m), (h0, w0), "bilinear")
    )
    return m > 0.0


# ---------------------------------------------------------------------------
# checkpoint mapping (official sam_vit_*.pth)
# ---------------------------------------------------------------------------


def map_sam_state_dict(sd, cfg: SAMConfig = SAM_VIT_H):
    """Official SAM state_dict (numpy values) -> init_sam pytree."""

    def t(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def a(k):
        return jnp.asarray(np.asarray(sd[k]))

    def lin(prefix):
        p = {"kernel": t(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            p["bias"] = a(f"{prefix}.bias")
        return p

    def ln(prefix):
        return {"scale": a(f"{prefix}.weight"), "bias": a(f"{prefix}.bias")}

    def conv(prefix, bias=True):
        p = {"kernel": jnp.asarray(
            np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = a(f"{prefix}.bias")
        return p

    def attn(prefix):
        return {
            "q": lin(f"{prefix}.q_proj"),
            "k": lin(f"{prefix}.k_proj"),
            "v": lin(f"{prefix}.v_proj"),
            "out": lin(f"{prefix}.out_proj"),
        }

    def mlp(prefix, n):
        return {"layers": [lin(f"{prefix}.layers.{i}") for i in range(n)]}

    params = {
        "patch_embed": conv("image_encoder.patch_embed.proj"),
        "pos_embed": a("image_encoder.pos_embed")[0],
        "blocks": [
            {
                "norm1": ln(f"image_encoder.blocks.{i}.norm1"),
                "qkv": lin(f"image_encoder.blocks.{i}.attn.qkv"),
                "proj": lin(f"image_encoder.blocks.{i}.attn.proj"),
                "rel_pos_h": a(f"image_encoder.blocks.{i}.attn.rel_pos_h"),
                "rel_pos_w": a(f"image_encoder.blocks.{i}.attn.rel_pos_w"),
                "norm2": ln(f"image_encoder.blocks.{i}.norm2"),
                "fc1": lin(f"image_encoder.blocks.{i}.mlp.lin1"),
                "fc2": lin(f"image_encoder.blocks.{i}.mlp.lin2"),
            }
            for i in range(cfg.depth)
        ],
        "neck_conv1": conv("image_encoder.neck.0", bias=False),
        "neck_ln1": ln("image_encoder.neck.1"),
        "neck_conv2": conv("image_encoder.neck.2", bias=False),
        "neck_ln2": ln("image_encoder.neck.3"),
        "pe_gaussian": a("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
        "point_embed": jnp.concatenate(
            [a(f"prompt_encoder.point_embeddings.{i}.weight") for i in range(4)], 0
        ),
        "not_a_point": a("prompt_encoder.not_a_point_embed.weight")[0],
        "no_mask_embed": a("prompt_encoder.no_mask_embed.weight")[0],
        "iou_token": a("mask_decoder.iou_token.weight"),
        "mask_tokens": a("mask_decoder.mask_tokens.weight"),
        "twoway": [
            {
                "self_attn": attn(f"mask_decoder.transformer.layers.{i}.self_attn"),
                "norm1": ln(f"mask_decoder.transformer.layers.{i}.norm1"),
                "ca_t2i": attn(
                    f"mask_decoder.transformer.layers.{i}.cross_attn_token_to_image"
                ),
                "norm2": ln(f"mask_decoder.transformer.layers.{i}.norm2"),
                "fc1": lin(f"mask_decoder.transformer.layers.{i}.mlp.lin1"),
                "fc2": lin(f"mask_decoder.transformer.layers.{i}.mlp.lin2"),
                "norm3": ln(f"mask_decoder.transformer.layers.{i}.norm3"),
                "ca_i2t": attn(
                    f"mask_decoder.transformer.layers.{i}.cross_attn_image_to_token"
                ),
                "norm4": ln(f"mask_decoder.transformer.layers.{i}.norm4"),
            }
            for i in range(cfg.twoway_depth)
        ],
        "final_attn": attn("mask_decoder.transformer.final_attn_token_to_image"),
        "norm_final": ln("mask_decoder.transformer.norm_final_attn"),
        "up_conv1": {
            "kernel": a("mask_decoder.output_upscaling.0.weight"),
            "bias": a("mask_decoder.output_upscaling.0.bias"),
        },
        "up_ln": ln("mask_decoder.output_upscaling.1"),
        "up_conv2": {
            "kernel": a("mask_decoder.output_upscaling.3.weight"),
            "bias": a("mask_decoder.output_upscaling.3.bias"),
        },
        "hyper_mlps": [
            mlp(f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
            for i in range(cfg.num_multimask + 1)
        ],
        "iou_head": mlp("mask_decoder.iou_prediction_head", 3),
    }
    return params


def load_sam_checkpoint(path: str, cfg: SAMConfig = SAM_VIT_H):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return map_sam_state_dict(sd, cfg)
