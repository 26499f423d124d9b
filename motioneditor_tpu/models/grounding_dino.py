"""Functional GroundingDINO (JAX) — open-vocabulary detector used by the
reference's mask-preparation stage.

Re-design of data_preparation/GroundedSAM/GroundingDINO/groundingdino/models/
GroundingDINO/{groundingdino.py:363-546, transformer.py:40-960,
fuse_modules.py:216-400, bertwarper.py:224-273, utils.py:22-268} in the repo's
functional style: param pytrees + pure functions, inference-only, static
shapes (one jit per image resolution / text length).

TPU-first simplifications vs the torch original:
  - No NestedTensor/padding machinery: this is a batch-1 host-side prep stage;
    valid_ratios are 1 and key-padding masks vanish (text padding is still
    honored via the token mask). The torch code's mask plumbing exists only
    to batch variable-size images.
  - Deformable attention runs on the fused-XLA gather kernel
    (ops/ms_deform_attn.py — the JAX equivalent of the reference's only
    first-party CUDA kernel, oracle-tested in tests/test_prep.py).
  - torch MultiheadAttention == ops.attention-style sdpa with packed qkv.
  - use_checkpoint / dropout / droppath are training-only; omitted.

Text encoding: a first-party functional BERT encoder (bert-base-uncased
geometry) consuming the special-token-segmented self-attention mask and
position ids exactly like bertwarper.generate_masks_with_special_tokens_and_
transfer_map (re-implemented host-side in ``build_text_masks``).

Config: GroundingDINO_SwinB.cfg.py / GroundingDINO_SwinT_OGC.py (two_stage
"standard", 6 enc / 6 dec layers, 900 queries, 4 levels, text cross-attention
on).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

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
from motioneditor_tpu.models.swin import (
    SWIN_B_384,
    SWIN_T,
    SwinConfig,
    init_swin,
    swin_apply,
)
from motioneditor_tpu.ops.ms_deform_attn import ms_deform_attn


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class GroundingDINOConfig:
    d_model: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    text_ffn_dim: int = 1024  # text enhance layer FFN (transformer.py:136)
    num_queries: int = 900
    num_levels: int = 4
    num_points: int = 4
    max_text_len: int = 256
    pe_temperature: float = 20.0  # pe_temperatureH/W in the configs
    swin: SwinConfig = SWIN_T
    bert: BertConfig = BertConfig()

    @property
    def head_dim(self) -> int:
        return self.d_model // self.nheads


GDINO_SWINT = GroundingDINOConfig()
GDINO_SWINB = GroundingDINOConfig(swin=SWIN_B_384)


# ---------------------------------------------------------------------------
# host-side text mask construction (bertwarper.py:224-273)
# ---------------------------------------------------------------------------


def build_text_masks(input_ids: np.ndarray, special_ids: Sequence[int]):
    """Per-phrase block-diagonal self-attention masks + restart position ids.

    input_ids: [B, N] numpy. Returns (self_attn_mask [B, N, N] bool,
    position_ids [B, N] int32) — tokens attend only within their own
    '.'-separated phrase, and position ids restart per phrase, exactly like
    generate_masks_with_special_tokens_and_transfer_map."""
    input_ids = np.asarray(input_ids)
    bs, n = input_ids.shape
    special = np.zeros((bs, n), bool)
    for sid in special_ids:
        special |= input_ids == sid

    attn = np.tile(np.eye(n, dtype=bool)[None], (bs, 1, 1))
    pos = np.zeros((bs, n), np.int64)
    for row in range(bs):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                pos[row, col] = 0
            else:
                attn[row, prev + 1 : col + 1, prev + 1 : col + 1] = True
                pos[row, prev + 1 : col + 1] = np.arange(0, col - prev)
            prev = col
    return attn, pos.astype(np.int32)


# ---------------------------------------------------------------------------
# functional BERT encoder (bert-base-uncased geometry)
# ---------------------------------------------------------------------------


def init_bert(key, cfg: BertConfig = BertConfig()):
    keys = jax.random.split(key, cfg.layers + 4)
    std = 0.02

    def emb(k, shape):
        return std * jax.random.normal(k, shape, jnp.float32)

    params = {
        "word_emb": emb(keys[0], (cfg.vocab_size, cfg.hidden)),
        "pos_emb": emb(keys[1], (cfg.max_position, cfg.hidden)),
        "type_emb": emb(keys[2], (cfg.type_vocab, cfg.hidden)),
        "emb_norm": init_layer_norm(cfg.hidden),
        "layers": [],
    }
    for i in range(cfg.layers):
        lk = jax.random.split(keys[3 + i], 6)
        params["layers"].append(
            {
                "q": init_linear(lk[0], cfg.hidden, cfg.hidden),
                "k": init_linear(lk[1], cfg.hidden, cfg.hidden),
                "v": init_linear(lk[2], cfg.hidden, cfg.hidden),
                "attn_out": init_linear(lk[3], cfg.hidden, cfg.hidden),
                "attn_norm": init_layer_norm(cfg.hidden),
                "fc1": init_linear(lk[4], cfg.hidden, cfg.intermediate),
                "fc2": init_linear(lk[5], cfg.intermediate, cfg.hidden),
                "out_norm": init_layer_norm(cfg.hidden),
            }
        )
    return params


def bert_apply(params, input_ids, attn_mask, position_ids,
               cfg: BertConfig = BertConfig()):
    """input_ids [B, N] int32; attn_mask [B, N, N] bool (True = attend);
    position_ids [B, N]. Returns last hidden state [B, N, hidden]."""
    x = (
        params["word_emb"][input_ids]
        + params["pos_emb"][position_ids]
        + params["type_emb"][jnp.zeros_like(input_ids)]
    )
    x = layer_norm(params["emb_norm"], x, eps=cfg.eps)
    bias = jnp.where(attn_mask[:, None], 0.0, -1e4)  # [B, 1, N, N]
    d = cfg.hidden // cfg.heads

    def split(y):
        b, n, _ = y.shape
        return y.reshape(b, n, cfg.heads, d).transpose(0, 2, 1, 3)

    for p in params["layers"]:
        q, k, v = split(linear(p["q"], x)), split(linear(p["k"], x)), split(
            linear(p["v"], x)
        )
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
        ) + bias
        probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
        o = linear(p["attn_out"], o.reshape(x.shape))
        x = layer_norm(p["attn_norm"], x + o, eps=cfg.eps)
        y = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=False))
        x = layer_norm(p["out_norm"], x + y, eps=cfg.eps)
    return x


# ---------------------------------------------------------------------------
# shared attention / MLP primitives
# ---------------------------------------------------------------------------


def _mha(p, q_in, k_in, v_in, heads: int, bias=None):
    """torch nn.MultiheadAttention equivalent: packed qkv projections.
    q_in/k_in/v_in: [B, N*, C]; bias: additive [B or 1, 1, Nq, Nk] or None."""
    c = q_in.shape[-1]
    d = c // heads

    def split(y):
        b, n, _ = y.shape
        return y.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    q = split(linear(p["q"], q_in))
    k = split(linear(p["k"], k_in))
    v = split(linear(p["v"], v_in))
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        s = s + bias
    probs = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3)
    b, n = q_in.shape[:2]
    return linear(p["out"], o.reshape(b, n, c))


def _init_mha(key, dim: int):
    ks = jax.random.split(key, 4)
    return {
        "q": init_linear(ks[0], dim, dim),
        "k": init_linear(ks[1], dim, dim),
        "v": init_linear(ks[2], dim, dim),
        "out": init_linear(ks[3], dim, dim),
    }


def _mlp_apply(p, x):
    """DETR MLP (utils.py:173-187): relu between layers, none after last."""
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def _init_mlp(key, dims: Sequence[int]):
    ks = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            init_linear(ks[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)
        ]
    }


def _sine_embed(x, num_feats: int, temperature: float = 10000.0):
    """utils.get_sine_pos_embed for one scalar channel: [..., 1] ->
    [..., num_feats] interleaved (sin on even, cos on odd)."""
    dim_t = temperature ** (
        2 * (np.arange(num_feats) // 2) / num_feats
    )  # [num_feats]
    ang = x * (2 * math.pi) / jnp.asarray(dim_t, x.dtype)
    return jnp.stack(
        [jnp.sin(ang[..., 0::2]), jnp.cos(ang[..., 1::2])], axis=-1
    ).reshape(*ang.shape[:-1], num_feats)


def _box_sine_embed(ref, d_model: int):
    """gen_sineembed_for_position (utils.py:206-234): [..., 4] (cx cy w h)
    -> [..., 2*d_model] ordered (pos_y, pos_x, pos_w, pos_h), 128 feats
    each at d_model=256."""
    nf = d_model // 2
    return jnp.concatenate(
        [
            _sine_embed(ref[..., 1:2], nf),
            _sine_embed(ref[..., 0:1], nf),
            _sine_embed(ref[..., 2:3], nf),
            _sine_embed(ref[..., 3:4], nf),
        ],
        axis=-1,
    )


def _inverse_sigmoid(x, eps: float = 1e-3):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


# ---------------------------------------------------------------------------
# deformable attention module (projections around ops/ms_deform_attn)
# ---------------------------------------------------------------------------


def _init_msdeform(key, cfg: GroundingDINOConfig):
    ks = jax.random.split(key, 4)
    h, L, P = cfg.nheads, cfg.num_levels, cfg.num_points
    # reference init (ms_deform_attn.py:221-238): sampling offsets start as
    # a ring of unit offsets scaled by point index; weights zero
    thetas = np.arange(h) * (2.0 * math.pi / h)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None], (1, L, P, 1)) * (
        np.arange(1, P + 1)[None, None, :, None]
    )
    return {
        "sampling_offsets": {
            "kernel": jnp.zeros((cfg.d_model, h * L * P * 2), jnp.float32),
            "bias": jnp.asarray(grid.reshape(-1), jnp.float32),
        },
        "attention_weights": init_linear(ks[0], cfg.d_model, h * L * P,
                                         zero_init=True),
        "value_proj": init_linear(ks[1], cfg.d_model, cfg.d_model),
        "output_proj": init_linear(ks[2], cfg.d_model, cfg.d_model),
    }


def _msdeform_apply(p, query, value_tokens, reference_points, spatial_shapes,
                    cfg: GroundingDINOConfig):
    """query [B, Nq, C]; value_tokens [B, sum(HW), C]; reference_points
    [B, Nq, 2 or 4] normalized (valid_ratios == 1, see module docstring)."""
    b, nq, c = query.shape
    h, L, P = cfg.nheads, cfg.num_levels, cfg.num_points
    value = linear(p["value_proj"], value_tokens).reshape(b, -1, h, c // h)
    offsets = linear(p["sampling_offsets"], query).reshape(b, nq, h, L, P, 2)
    weights = linear(p["attention_weights"], query).reshape(b, nq, h, L * P)
    weights = jax.nn.softmax(weights, axis=-1).reshape(b, nq, h, L, P)
    if reference_points.shape[-1] == 2:
        # encoder path: per-level refs [B, N, L, 2] (transformer.py:480)
        normalizer = jnp.asarray(
            [[wl, hl] for hl, wl in spatial_shapes], offsets.dtype
        )  # [L, 2] (x, y)
        loc = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
    else:  # 4: cx cy w h — offsets scale with the box (transformer.py:319)
        loc = (
            reference_points[:, :, None, None, None, :2]
            + offsets / P * reference_points[:, :, None, None, None, 2:] * 0.5
        )
    out = ms_deform_attn(value, spatial_shapes, loc, weights)
    return linear(p["output_proj"], out)


# ---------------------------------------------------------------------------
# encoder: fusion + text-enhance + deformable layers
# ---------------------------------------------------------------------------


def _init_fusion(key, cfg: GroundingDINOConfig):
    """BiAttentionBlock (fuse_modules.py:216-400): v_dim=l_dim=256,
    embed_dim=1024, heads=4 (transformer.py:124-131)."""
    ks = jax.random.split(key, 7)
    embed = cfg.d_model * 4
    return {
        "norm_v": init_layer_norm(cfg.d_model),
        "norm_l": init_layer_norm(cfg.d_model),
        "v_proj": init_linear(ks[0], cfg.d_model, embed),
        "l_proj": init_linear(ks[1], cfg.d_model, embed),
        "values_v_proj": init_linear(ks[2], cfg.d_model, embed),
        "values_l_proj": init_linear(ks[3], cfg.d_model, embed),
        "out_v_proj": init_linear(ks[4], embed, cfg.d_model),
        "out_l_proj": init_linear(ks[5], embed, cfg.d_model),
        "gamma_v": jnp.full((cfg.d_model,), 1e-4, jnp.float32),
        "gamma_l": jnp.full((cfg.d_model,), 1e-4, jnp.float32),
    }


def _fusion_apply(p, v, l, text_mask, cfg: GroundingDINOConfig):
    """Bi-directional image<->text attention. v [B, Nv, C]; l [B, Nt, C];
    text_mask [B, Nt] bool (True = real token)."""
    heads = 4
    embed = cfg.d_model * 4
    d = embed // heads
    vn = layer_norm(p["norm_v"], v)
    ln = layer_norm(p["norm_l"], l)

    def split(y):
        b, n, _ = y.shape
        return y.reshape(b, n, heads, d).transpose(0, 2, 1, 3)

    q = split(linear(p["v_proj"], vn) * (d**-0.5))
    k = split(linear(p["l_proj"], ln))
    val_v = split(linear(p["values_v_proj"], vn))
    val_l = split(linear(p["values_l_proj"], ln))

    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    # stable_softmax_2d: subtract the GLOBAL max (fuse_modules.py:189), then
    # clamp to +-50000 both ways
    s = s - jax.lax.stop_gradient(jnp.max(s))
    s = jnp.clip(s, -50000.0, 50000.0)
    s_l = jnp.swapaxes(s, -1, -2)  # text -> image weights
    s_l = s_l - jax.lax.stop_gradient(jnp.max(s_l, axis=-1, keepdims=True))
    s_l = jnp.clip(s_l, -50000.0, 50000.0)

    # mask padded text tokens for the image->text softmax
    s = jnp.where(text_mask[:, None, None, :], s, -jnp.inf)
    p_v = jax.nn.softmax(s, axis=-1).astype(val_l.dtype)
    p_l = jax.nn.softmax(s_l, axis=-1).astype(val_v.dtype)

    def merge(y):
        b, h, n, dd = y.shape
        return y.transpose(0, 2, 1, 3).reshape(b, n, h * dd)

    dv = linear(p["out_v_proj"], merge(jnp.einsum("bhqk,bhkd->bhqd", p_v, val_l)))
    dl = linear(p["out_l_proj"], merge(jnp.einsum("bhqk,bhkd->bhqd", p_l, val_v)))
    return vn + p["gamma_v"] * dv, ln + p["gamma_l"] * dl


def _init_text_layer(key, cfg: GroundingDINOConfig):
    ks = jax.random.split(key, 3)
    return {
        "attn": _init_mha(ks[0], cfg.d_model),
        "norm1": init_layer_norm(cfg.d_model),
        "fc1": init_linear(ks[1], cfg.d_model, cfg.text_ffn_dim),
        "fc2": init_linear(ks[2], cfg.text_ffn_dim, cfg.d_model),
        "norm2": init_layer_norm(cfg.d_model),
    }


def _text_layer_apply(p, text, text_self_mask, pos_text, cfg):
    """transformer_vanilla.TransformerEncoderLayer (post-LN, relu FFN);
    text_self_mask [B, Nt, Nt] bool True = attend."""
    bias = jnp.where(text_self_mask[:, None], 0.0, -jnp.inf)
    q_in = text + pos_text
    att = _mha(p["attn"], q_in, q_in, text, cfg.nheads, bias=bias)
    text = layer_norm(p["norm1"], text + att)
    y = linear(p["fc2"], jax.nn.relu(linear(p["fc1"], text)))
    return layer_norm(p["norm2"], text + y)


def _init_enc_layer(key, cfg: GroundingDINOConfig):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": _init_msdeform(ks[0], cfg),
        "norm1": init_layer_norm(cfg.d_model),
        "fc1": init_linear(ks[1], cfg.d_model, cfg.ffn_dim),
        "fc2": init_linear(ks[2], cfg.ffn_dim, cfg.d_model),
        "norm2": init_layer_norm(cfg.d_model),
    }


def _enc_layer_apply(p, src, pos, reference_points, spatial_shapes, cfg):
    att = _msdeform_apply(
        p["self_attn"], src + pos, src, reference_points, spatial_shapes, cfg
    )
    src = layer_norm(p["norm1"], src + att)
    y = linear(p["fc2"], jax.nn.relu(linear(p["fc1"], src)))
    return layer_norm(p["norm2"], src + y)


# ---------------------------------------------------------------------------
# decoder layer
# ---------------------------------------------------------------------------


def _init_dec_layer(key, cfg: GroundingDINOConfig):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": _init_mha(ks[0], cfg.d_model),
        "norm2": init_layer_norm(cfg.d_model),
        "ca_text": _init_mha(ks[1], cfg.d_model),
        "catext_norm": init_layer_norm(cfg.d_model),
        "cross_attn": _init_msdeform(ks[2], cfg),
        "norm1": init_layer_norm(cfg.d_model),
        "fc1": init_linear(ks[3], cfg.d_model, cfg.ffn_dim),
        "fc2": init_linear(ks[4], cfg.ffn_dim, cfg.d_model),
        "norm3": init_layer_norm(cfg.d_model),
    }


def _dec_layer_apply(
    p, tgt, query_pos, reference_points, memory, memory_text, text_mask,
    spatial_shapes, cfg,
):
    """transformer.py:868-957 order: self-attn -> text cross-attn ->
    deformable cross-attn -> FFN, post-LN."""
    q_in = tgt + query_pos
    att = _mha(p["self_attn"], q_in, q_in, tgt, cfg.nheads)
    tgt = layer_norm(p["norm2"], tgt + att)

    bias = jnp.where(text_mask[:, None, None, :], 0.0, -jnp.inf)
    att = _mha(p["ca_text"], tgt + query_pos, memory_text, memory_text,
               cfg.nheads, bias=bias)
    tgt = layer_norm(p["catext_norm"], tgt + att)

    att = _msdeform_apply(
        p["cross_attn"], tgt + query_pos, memory, reference_points,
        spatial_shapes, cfg,
    )
    tgt = layer_norm(p["norm1"], tgt + att)

    y = linear(p["fc2"], jax.nn.relu(linear(p["fc1"], tgt)))
    return layer_norm(p["norm3"], tgt + y)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def init_grounding_dino(key, cfg: GroundingDINOConfig = GDINO_SWINT):
    keys = jax.random.split(key, 12)
    n_backbone = len(cfg.swin.num_channels)
    proj_keys = jax.random.split(keys[2], cfg.num_levels)
    input_proj = []
    for i in range(cfg.num_levels):
        in_ch = (
            cfg.swin.num_channels[i]
            if i < n_backbone
            else cfg.swin.num_channels[-1]
        )
        ksz = 1 if i < n_backbone else 3
        input_proj.append(
            {
                "conv": init_conv2d(proj_keys[i], in_ch, cfg.d_model, ksz),
                "gn_scale": jnp.ones((cfg.d_model,), jnp.float32),
                "gn_bias": jnp.zeros((cfg.d_model,), jnp.float32),
            }
        )
    ek = jax.random.split(keys[3], cfg.enc_layers)
    tk = jax.random.split(keys[4], cfg.enc_layers)
    fk = jax.random.split(keys[5], cfg.enc_layers)
    dk = jax.random.split(keys[6], cfg.dec_layers)
    params = {
        "backbone": init_swin(keys[0], cfg.swin),
        "bert": init_bert(keys[1], cfg.bert),
        "feat_map": init_linear(keys[7], cfg.bert.hidden, cfg.d_model),
        "input_proj": input_proj,
        "level_embed": 0.02
        * jax.random.normal(keys[8], (cfg.num_levels, cfg.d_model), jnp.float32),
        "enc_layers": [_init_enc_layer(k, cfg) for k in ek],
        "text_layers": [_init_text_layer(k, cfg) for k in tk],
        "fusion_layers": [_init_fusion(k, cfg) for k in fk],
        "enc_output": init_linear(keys[9], cfg.d_model, cfg.d_model),
        "enc_output_norm": init_layer_norm(cfg.d_model),
        # two-stage heads (separate enc_out copies: the SwinB config sets
        # two_stage_bbox/class_embed_share=False)
        "enc_out_bbox_embed": _init_mlp(
            keys[10], (cfg.d_model, cfg.d_model, cfg.d_model, 4)
        ),
        "tgt_embed": 0.02
        * jax.random.normal(
            jax.random.fold_in(keys[10], 1), (cfg.num_queries, cfg.d_model)
        ),
        "ref_point_head": _init_mlp(
            jax.random.fold_in(keys[10], 2),
            (2 * cfg.d_model, cfg.d_model, cfg.d_model),
        ),
        "dec_layers": [_init_dec_layer(k, cfg) for k in dk],
        "dec_norm": init_layer_norm(cfg.d_model),
        # shared iterative box head (dec_pred_bbox_embed_share=True)
        "bbox_embed": _init_mlp(
            keys[11], (cfg.d_model, cfg.d_model, cfg.d_model, 4)
        ),
    }
    # zero-init the final bbox layer like the reference (groundingdino.py:165)
    params["bbox_embed"]["layers"][-1]["kernel"] = jnp.zeros_like(
        params["bbox_embed"]["layers"][-1]["kernel"]
    )
    params["bbox_embed"]["layers"][-1]["bias"] = jnp.zeros_like(
        params["bbox_embed"]["layers"][-1]["bias"]
    )
    return params


def _group_norm_32(x, scale, bias):
    """GroupNorm(32) over NHWC (input_proj epilogue, groundingdino.py:126)."""
    b, h, w, c = x.shape
    g = 32
    xg = x.reshape(b, h * w, g, c // g).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    return (xg.reshape(b, h, w, c) * scale + bias).astype(x.dtype)


def _sine_pos_hw(h: int, w: int, d_model: int, temperature: float):
    """PositionEmbeddingSineHW, normalize=True (position_encoding.py:79-145)
    without padding: embeds are functions of the (row, col) grid only.
    Returns [H*W, d_model]."""
    nf = d_model // 2
    y = (np.arange(1, h + 1, dtype=np.float32) / (h + 1e-6))[:, None] * (2 * math.pi)
    x = (np.arange(1, w + 1, dtype=np.float32) / (w + 1e-6))[None, :] * (2 * math.pi)
    dim_t = temperature ** (2 * (np.arange(nf) // 2) / nf)
    pos_x = x[..., None] / dim_t  # [1, W, nf] broadcast over rows
    pos_y = y[..., None] / dim_t  # [H, 1, nf]
    pos_x = np.broadcast_to(pos_x, (h, w, nf)).copy()
    pos_y = np.broadcast_to(pos_y, (h, w, nf)).copy()
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], -1
                     ).reshape(h, w, nf)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], -1
                     ).reshape(h, w, nf)
    return jnp.asarray(
        np.concatenate([pos_y, pos_x], -1).reshape(h * w, d_model)
    )


def _encoder_reference_points(spatial_shapes) -> jnp.ndarray:
    """Normalized (x, y) center of every token at every level, broadcast to
    all levels (transformer.py:465-480 with valid_ratios == 1).
    Returns [sum(HW), L, 2]."""
    pts = []
    for hl, wl in spatial_shapes:
        ry = (np.arange(hl, dtype=np.float32) + 0.5) / hl
        rx = (np.arange(wl, dtype=np.float32) + 0.5) / wl
        grid = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1)  # [H, W, 2]
        pts.append(grid.reshape(-1, 2))
    ref = np.concatenate(pts, 0)
    return jnp.asarray(np.tile(ref[:, None], (1, len(spatial_shapes), 1)))


def _proposals(spatial_shapes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gen_encoder_output_proposals without padding (utils.py:57-119):
    unsigmoided (cx cy w h) anchors + validity. Returns ([sum(HW), 4],
    [sum(HW)] bool)."""
    props = []
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        gy = (np.arange(hl, dtype=np.float32) + 0.5) / hl
        gx = (np.arange(wl, dtype=np.float32) + 0.5) / wl
        grid = np.stack(np.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)
        wh = np.full_like(grid, 0.05 * (2.0**lvl))
        props.append(np.concatenate([grid, wh], -1))
    p = np.concatenate(props, 0)
    valid = ((p > 0.01) & (p < 0.99)).all(-1)
    unsig = np.log(p / (1 - p))
    unsig[~valid] = np.inf
    return jnp.asarray(unsig), jnp.asarray(valid)


def _contrastive_logits(x, text, text_mask, max_text_len: int):
    """ContrastiveEmbed (utils.py:237-268): dot with encoded text, -inf on
    padding, right-pad to max_text_len."""
    res = jnp.einsum("bqc,btc->bqt", x, text, preferred_element_type=jnp.float32)
    res = jnp.where(text_mask[:, None, :], res, -jnp.inf)
    pad = max_text_len - res.shape[-1]
    if pad > 0:
        res = jnp.pad(res, ((0, 0), (0, 0), (0, pad)), constant_values=-jnp.inf)
    return res[..., :max_text_len]


def grounding_dino_apply(
    params,
    image: jnp.ndarray,          # [B, H, W, 3] normalized (ImageNet stats)
    input_ids: jnp.ndarray,      # [B, Nt] int32
    text_self_mask: jnp.ndarray, # [B, Nt, Nt] bool (build_text_masks)
    position_ids: jnp.ndarray,   # [B, Nt] int32
    text_token_mask: jnp.ndarray,  # [B, Nt] bool, True = real token
    cfg: GroundingDINOConfig = GDINO_SWINT,
):
    """Full inference forward. Returns dict with
    pred_logits [B, num_queries, max_text_len] and pred_boxes
    [B, num_queries, 4] (normalized cx cy w h), matching
    groundingdino.py:313-336."""
    # ---- text
    encoded = bert_apply(params["bert"], input_ids, text_self_mask,
                         position_ids, cfg.bert)
    text = linear(params["feat_map"], encoded)  # [B, Nt, 256]

    # ---- vision
    feats = swin_apply(params["backbone"], image, cfg.swin)  # 3 levels
    srcs = []
    n_backbone = len(feats)
    for i in range(cfg.num_levels):
        p = params["input_proj"][i]
        if i < n_backbone:
            x = conv2d(p["conv"], feats[i], stride=1, padding="SAME")
        else:
            x = conv2d(p["conv"], feats[-1] if i == n_backbone else srcs[-1],
                       stride=2, padding=1)
        x = _group_norm_32(x, p["gn_scale"], p["gn_bias"])
        srcs.append(x)

    spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
    b = image.shape[0]
    src_flat = jnp.concatenate(
        [s.reshape(b, -1, cfg.d_model) for s in srcs], axis=1
    )
    pos_flat = jnp.concatenate(
        [
            _sine_pos_hw(hl, wl, cfg.d_model, cfg.pe_temperature)[None]
            + params["level_embed"][lvl][None, None]
            for lvl, (hl, wl) in enumerate(spatial_shapes)
        ],
        axis=1,
    )

    # ---- encoder (fusion -> text enhance -> deformable, transformer.py:545+)
    ref_pts = _encoder_reference_points(spatial_shapes)[None]
    pos_text = _sine_embed(
        position_ids[..., None].astype(jnp.float32), cfg.d_model,
    )
    memory, memory_text = src_flat, text
    for i in range(cfg.enc_layers):
        memory, memory_text = _fusion_apply(
            params["fusion_layers"][i], memory, memory_text, text_token_mask, cfg
        )
        memory_text = _text_layer_apply(
            params["text_layers"][i], memory_text, text_self_mask, pos_text, cfg
        )
        memory = _enc_layer_apply(
            params["enc_layers"][i], memory, pos_flat, ref_pts, spatial_shapes,
            cfg,
        )

    # ---- two-stage query selection (transformer.py:286-321)
    proposals, valid = _proposals(spatial_shapes)
    out_mem = jnp.where(valid[None, :, None], memory, 0.0)
    out_mem = layer_norm(
        params["enc_output_norm"], linear(params["enc_output"], out_mem)
    )
    enc_logits = _contrastive_logits(
        out_mem, memory_text, text_token_mask, cfg.max_text_len
    )
    topk_scores = jnp.where(
        valid[None], jnp.max(enc_logits, -1), -jnp.inf
    )
    topk_idx = jax.lax.top_k(topk_scores, cfg.num_queries)[1]  # [B, nq]
    coords_unsig = _mlp_apply(params["enc_out_bbox_embed"], out_mem) + proposals[
        None
    ]
    ref_unsig = jnp.take_along_axis(coords_unsig, topk_idx[..., None], axis=1)
    refs = jax.nn.sigmoid(ref_unsig)  # detached in torch; inference-only here
    tgt = jnp.broadcast_to(
        params["tgt_embed"][None], (b, cfg.num_queries, cfg.d_model)
    )

    # ---- decoder (transformer.py:633-737)
    refs_before = refs
    for i, dp in enumerate(params["dec_layers"]):
        sine = _box_sine_embed(refs, cfg.d_model)  # [B, nq, 512]
        query_pos = _mlp_apply(params["ref_point_head"], sine)
        tgt = _dec_layer_apply(
            dp, tgt, query_pos, refs, memory, memory_text, text_token_mask,
            spatial_shapes, cfg,
        )
        refs_before = refs
        delta = _mlp_apply(params["bbox_embed"], tgt)
        refs = jax.nn.sigmoid(delta + _inverse_sigmoid(refs))

    hs = layer_norm(params["dec_norm"], tgt)
    logits = _contrastive_logits(hs, memory_text, text_token_mask,
                                 cfg.max_text_len)
    # final boxes recompute the last delta from the NORMED hidden state +
    # the pre-update reference — a reference quirk: groundingdino.py:321-327
    # applies bbox_embed to hs (= norm(output)) while the decoder's internal
    # ref iteration used the unnormed output
    boxes = jax.nn.sigmoid(
        _mlp_apply(params["bbox_embed"], hs) + _inverse_sigmoid(refs_before)
    )
    return {"pred_logits": logits, "pred_boxes": boxes}
