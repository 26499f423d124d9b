"""GroundingDINO port tests: host-side text masks, Swin backbone, fusion /
deformable modules vs self-contained torch mirrors (the reference package
itself cannot import here — it requires torchvision/timm — so mirrors follow
the repo's tests/torch_oracle.py pattern), and a tiny-config full forward.

Reference: data_preparation/GroundedSAM/GroundingDINO/groundingdino/models/.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from motioneditor_tpu.models.grounding_dino import (
    BertConfig,
    GroundingDINOConfig,
    _fusion_apply,
    _init_fusion,
    _init_msdeform,
    _msdeform_apply,
    build_text_masks,
    grounding_dino_apply,
    init_grounding_dino,
)
from motioneditor_tpu.models.swin import SwinConfig, init_swin, swin_apply

pytestmark = pytest.mark.slow  # Swin/fusion/deformable torch-mirror compiles (see pytest.ini)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# text masks (bertwarper.py:224-273 semantics)
# ---------------------------------------------------------------------------


def test_build_text_masks_blocks_and_positions():
    # [CLS] a b . c . [SEP] with CLS=101, SEP=102, '.'=1012
    ids = np.array([[101, 7, 8, 1012, 9, 1012, 102]])
    attn, pos = build_text_masks(ids, special_ids=[101, 102, 1012])
    # first phrase block: tokens 1..3 attend among themselves
    assert attn[0, 1:4, 1:4].all()
    assert not attn[0, 1:4, 4:6].any()
    # second phrase block: tokens 4..5
    assert attn[0, 4:6, 4:6].all()
    assert not attn[0, 4:6, 1:4].any()
    # CLS/SEP attend only to themselves
    assert attn[0, 0].sum() == 1 and attn[0, 6].sum() == 1
    # position ids restart per phrase
    np.testing.assert_array_equal(pos[0], [0, 0, 1, 2, 0, 1, 0])


# ---------------------------------------------------------------------------
# Swin backbone
# ---------------------------------------------------------------------------

TINY_SWIN = SwinConfig(
    embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 4), window_size=4
)


def test_swin_output_strides():
    params = init_swin(jax.random.PRNGKey(0), TINY_SWIN)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    outs = swin_apply(params, img, TINY_SWIN)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 16),
        (1, 4, 4, 32),
        (1, 2, 2, 64),
    ]
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_swin_window_attention_matches_torch():
    """One W-MSA window vs a torch mirror of WindowAttention
    (swin_transformer.py:76-170)."""
    from motioneditor_tpu.models.swin import _rel_position_index, _window_attention

    dim, heads, ws = 16, 4, 4
    n = ws * ws
    key = jax.random.PRNGKey(0)
    p = {
        "qkv": {
            "kernel": jax.random.normal(key, (dim, 3 * dim)) * 0.1,
            "bias": jax.random.normal(jax.random.fold_in(key, 1), (3 * dim,)) * 0.1,
        },
        "proj": {
            "kernel": jax.random.normal(jax.random.fold_in(key, 2), (dim, dim)) * 0.1,
            "bias": jnp.zeros((dim,)),
        },
        "rel_bias_table": jax.random.normal(
            jax.random.fold_in(key, 3), ((2 * ws - 1) ** 2, heads)
        )
        * 0.1,
    }
    x = jax.random.normal(jax.random.fold_in(key, 4), (2, n, dim))
    ours = np.asarray(_window_attention(p, x, heads, ws, None))

    # torch mirror
    xt = torch.tensor(np.asarray(x))
    qkv_w = torch.tensor(np.asarray(p["qkv"]["kernel"]))
    qkv_b = torch.tensor(np.asarray(p["qkv"]["bias"]))
    proj_w = torch.tensor(np.asarray(p["proj"]["kernel"]))
    table = torch.tensor(np.asarray(p["rel_bias_table"]))
    d = dim // heads
    qkv = (xt @ qkv_w + qkv_b).reshape(2, n, 3, heads, d).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * d**-0.5) @ k.transpose(-2, -1)
    idx = torch.tensor(_rel_position_index(ws).reshape(-1))
    bias = table[idx].reshape(n, n, heads).permute(2, 0, 1)
    attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
    ref = ((attn @ v).transpose(1, 2).reshape(2, n, dim)) @ proj_w
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# BiMultiHeadAttention fusion vs torch mirror (fuse_modules.py:100-214)
# ---------------------------------------------------------------------------


def test_fusion_matches_torch_mirror():
    cfg = GroundingDINOConfig(d_model=32)
    p = _init_fusion(jax.random.PRNGKey(3), cfg)
    v = jax.random.normal(jax.random.PRNGKey(4), (1, 20, 32))
    l = jax.random.normal(jax.random.PRNGKey(5), (1, 7, 32))
    tmask = jnp.asarray([[True] * 5 + [False] * 2])
    ov, ol = _fusion_apply(p, v, l, tmask, cfg)
    ov, ol = np.asarray(ov), np.asarray(ol)

    # torch mirror with identical weights
    def lin(name, x):
        w = torch.tensor(np.asarray(p[name]["kernel"]))
        b = torch.tensor(np.asarray(p[name]["bias"]))
        return x @ w + b

    def ln(name, x):
        g = torch.tensor(np.asarray(p[name]["scale"]))
        b = torch.tensor(np.asarray(p[name]["bias"]))
        return torch.nn.functional.layer_norm(x, (32,), g, b)

    heads, embed = 4, 128
    d = embed // heads
    vt = ln("norm_v", torch.tensor(np.asarray(v)))
    lt = ln("norm_l", torch.tensor(np.asarray(l)))
    q = lin("v_proj", vt) * (d**-0.5)
    k = lin("l_proj", lt)
    vv = lin("values_v_proj", vt)
    vl = lin("values_l_proj", lt)

    def shape(x, n):
        return x.view(1, n, heads, d).transpose(1, 2).reshape(heads, n, d)

    q, k = shape(q, 20), shape(k, 7)
    vv, vl = shape(vv, 20), shape(vl, 7)
    w = torch.bmm(q, k.transpose(1, 2))
    w = w - w.max()
    w = torch.clamp(w, -50000, 50000)
    w_t = w.transpose(1, 2)
    w_l = w_t - w_t.max(dim=-1, keepdim=True)[0]
    w_l = torch.clamp(w_l, -50000, 50000)
    w = w.masked_fill(torch.tensor([False] * 5 + [True] * 2)[None, None], -torch.inf)
    p_v = w.softmax(-1)
    p_l = w_l.softmax(-1)
    out_v = torch.bmm(p_v, vl).view(1, heads, 20, d).transpose(1, 2).reshape(1, 20, embed)
    out_l = torch.bmm(p_l, vv).view(1, heads, 7, d).transpose(1, 2).reshape(1, 7, embed)
    dv = lin("out_v_proj", out_v)
    dl = lin("out_l_proj", out_l)
    rv = vt + torch.tensor(np.asarray(p["gamma_v"])) * dv
    rl = lt + torch.tensor(np.asarray(p["gamma_l"])) * dl
    np.testing.assert_allclose(ov, rv.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ol, rl.numpy(), rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# deformable attention module init invariants
# ---------------------------------------------------------------------------


def test_msdeform_module_zero_query_gives_ring_offsets():
    """With zero query, sampling locations reduce to ref + bias-ring/normalizer
    and weights are uniform (zero-init attention_weights) — the reference's
    init structure (ms_deform_attn.py:221-238)."""
    cfg = GroundingDINOConfig(d_model=32, num_levels=2, num_points=2)
    p = _init_msdeform(jax.random.PRNGKey(0), cfg)
    shapes = ((4, 4), (2, 2))
    value = jax.random.normal(jax.random.PRNGKey(1), (1, 20, 32))
    query = jnp.zeros((1, 3, 32))
    ref = jnp.full((1, 3, 2, 2), 0.5)  # [B, Nq, L, 2] per-level refs
    out = _msdeform_apply(p, query, value, ref, shapes, cfg)
    assert out.shape == (1, 3, 32)
    assert np.all(np.isfinite(np.asarray(out)))


# ---------------------------------------------------------------------------
# tiny-config full forward
# ---------------------------------------------------------------------------

TINY_GDINO = GroundingDINOConfig(
    d_model=32,
    nheads=4,
    enc_layers=2,
    dec_layers=2,
    ffn_dim=64,
    text_ffn_dim=64,
    num_queries=12,
    max_text_len=16,
    swin=TINY_SWIN,
    bert=BertConfig(vocab_size=200, hidden=32, layers=1, heads=4,
                    intermediate=64, max_position=32),
)


def _params_to_torch_state_dict(params, cfg):
    """Inverse of gdino_weights.map_groundingdino_state_dict for the test:
    synthesize the official checkpoint key layout from our pytree."""
    sd = {}

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def lnm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def mha(prefix, p):
        sd[f"{prefix}.in_proj_weight"] = np.concatenate(
            [np.asarray(p[k]["kernel"]).T for k in ("q", "k", "v")], 0
        )
        sd[f"{prefix}.in_proj_bias"] = np.concatenate(
            [np.asarray(p[k]["bias"]) for k in ("q", "k", "v")], 0
        )
        lin(f"{prefix}.out_proj", p["out"])

    def msd(prefix, p):
        for k in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            lin(f"{prefix}.{k}", p[k])

    def mlp(prefix, p):
        for i, lp in enumerate(p["layers"]):
            lin(f"{prefix}.layers.{i}", lp)

    # swin
    b = params["backbone"]
    sd["backbone.0.patch_embed.proj.weight"] = np.asarray(
        b["patch_embed"]["proj"]["kernel"]
    ).transpose(3, 2, 0, 1)
    sd["backbone.0.patch_embed.proj.bias"] = np.asarray(
        b["patch_embed"]["proj"]["bias"]
    )
    lnm("backbone.0.patch_embed.norm", b["patch_embed"]["norm"])
    for i, stage in enumerate(b["stages"]):
        for j, blk in enumerate(stage["blocks"]):
            bp = f"backbone.0.layers.{i}.blocks.{j}"
            lnm(f"{bp}.norm1", blk["norm1"])
            lin(f"{bp}.attn.qkv", blk["attn"]["qkv"])
            lin(f"{bp}.attn.proj", blk["attn"]["proj"])
            sd[f"{bp}.attn.relative_position_bias_table"] = np.asarray(
                blk["attn"]["rel_bias_table"]
            )
            lnm(f"{bp}.norm2", blk["norm2"])
            lin(f"{bp}.mlp.fc1", blk["fc1"])
            lin(f"{bp}.mlp.fc2", blk["fc2"])
        if "downsample" in stage:
            lnm(f"backbone.0.layers.{i}.downsample.norm", stage["downsample"]["norm"])
            lin(
                f"backbone.0.layers.{i}.downsample.reduction",
                stage["downsample"]["reduction"],
            )
    for i in cfg.swin.out_indices:
        lnm(f"backbone.0.norm{i}", params["backbone"][f"out_norm{i}"])
    # bert
    be = params["bert"]
    sd["bert.embeddings.word_embeddings.weight"] = np.asarray(be["word_emb"])
    sd["bert.embeddings.position_embeddings.weight"] = np.asarray(be["pos_emb"])
    sd["bert.embeddings.token_type_embeddings.weight"] = np.asarray(be["type_emb"])
    lnm("bert.embeddings.LayerNorm", be["emb_norm"])
    for i, lp in enumerate(be["layers"]):
        pre = f"bert.encoder.layer.{i}"
        lin(f"{pre}.attention.self.query", lp["q"])
        lin(f"{pre}.attention.self.key", lp["k"])
        lin(f"{pre}.attention.self.value", lp["v"])
        lin(f"{pre}.attention.output.dense", lp["attn_out"])
        lnm(f"{pre}.attention.output.LayerNorm", lp["attn_norm"])
        lin(f"{pre}.intermediate.dense", lp["fc1"])
        lin(f"{pre}.output.dense", lp["fc2"])
        lnm(f"{pre}.output.LayerNorm", lp["out_norm"])
    # heads + transformer
    lin("feat_map", params["feat_map"])
    for i, ip in enumerate(params["input_proj"]):
        sd[f"input_proj.{i}.0.weight"] = np.asarray(ip["conv"]["kernel"]).transpose(
            3, 2, 0, 1
        )
        sd[f"input_proj.{i}.0.bias"] = np.asarray(ip["conv"]["bias"])
        sd[f"input_proj.{i}.1.weight"] = np.asarray(ip["gn_scale"])
        sd[f"input_proj.{i}.1.bias"] = np.asarray(ip["gn_bias"])
    sd["transformer.level_embed"] = np.asarray(params["level_embed"])
    for i, lp in enumerate(params["enc_layers"]):
        pre = f"transformer.encoder.layers.{i}"
        msd(f"{pre}.self_attn", lp["self_attn"])
        lnm(f"{pre}.norm1", lp["norm1"])
        lin(f"{pre}.linear1", lp["fc1"])
        lin(f"{pre}.linear2", lp["fc2"])
        lnm(f"{pre}.norm2", lp["norm2"])
    for i, lp in enumerate(params["text_layers"]):
        pre = f"transformer.encoder.text_layers.{i}"
        mha(f"{pre}.self_attn", lp["attn"])
        lnm(f"{pre}.norm1", lp["norm1"])
        lin(f"{pre}.linear1", lp["fc1"])
        lin(f"{pre}.linear2", lp["fc2"])
        lnm(f"{pre}.norm2", lp["norm2"])
    for i, lp in enumerate(params["fusion_layers"]):
        pre = f"transformer.encoder.fusion_layers.{i}"
        lnm(f"{pre}.layer_norm_v", lp["norm_v"])
        lnm(f"{pre}.layer_norm_l", lp["norm_l"])
        for k in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                  "out_v_proj", "out_l_proj"):
            lin(f"{pre}.attn.{k}", lp[k])
        sd[f"{pre}.gamma_v"] = np.asarray(lp["gamma_v"])
        sd[f"{pre}.gamma_l"] = np.asarray(lp["gamma_l"])
    lin("transformer.enc_output", params["enc_output"])
    lnm("transformer.enc_output_norm", params["enc_output_norm"])
    mlp("transformer.enc_out_bbox_embed", params["enc_out_bbox_embed"])
    sd["transformer.tgt_embed.weight"] = np.asarray(params["tgt_embed"])
    mlp("transformer.decoder.ref_point_head", params["ref_point_head"])
    for i, lp in enumerate(params["dec_layers"]):
        pre = f"transformer.decoder.layers.{i}"
        mha(f"{pre}.self_attn", lp["self_attn"])
        lnm(f"{pre}.norm2", lp["norm2"])
        mha(f"{pre}.ca_text", lp["ca_text"])
        lnm(f"{pre}.catext_norm", lp["catext_norm"])
        msd(f"{pre}.cross_attn", lp["cross_attn"])
        lnm(f"{pre}.norm1", lp["norm1"])
        lin(f"{pre}.linear1", lp["fc1"])
        lin(f"{pre}.linear2", lp["fc2"])
        lnm(f"{pre}.norm3", lp["norm3"])
    lnm("transformer.decoder.norm", params["dec_norm"])
    mlp("bbox_embed.0", params["bbox_embed"])
    return sd


def test_weight_mapping_roundtrip():
    """init -> synthesized torch state_dict -> map_groundingdino_state_dict
    must reproduce the original pytree exactly."""
    from motioneditor_tpu.models.gdino_weights import map_groundingdino_state_dict

    params = init_grounding_dino(jax.random.PRNGKey(7), TINY_GDINO)
    sd = _params_to_torch_state_dict(params, TINY_GDINO)
    mapped = map_groundingdino_state_dict(sd, TINY_GDINO)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(mapped))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]),
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_grounding_dino_tiny_forward():
    params = init_grounding_dino(jax.random.PRNGKey(0), TINY_GDINO)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ids = np.array([[101, 7, 8, 120, 9, 120, 102]])
    attn, pos = build_text_masks(ids, special_ids=[101, 102, 120])
    token_mask = np.ones((1, 7), bool)
    out = jax.jit(
        lambda p, i: grounding_dino_apply(
            p, i, jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(pos),
            jnp.asarray(token_mask), TINY_GDINO,
        )
    )(params, img)
    logits = np.asarray(out["pred_logits"])
    boxes = np.asarray(out["pred_boxes"])
    assert logits.shape == (1, 12, 16)
    assert boxes.shape == (1, 12, 4)
    assert np.all((boxes >= 0) & (boxes <= 1))
    # real-token columns are finite, padding columns are -inf
    assert np.all(np.isfinite(logits[..., :7]))
    assert np.all(np.isneginf(logits[..., 7:]))
