"""SAM port tests (models/sam.py) vs self-contained torch mirrors of
segment_anything/modeling/{image_encoder.py,transformer.py,mask_decoder.py}
(the vendored package cannot import here — tests/torch_oracle.py pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from motioneditor_tpu.models.sam import (
    SAMConfig,
    _conv_transpose_2x2,
    _rel_pos_bias,
    _twoway_attention,
    _vit_attention,
    init_sam,
    map_sam_state_dict,
    sam_decode_masks,
    sam_encode_image,
)

pytestmark = pytest.mark.slow  # ViT encoder + two-way decoder compiles (see pytest.ini)

torch.manual_seed(0)

TINY = SAMConfig(
    img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=4,
    global_attn=(1,), window=2, prompt_dim=32, mask_in_chans=4,
    twoway_depth=2, twoway_heads=4, twoway_mlp=64,
)


def test_vit_attention_rel_pos_matches_torch():
    """Global attention with decomposed rel pos (image_encoder.py:186-240,
    324-360)."""
    dim, heads, h, w = 16, 2, 4, 4
    hd = dim // heads
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
        "rel_pos_h": jax.random.normal(jax.random.fold_in(key, 3), (2 * h - 1, hd)) * 0.1,
        "rel_pos_w": jax.random.normal(jax.random.fold_in(key, 4), (2 * w - 1, hd)) * 0.1,
    }
    x = jax.random.normal(jax.random.fold_in(key, 5), (2, h, w, dim))
    ours = np.asarray(_vit_attention(p, x, heads, h, w))

    xt = torch.tensor(np.asarray(x))
    b = 2
    qkv = (
        xt.reshape(b, h * w, dim) @ torch.tensor(np.asarray(p["qkv"]["kernel"]))
        + torch.tensor(np.asarray(p["qkv"]["bias"]))
    ).reshape(b, h * w, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv.reshape(3, b * heads, h * w, hd).unbind(0)
    attn = (q * hd**-0.5) @ k.transpose(-2, -1)
    rh = torch.tensor(np.asarray(p["rel_pos_h"]))[
        torch.arange(h)[:, None] - torch.arange(h)[None] + h - 1
    ]
    rw = torch.tensor(np.asarray(p["rel_pos_w"]))[
        torch.arange(w)[:, None] - torch.arange(w)[None] + w - 1
    ]
    rq = q.reshape(b * heads, h, w, hd)
    rel_h = torch.einsum("bhwc,hkc->bhwk", rq, rh)
    rel_w = torch.einsum("bhwc,wkc->bhwk", rq, rw)
    attn = (
        attn.view(b * heads, h, w, h, w)
        + rel_h[:, :, :, :, None]
        + rel_w[:, :, :, None, :]
    ).view(b * heads, h * w, h * w)
    attn = attn.softmax(-1)
    out = (attn @ v).view(b, heads, h, w, hd).permute(0, 2, 3, 1, 4).reshape(
        b, h, w, dim
    )
    ref = out @ torch.tensor(np.asarray(p["proj"]["kernel"]))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


def test_conv_transpose_matches_torch():
    p = {
        "kernel": jax.random.normal(jax.random.PRNGKey(0), (8, 4, 2, 2)) * 0.1,
        "bias": jax.random.normal(jax.random.PRNGKey(1), (4,)) * 0.1,
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 5, 8))
    ours = np.asarray(_conv_transpose_2x2(p, x))
    ref = F.conv_transpose2d(
        torch.tensor(np.asarray(x)).permute(0, 3, 1, 2),
        torch.tensor(np.asarray(p["kernel"])),
        torch.tensor(np.asarray(p["bias"])),
        stride=2,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


def test_twoway_attention_downsampled_matches_torch():
    """Attention with internal-dim downsampling (transformer.py:185-240)."""
    dim, heads = 32, 4
    internal = dim // 2
    key = jax.random.PRNGKey(1)
    p = {
        n: {
            "kernel": jax.random.normal(jax.random.fold_in(key, i), (din, dout)) * 0.1,
            "bias": jax.random.normal(jax.random.fold_in(key, 10 + i), (dout,)) * 0.1,
        }
        for i, (n, din, dout) in enumerate(
            [("q", dim, internal), ("k", dim, internal), ("v", dim, internal),
             ("out", internal, dim)]
        )
    }
    q = jax.random.normal(jax.random.fold_in(key, 20), (2, 5, dim))
    k = jax.random.normal(jax.random.fold_in(key, 21), (2, 9, dim))
    ours = np.asarray(_twoway_attention(p, q, k, k, heads))

    def tl(n, x):
        return x @ torch.tensor(np.asarray(p[n]["kernel"])) + torch.tensor(
            np.asarray(p[n]["bias"])
        )

    qt = tl("q", torch.tensor(np.asarray(q)))
    kt = tl("k", torch.tensor(np.asarray(k)))
    vt = tl("v", torch.tensor(np.asarray(k)))
    hd = internal // heads

    def sep(x):
        b, n, c = x.shape
        return x.reshape(b, n, heads, c // heads).transpose(1, 2)

    attn = sep(qt) @ sep(kt).permute(0, 1, 3, 2) / np.sqrt(hd)
    out = (attn.softmax(-1) @ sep(vt)).transpose(1, 2).reshape(2, 5, internal)
    ref = tl("out", out)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


def test_sam_tiny_end_to_end():
    params = init_sam(jax.random.PRNGKey(0), TINY)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    emb = sam_encode_image(params, img, TINY)
    assert emb.shape == (1, 4, 4, 32)
    boxes = jnp.asarray([[8.0, 8.0, 48.0, 48.0], [0.0, 0.0, 32.0, 64.0]])
    masks, iou = sam_decode_masks(params, emb, boxes, TINY)
    assert masks.shape == (2, 1, 16, 16)
    assert iou.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(masks)))
    masks3, iou3 = sam_decode_masks(params, emb, boxes, TINY, multimask=True)
    assert masks3.shape == (2, 3, 16, 16) and iou3.shape == (2, 3)


def test_sam_weight_mapping_roundtrip():
    """init -> synthesized official-layout state_dict -> map must reproduce
    the pytree."""
    params = init_sam(jax.random.PRNGKey(3), TINY)
    sd = {}

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def lnm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def conv(prefix, p, bias=True):
        sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if bias and "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def attn(prefix, p):
        for n, t in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                     ("out_proj", "out")):
            lin(f"{prefix}.{n}", p[t])

    def mlp(prefix, p):
        for i, lp in enumerate(p["layers"]):
            lin(f"{prefix}.layers.{i}", lp)

    conv("image_encoder.patch_embed.proj", params["patch_embed"])
    sd["image_encoder.pos_embed"] = np.asarray(params["pos_embed"])[None]
    for i, blk in enumerate(params["blocks"]):
        lnm(f"image_encoder.blocks.{i}.norm1", blk["norm1"])
        lin(f"image_encoder.blocks.{i}.attn.qkv", blk["qkv"])
        lin(f"image_encoder.blocks.{i}.attn.proj", blk["proj"])
        sd[f"image_encoder.blocks.{i}.attn.rel_pos_h"] = np.asarray(blk["rel_pos_h"])
        sd[f"image_encoder.blocks.{i}.attn.rel_pos_w"] = np.asarray(blk["rel_pos_w"])
        lnm(f"image_encoder.blocks.{i}.norm2", blk["norm2"])
        lin(f"image_encoder.blocks.{i}.mlp.lin1", blk["fc1"])
        lin(f"image_encoder.blocks.{i}.mlp.lin2", blk["fc2"])
    conv("image_encoder.neck.0", params["neck_conv1"], bias=False)
    lnm("image_encoder.neck.1", params["neck_ln1"])
    conv("image_encoder.neck.2", params["neck_conv2"], bias=False)
    lnm("image_encoder.neck.3", params["neck_ln2"])
    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = np.asarray(
        params["pe_gaussian"]
    )
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = np.asarray(
            params["point_embed"][i : i + 1]
        )
    sd["prompt_encoder.not_a_point_embed.weight"] = np.asarray(
        params["not_a_point"]
    )[None]
    sd["prompt_encoder.no_mask_embed.weight"] = np.asarray(
        params["no_mask_embed"]
    )[None]
    sd["mask_decoder.iou_token.weight"] = np.asarray(params["iou_token"])
    sd["mask_decoder.mask_tokens.weight"] = np.asarray(params["mask_tokens"])
    for i, blk in enumerate(params["twoway"]):
        pre = f"mask_decoder.transformer.layers.{i}"
        attn(f"{pre}.self_attn", blk["self_attn"])
        lnm(f"{pre}.norm1", blk["norm1"])
        attn(f"{pre}.cross_attn_token_to_image", blk["ca_t2i"])
        lnm(f"{pre}.norm2", blk["norm2"])
        lin(f"{pre}.mlp.lin1", blk["fc1"])
        lin(f"{pre}.mlp.lin2", blk["fc2"])
        lnm(f"{pre}.norm3", blk["norm3"])
        attn(f"{pre}.cross_attn_image_to_token", blk["ca_i2t"])
        lnm(f"{pre}.norm4", blk["norm4"])
    attn("mask_decoder.transformer.final_attn_token_to_image", params["final_attn"])
    lnm("mask_decoder.transformer.norm_final_attn", params["norm_final"])
    sd["mask_decoder.output_upscaling.0.weight"] = np.asarray(
        params["up_conv1"]["kernel"]
    )
    sd["mask_decoder.output_upscaling.0.bias"] = np.asarray(
        params["up_conv1"]["bias"]
    )
    lnm("mask_decoder.output_upscaling.1", params["up_ln"])
    sd["mask_decoder.output_upscaling.3.weight"] = np.asarray(
        params["up_conv2"]["kernel"]
    )
    sd["mask_decoder.output_upscaling.3.bias"] = np.asarray(
        params["up_conv2"]["bias"]
    )
    for i, mp in enumerate(params["hyper_mlps"]):
        mlp(f"mask_decoder.output_hypernetworks_mlps.{i}", mp)
    mlp("mask_decoder.iou_prediction_head", params["iou_head"])

    mapped = map_sam_state_dict(sd, TINY)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(mapped))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]),
            err_msg=jax.tree_util.keystr(path),
        )
