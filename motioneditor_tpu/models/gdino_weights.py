"""GroundingDINO torch checkpoint -> JAX param pytree.

Maps the official IDEA-Research checkpoint layout (the module names created
by data_preparation/GroundedSAM/GroundingDINO/groundingdino/models/
GroundingDINO/{groundingdino.py,transformer.py,fuse_modules.py,backbone/*}) to
models/grounding_dino.init_grounding_dino's pytree. Conventions follow
models/weights.py: torch Linear weights are [out, in] -> transposed to
[in, out]; conv weights [out, in, kh, kw] -> [kh, kw, in, out]; packed
nn.MultiheadAttention in_proj tensors are split into q/k/v.

No checkpoint exists in this environment; the mapping is exercised by a
round-trip structure test (tests/test_grounding_dino.py) that synthesizes a
reference-shaped state_dict from a tiny config.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.grounding_dino import (
    GDINO_SWINT,
    GroundingDINOConfig,
)


def _t(sd, key):
    """torch Linear weight -> [in, out]."""
    return jnp.asarray(np.asarray(sd[key]).T)


def _a(sd, key):
    return jnp.asarray(np.asarray(sd[key]))


def _conv(sd, key):
    """torch conv weight [out, in, kh, kw] -> HWIO."""
    return jnp.asarray(np.asarray(sd[key]).transpose(2, 3, 1, 0))


def _linear(sd, prefix):
    p = {"kernel": _t(sd, f"{prefix}.weight")}
    if f"{prefix}.bias" in sd:
        p["bias"] = _a(sd, f"{prefix}.bias")
    return p


def _ln(sd, prefix):
    return {"scale": _a(sd, f"{prefix}.weight"), "bias": _a(sd, f"{prefix}.bias")}


def _mha(sd, prefix, dim: int):
    """nn.MultiheadAttention: packed in_proj -> q/k/v + out."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    return {
        "q": {"kernel": jnp.asarray(w[:dim].T), "bias": jnp.asarray(b[:dim])},
        "k": {
            "kernel": jnp.asarray(w[dim : 2 * dim].T),
            "bias": jnp.asarray(b[dim : 2 * dim]),
        },
        "v": {
            "kernel": jnp.asarray(w[2 * dim :].T),
            "bias": jnp.asarray(b[2 * dim :]),
        },
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def _mlp(sd, prefix, n_layers: int):
    return {
        "layers": [_linear(sd, f"{prefix}.layers.{i}") for i in range(n_layers)]
    }


def _msdeform(sd, prefix):
    return {
        "sampling_offsets": _linear(sd, f"{prefix}.sampling_offsets"),
        "attention_weights": _linear(sd, f"{prefix}.attention_weights"),
        "value_proj": _linear(sd, f"{prefix}.value_proj"),
        "output_proj": _linear(sd, f"{prefix}.output_proj"),
    }


def _swin(sd, cfg):
    swin = cfg.swin
    pre = "backbone.0"
    params = {
        "patch_embed": {
            "proj": {
                "kernel": _conv(sd, f"{pre}.patch_embed.proj.weight"),
                "bias": _a(sd, f"{pre}.patch_embed.proj.bias"),
            },
            "norm": _ln(sd, f"{pre}.patch_embed.norm"),
        },
        "stages": [],
    }
    for i in range(swin.num_stages):
        stage = {"blocks": []}
        for j in range(swin.depths[i]):
            bp = f"{pre}.layers.{i}.blocks.{j}"
            stage["blocks"].append(
                {
                    "norm1": _ln(sd, f"{bp}.norm1"),
                    "attn": {
                        "qkv": _linear(sd, f"{bp}.attn.qkv"),
                        "proj": _linear(sd, f"{bp}.attn.proj"),
                        "rel_bias_table": _a(
                            sd, f"{bp}.attn.relative_position_bias_table"
                        ),
                    },
                    "norm2": _ln(sd, f"{bp}.norm2"),
                    "fc1": _linear(sd, f"{bp}.mlp.fc1"),
                    "fc2": _linear(sd, f"{bp}.mlp.fc2"),
                }
            )
        if i < swin.num_stages - 1:
            dp = f"{pre}.layers.{i}.downsample"
            stage["downsample"] = {
                "norm": _ln(sd, f"{dp}.norm"),
                "reduction": {"kernel": _t(sd, f"{dp}.reduction.weight")},
            }
        params["stages"].append(stage)
    # per-output norms: named norm{idx} in the reference swin
    for i in swin.out_indices:
        params[f"out_norm{i}"] = _ln(sd, f"{pre}.norm{i}")
    return params


def _bert(sd, cfg):
    b = cfg.bert
    pre = "bert"
    params = {
        "word_emb": _a(sd, f"{pre}.embeddings.word_embeddings.weight"),
        "pos_emb": _a(sd, f"{pre}.embeddings.position_embeddings.weight"),
        "type_emb": _a(sd, f"{pre}.embeddings.token_type_embeddings.weight"),
        "emb_norm": _ln(sd, f"{pre}.embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(b.layers):
        lp = f"{pre}.encoder.layer.{i}"
        params["layers"].append(
            {
                "q": _linear(sd, f"{lp}.attention.self.query"),
                "k": _linear(sd, f"{lp}.attention.self.key"),
                "v": _linear(sd, f"{lp}.attention.self.value"),
                "attn_out": _linear(sd, f"{lp}.attention.output.dense"),
                "attn_norm": _ln(sd, f"{lp}.attention.output.LayerNorm"),
                "fc1": _linear(sd, f"{lp}.intermediate.dense"),
                "fc2": _linear(sd, f"{lp}.output.dense"),
                "out_norm": _ln(sd, f"{lp}.output.LayerNorm"),
            }
        )
    return params


def map_groundingdino_state_dict(
    sd: Dict[str, "np.ndarray"], cfg: GroundingDINOConfig = GDINO_SWINT
):
    """state_dict (torch tensors or numpy arrays, 'module.' prefix stripped)
    -> init_grounding_dino-shaped pytree."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    params = {
        "backbone": _swin(sd, cfg),
        "bert": _bert(sd, cfg),
        "feat_map": _linear(sd, "feat_map"),
        "input_proj": [
            {
                "conv": {
                    "kernel": _conv(sd, f"input_proj.{i}.0.weight"),
                    "bias": _a(sd, f"input_proj.{i}.0.bias"),
                },
                "gn_scale": _a(sd, f"input_proj.{i}.1.weight"),
                "gn_bias": _a(sd, f"input_proj.{i}.1.bias"),
            }
            for i in range(cfg.num_levels)
        ],
        "level_embed": _a(sd, "transformer.level_embed"),
        "enc_layers": [
            {
                "self_attn": _msdeform(sd, f"transformer.encoder.layers.{i}.self_attn"),
                "norm1": _ln(sd, f"transformer.encoder.layers.{i}.norm1"),
                "fc1": _linear(sd, f"transformer.encoder.layers.{i}.linear1"),
                "fc2": _linear(sd, f"transformer.encoder.layers.{i}.linear2"),
                "norm2": _ln(sd, f"transformer.encoder.layers.{i}.norm2"),
            }
            for i in range(cfg.enc_layers)
        ],
        "text_layers": [
            {
                "attn": _mha(
                    sd, f"transformer.encoder.text_layers.{i}.self_attn", cfg.d_model
                ),
                "norm1": _ln(sd, f"transformer.encoder.text_layers.{i}.norm1"),
                "fc1": _linear(sd, f"transformer.encoder.text_layers.{i}.linear1"),
                "fc2": _linear(sd, f"transformer.encoder.text_layers.{i}.linear2"),
                "norm2": _ln(sd, f"transformer.encoder.text_layers.{i}.norm2"),
            }
            for i in range(cfg.enc_layers)
        ],
        "fusion_layers": [
            {
                "norm_v": _ln(sd, f"transformer.encoder.fusion_layers.{i}.layer_norm_v"),
                "norm_l": _ln(sd, f"transformer.encoder.fusion_layers.{i}.layer_norm_l"),
                "v_proj": _linear(sd, f"transformer.encoder.fusion_layers.{i}.attn.v_proj"),
                "l_proj": _linear(sd, f"transformer.encoder.fusion_layers.{i}.attn.l_proj"),
                "values_v_proj": _linear(
                    sd, f"transformer.encoder.fusion_layers.{i}.attn.values_v_proj"
                ),
                "values_l_proj": _linear(
                    sd, f"transformer.encoder.fusion_layers.{i}.attn.values_l_proj"
                ),
                "out_v_proj": _linear(
                    sd, f"transformer.encoder.fusion_layers.{i}.attn.out_v_proj"
                ),
                "out_l_proj": _linear(
                    sd, f"transformer.encoder.fusion_layers.{i}.attn.out_l_proj"
                ),
                "gamma_v": _a(sd, f"transformer.encoder.fusion_layers.{i}.gamma_v"),
                "gamma_l": _a(sd, f"transformer.encoder.fusion_layers.{i}.gamma_l"),
            }
            for i in range(cfg.enc_layers)
        ],
        "enc_output": _linear(sd, "transformer.enc_output"),
        "enc_output_norm": _ln(sd, "transformer.enc_output_norm"),
        "enc_out_bbox_embed": _mlp(sd, "transformer.enc_out_bbox_embed", 3),
        "tgt_embed": _a(sd, "transformer.tgt_embed.weight"),
        "ref_point_head": _mlp(sd, "transformer.decoder.ref_point_head", 2),
        "dec_layers": [
            {
                "self_attn": _mha(
                    sd, f"transformer.decoder.layers.{i}.self_attn", cfg.d_model
                ),
                "norm2": _ln(sd, f"transformer.decoder.layers.{i}.norm2"),
                "ca_text": _mha(
                    sd, f"transformer.decoder.layers.{i}.ca_text", cfg.d_model
                ),
                "catext_norm": _ln(sd, f"transformer.decoder.layers.{i}.catext_norm"),
                "cross_attn": _msdeform(
                    sd, f"transformer.decoder.layers.{i}.cross_attn"
                ),
                "norm1": _ln(sd, f"transformer.decoder.layers.{i}.norm1"),
                "fc1": _linear(sd, f"transformer.decoder.layers.{i}.linear1"),
                "fc2": _linear(sd, f"transformer.decoder.layers.{i}.linear2"),
                "norm3": _ln(sd, f"transformer.decoder.layers.{i}.norm3"),
            }
            for i in range(cfg.dec_layers)
        ],
        "dec_norm": _ln(sd, "transformer.decoder.norm"),
        # dec_pred_bbox_embed_share=True: all bbox_embed.{i} alias one module
        "bbox_embed": _mlp(sd, "bbox_embed.0", 3),
    }
    return params


def load_groundingdino_checkpoint(path: str, cfg: GroundingDINOConfig = GDINO_SWINT):
    """Load the official .pth checkpoint (torch.save format)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return map_groundingdino_state_dict(sd, cfg)
