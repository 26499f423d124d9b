"""Torch checkpoint -> JAX pytree weight porting.

Loads the pretrained stacks the reference depends on (README.md:39-46):
SD-1.5 (unet / vae / text_encoder subfolders), sd-controlnet-openpose, the
stage-1 fine-tune state, and the stand-alone adapter state_dict saved by
train_adaptor.py:397-399.

Conventions: torch Linear (out,in) -> kernel (in,out); Conv2d OIHW -> HWIO;
Conv1d OIW -> WIO (temporal convs). Modules absent from a checkpoint (the
zero-initialized temporal inflation modules) keep their zero init so a
freshly ported UNet reproduces per-frame SD-1.5 exactly — the invariant the
reference relies on (resnet_2d.py:15-16, attention_2d.py:462).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pth (torch) or .safetensors state dict as numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}


def find_model_file(model_dir: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ):
        p = osp.join(model_dir, name)
        if osp.isfile(p):
            return p
    raise FileNotFoundError(f"no model weights found in {model_dir}")


def _lin(sd, prefix):
    p = {"kernel": jnp.asarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _conv(sd, prefix):
    p = {"kernel": jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _conv1d(sd, prefix):
    return {
        "kernel": jnp.asarray(sd[prefix + ".weight"].transpose(2, 1, 0)),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _norm(sd, prefix):
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _attn(sd, prefix):
    out_key = prefix + ".to_out.0" if prefix + ".to_out.0.weight" in sd else prefix + ".to_out"
    return {
        "to_q": _lin(sd, prefix + ".to_q"),
        "to_k": _lin(sd, prefix + ".to_k"),
        "to_v": _lin(sd, prefix + ".to_v"),
        "to_out": _lin(sd, out_key),
    }


def _ff(sd, prefix):
    return {
        "proj_in": _lin(sd, prefix + ".net.0.proj"),
        "proj_out": _lin(sd, prefix + ".net.2"),
    }


def _merge(dst: dict, src: dict) -> dict:
    """Recursively overwrite dst leaves with src where present."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _basic_transformer_block(sd, prefix, video: bool):
    p = {
        "norm1": _norm(sd, prefix + ".norm1"),
        "attn1": _attn(sd, prefix + ".attn1"),
        "norm2": _norm(sd, prefix + ".norm2"),
        "attn2": _attn(sd, prefix + ".attn2"),
        "norm3": _norm(sd, prefix + ".norm3"),
        "ff": _ff(sd, prefix + ".ff"),
    }
    if video and prefix + ".attn_temp.to_q.weight" in sd:
        p["attn_temp"] = _attn(sd, prefix + ".attn_temp")
        p["norm_temp"] = _norm(sd, prefix + ".norm_temp")
    return p


def _transformer2d(sd, prefix, video: bool):
    return {
        "norm": _norm(sd, prefix + ".norm"),
        "proj_in": _conv(sd, prefix + ".proj_in"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
        "blocks": [_basic_transformer_block(sd, prefix + ".transformer_blocks.0", video)],
    }


def _resnet(sd, prefix, video: bool):
    p = {
        "norm1": _norm(sd, prefix + ".norm1"),
        "conv1": _conv(sd, prefix + ".conv1"),
        "norm2": _norm(sd, prefix + ".norm2"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }
    if prefix + ".time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, prefix + ".time_emb_proj")
    if prefix + ".conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, prefix + ".conv_shortcut")
    if video and prefix + ".temp_conv1.weight" in sd:
        p["temp_conv1"] = _conv1d(sd, prefix + ".temp_conv1")
        p["temp_conv2"] = _conv1d(sd, prefix + ".temp_conv2")
    return p


def port_unet(sd: Dict[str, np.ndarray], video: bool = True) -> dict:
    """diffusers UNet2DConditionModel (or the reference's inflated variant)
    state dict -> unet params overlay. Use with ``load_sd15_unet`` to merge
    over a zero-init video pytree."""
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
        "up_blocks": [],
    }
    # absent in ControlNet state dicts (encoder-only; port_controlnet reuses
    # this function) — a real diffusers ControlNetModel has no output head
    if "conv_norm_out.weight" in sd:
        p["conv_norm_out"] = _norm(sd, "conv_norm_out")
    if "conv_out.weight" in sd:
        p["conv_out"] = _conv(sd, "conv_out")
    for i in range(4):
        pre = f"down_blocks.{i}"
        block = {"resnets": [], "attentions": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}", video))
            j += 1
        j = 0
        while f"{pre}.attentions.{j}.norm.weight" in sd:
            block["attentions"].append(_transformer2d(sd, f"{pre}.attentions.{j}", video))
            j += 1
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            block["downsamplers"] = [_conv(sd, f"{pre}.downsamplers.0.conv")]
        p["down_blocks"].append(block)

    p["mid_block"] = {
        "resnets": [
            _resnet(sd, "mid_block.resnets.0", video),
            _resnet(sd, "mid_block.resnets.1", video),
        ],
        "attentions": [_transformer2d(sd, "mid_block.attentions.0", video)],
    }
    for i in range(4):
        pre = f"up_blocks.{i}"
        block = {"resnets": [], "attentions": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(_resnet(sd, f"{pre}.resnets.{j}", video))
            j += 1
        j = 0
        while f"{pre}.attentions.{j}.norm.weight" in sd:
            block["attentions"].append(_transformer2d(sd, f"{pre}.attentions.{j}", video))
            j += 1
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            block["upsamplers"] = [_conv(sd, f"{pre}.upsamplers.0.conv")]
        p["up_blocks"].append(block)

    if "controlnet_adapter.body.0.block1.weight" in sd:
        p["controlnet_adapter"] = port_adapter(
            {k[len("controlnet_adapter."):]: v for k, v in sd.items()
             if k.startswith("controlnet_adapter.")}
        )
    return p


def port_adapter(sd: Dict[str, np.ndarray]) -> dict:
    """ControlAdapter state_dict (train_adaptor.py:397-399 .pth) -> params."""
    body = []
    i = 0
    while f"body.{i}.block1.weight" in sd:
        pre = f"body.{i}"
        body.append(
            {
                "block1": _conv1d(sd, pre + ".block1"),
                "block2": _conv1d(sd, pre + ".block2"),
                "norm_temp": _norm(sd, pre + ".norm_temp"),
                "attn_temp": _attn(sd, pre + ".attn_temp"),
                "cross_pose_norm": _norm(sd, pre + ".cross_pose_norm"),
                "attn_pose": _attn(sd, pre + ".attn_pose"),
                "ff_norm": _norm(sd, pre + ".ff_norm"),
                "ff": _ff(sd, pre + ".ff"),
                "norm_self_temp": _norm(sd, pre + ".norm_self_temp"),
                "attn_self_temp": _attn(sd, pre + ".attn_self_temp"),
            }
        )
        i += 1
    return {"body": body}


def port_controlnet(sd: Dict[str, np.ndarray]) -> dict:
    p = port_unet(sd, video=False)
    p.pop("conv_norm_out", None)
    p.pop("conv_out", None)
    p.pop("up_blocks", None)
    emb = {
        "conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
        "blocks": [],
        "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out"),
    }
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        emb["blocks"].append(_conv(sd, f"controlnet_cond_embedding.blocks.{i}"))
        i += 1
    p["controlnet_cond_embedding"] = emb
    zero = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        zero.append(_conv(sd, f"controlnet_down_blocks.{i}"))
        i += 1
    p["controlnet_down_blocks"] = zero
    p["controlnet_mid_block"] = _conv(sd, "controlnet_mid_block")
    return p


def _vae_attention(sd, prefix):
    # diffusers renamed query/key/value/proj_attn -> to_q/to_k/to_v/to_out.0
    if prefix + ".to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")
    def lin2(name):
        w = sd[prefix + "." + name + ".weight"]
        if w.ndim == 4:  # some versions store 1x1 convs
            w = w[:, :, 0, 0]
        return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(sd[prefix + "." + name + ".bias"])}
    return {
        "group_norm": _norm(
            sd, prefix + (".group_norm" if prefix + ".group_norm.weight" in sd else ".norm")
        ),
        "to_q": lin2(names[0]),
        "to_k": lin2(names[1]),
        "to_v": lin2(names[2]),
        "to_out": lin2(names[3]),
    }


def port_vae(sd: Dict[str, np.ndarray]) -> dict:
    def res(prefix):
        return _resnet(sd, prefix, video=False)

    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "down_blocks": [],
        "mid_block": {
            "resnets": [res("encoder.mid_block.resnets.0"), res("encoder.mid_block.resnets.1")],
            "attentions": [_vae_attention(sd, "encoder.mid_block.attentions.0")],
        },
    }
    for i in range(4):
        pre = f"encoder.down_blocks.{i}"
        block = {"resnets": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(res(f"{pre}.resnets.{j}"))
            j += 1
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            block["downsamplers"] = [_conv(sd, f"{pre}.downsamplers.0.conv")]
        enc["down_blocks"].append(block)

    dec = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "up_blocks": [],
        "mid_block": {
            "resnets": [res("decoder.mid_block.resnets.0"), res("decoder.mid_block.resnets.1")],
            "attentions": [_vae_attention(sd, "decoder.mid_block.attentions.0")],
        },
    }
    for i in range(4):
        pre = f"decoder.up_blocks.{i}"
        block = {"resnets": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            block["resnets"].append(res(f"{pre}.resnets.{j}"))
            j += 1
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            block["upsamplers"] = [_conv(sd, f"{pre}.upsamplers.0.conv")]
        dec["up_blocks"].append(block)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def port_clip_text(sd: Dict[str, np.ndarray]) -> dict:
    pre = "text_model." if "text_model.embeddings.token_embedding.weight" in sd else ""
    p = {
        "token_embedding": jnp.asarray(sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": _norm(sd, pre + "final_layer_norm"),
        "layers": [],
    }
    if "text_projection.weight" in sd:  # openai CLIP ckpt (for CLIP-score eval)
        p["text_projection"] = {"kernel": jnp.asarray(sd["text_projection.weight"].T)}
    i = 0
    while f"{pre}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = f"{pre}encoder.layers.{i}"
        p["layers"].append(
            {
                "layer_norm1": _norm(sd, lp + ".layer_norm1"),
                "q_proj": _lin(sd, lp + ".self_attn.q_proj"),
                "k_proj": _lin(sd, lp + ".self_attn.k_proj"),
                "v_proj": _lin(sd, lp + ".self_attn.v_proj"),
                "out_proj": _lin(sd, lp + ".self_attn.out_proj"),
                "layer_norm2": _norm(sd, lp + ".layer_norm2"),
                "fc1": _lin(sd, lp + ".mlp.fc1"),
                "fc2": _lin(sd, lp + ".mlp.fc2"),
            }
        )
        i += 1
    return p


# -- top-level loaders -------------------------------------------------------


def load_sd15_unet(pretrained_model_path: str, config=None, key=None):
    """Load SD-1.5 unet weights merged over a zero-init inflated video UNet."""
    import jax

    from motioneditor_tpu.models.unet import UNetConfig, init_unet

    config = config or UNetConfig()
    base = init_unet(key or jax.random.PRNGKey(0), config)
    sd = _load_state_dict(find_model_file(osp.join(pretrained_model_path, "unet")))
    overlay = port_unet(sd, video=config.video)
    return _merge(base, overlay)


def load_sd15_vae(pretrained_model_path: str):
    sd = _load_state_dict(find_model_file(osp.join(pretrained_model_path, "vae")))
    return port_vae(sd)


def load_sd15_text_encoder(pretrained_model_path: str):
    sd = _load_state_dict(
        find_model_file(osp.join(pretrained_model_path, "text_encoder"))
    )
    return port_clip_text(sd)


def load_controlnet(controlnet_path: str):
    sd = _load_state_dict(find_model_file(controlnet_path))
    return port_controlnet(sd)


def load_adapter_checkpoint(path: str):
    """Stand-alone adapter .pth saved by train_adaptor (inference.py:238-240)."""
    return port_adapter(_load_state_dict(path))
