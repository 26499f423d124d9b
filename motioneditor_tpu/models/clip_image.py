"""CLIP image tower (ViT-L/14) for evaluation metrics (CLIP score / frame
consistency). The reference repo doesn't ship this model; the paper's
quality numbers use it (SURVEY §6). Weights load from an openai
clip-vit-large-patch14 checkpoint via ``port_clip_image``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.models.layers import (
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    quick_gelu,
)

# openai CLIP normalization
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPImageConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def init_clip_image(key, config: CLIPImageConfig = CLIPImageConfig()):
    c = config
    keys = iter(jax.random.split(key, 8 + 8 * c.num_layers))
    params = {
        "class_embedding": jax.random.normal(next(keys), (c.hidden_size,)) * 0.02,
        "patch_embedding": jax.random.normal(
            next(keys), (c.patch_size, c.patch_size, 3, c.hidden_size)
        )
        * 0.02,
        "position_embedding": jax.random.normal(
            next(keys), (c.num_patches + 1, c.hidden_size)
        )
        * 0.01,
        "pre_layernorm": init_layer_norm(c.hidden_size),
        "post_layernorm": init_layer_norm(c.hidden_size),
        "visual_projection": {"kernel": jax.random.normal(
            next(keys), (c.hidden_size, c.projection_dim)) * 0.02},
        "layers": [],
    }
    for _ in range(c.num_layers):
        params["layers"].append(
            {
                "layer_norm1": init_layer_norm(c.hidden_size),
                "q_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "k_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "v_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "out_proj": init_linear(next(keys), c.hidden_size, c.hidden_size),
                "layer_norm2": init_layer_norm(c.hidden_size),
                "fc1": init_linear(next(keys), c.hidden_size, c.intermediate_size),
                "fc2": init_linear(next(keys), c.intermediate_size, c.hidden_size),
            }
        )
    return params


def preprocess_clip(video: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[..., H, W, 3] in [0,1] -> CLIP-normalized [..., size, size, 3]."""
    x = jax.image.resize(
        video, video.shape[:-3] + (size, size, 3), method="bilinear"
    )
    return (x - CLIP_MEAN) / CLIP_STD


def clip_image_embed(
    params, pixels: jnp.ndarray, config: CLIPImageConfig = CLIPImageConfig()
) -> jnp.ndarray:
    """pixels: [B, 224, 224, 3] normalized -> projected embeddings [B, 768]."""
    c = config
    b = pixels.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embedding"].astype(pixels.dtype),
        (c.patch_size, c.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    tokens = patches.reshape(b, -1, c.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, c.hidden_size))
    x = jnp.concatenate([cls.astype(tokens.dtype), tokens], axis=1)
    x = x + params["position_embedding"]
    x = layer_norm(params["pre_layernorm"], x, eps=c.layer_norm_eps)

    heads = c.num_heads
    dim_head = c.hidden_size // heads
    scale = dim_head**-0.5
    t = x.shape[1]
    for lp in params["layers"]:
        h = layer_norm(lp["layer_norm1"], x, eps=c.layer_norm_eps)
        q = linear(lp["q_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        k = linear(lp["k_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        v = linear(lp["v_proj"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores * scale, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, c.hidden_size)
        x = x + linear(lp["out_proj"], attn)
        h = layer_norm(lp["layer_norm2"], x, eps=c.layer_norm_eps)
        x = x + linear(lp["fc2"], quick_gelu(linear(lp["fc1"], h)))

    pooled = layer_norm(params["post_layernorm"], x[:, 0], eps=c.layer_norm_eps)
    return pooled @ params["visual_projection"]["kernel"].astype(pooled.dtype)


def port_clip_image(sd) -> dict:
    """HF CLIPVisionModelWithProjection state dict -> params."""
    from motioneditor_tpu.models.weights import _lin, _norm

    pre = "vision_model."
    p = {
        "class_embedding": jnp.asarray(sd[pre + "embeddings.class_embedding"]),
        "patch_embedding": jnp.asarray(
            sd[pre + "embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        ),
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]
        ),
        "pre_layernorm": _norm(sd, pre + "pre_layrnorm")
        if pre + "pre_layrnorm.weight" in sd
        else _norm(sd, pre + "pre_layernorm"),
        "post_layernorm": _norm(sd, pre + "post_layernorm"),
        "visual_projection": {"kernel": jnp.asarray(sd["visual_projection.weight"].T)},
        "layers": [],
    }
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
