import pytest
import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.eval.metrics import psnr, ssim, temporal_consistency
from motioneditor_tpu.eval.lpips import init_lpips, lpips, ALEX_CONVS

pytestmark = pytest.mark.slow  # CLIP tower / LPIPS backbone compiles (see pytest.ini)


def test_psnr_identity_and_noise():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    assert float(psnr(x, x)) > 100
    y = jnp.clip(x + 0.1, 0, 1)
    v = float(psnr(x, y))
    assert 15 < v < 25


def test_ssim_bounds():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    assert float(ssim(x, x)) > 0.999
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    assert float(ssim(x, y)) < 0.3


def test_temporal_consistency():
    still = jnp.broadcast_to(
        jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 8, 3)), (4, 8, 8, 3)
    )
    assert float(temporal_consistency(still)) == 1.0
    noisy = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3))
    assert float(temporal_consistency(noisy)) < 0.8


def test_lpips_shape_and_zero_self():
    params = init_lpips(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    d = float(lpips(params, x, x))
    assert abs(d) < 1e-6
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    assert float(lpips(params, x, y)) > 0


def test_alexnet_tap_shapes_match_torchvision():
    """The conv taps must mirror torchvision alexnet.features so ported
    weights line up."""
    import torch

    tv = torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 11, 4, 2), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(64, 192, 5, 1, 2), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2),
        torch.nn.Conv2d(192, 384, 3, 1, 1), torch.nn.ReLU(),
        torch.nn.Conv2d(384, 256, 3, 1, 1), torch.nn.ReLU(),
        torch.nn.Conv2d(256, 256, 3, 1, 1), torch.nn.ReLU(),
    )
    x = torch.zeros(1, 3, 64, 64)
    shapes = []
    h = x
    for m in tv:
        h = m(h)
        if isinstance(m, torch.nn.ReLU):
            shapes.append(tuple(h.shape))
    from motioneditor_tpu.eval.lpips import _alexnet_features

    params = init_lpips(jax.random.PRNGKey(0))
    feats = _alexnet_features(params, jnp.zeros((1, 64, 64, 3)))
    for f, s in zip(feats, shapes):
        assert f.shape == (s[0], s[2], s[3], s[1]), (f.shape, s)


def test_clip_image_tower_shapes():
    from motioneditor_tpu.models.clip_image import (
        CLIPImageConfig,
        clip_image_embed,
        init_clip_image,
        preprocess_clip,
    )

    cfg = CLIPImageConfig(
        image_size=28, patch_size=14, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, projection_dim=16,
    )
    params = init_clip_image(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (3, 40, 40, 3))
    pixels = preprocess_clip(video, size=28)
    emb = clip_image_embed(params, pixels, cfg)
    assert emb.shape == (3, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_clip_text_embed_pools_at_eot():
    from motioneditor_tpu.models.clip_text import (
        CLIPTextConfig,
        clip_text_embed,
        init_clip_text,
    )

    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=16, num_layers=1,
                         num_heads=4, intermediate_size=32,
                         max_position_embeddings=8)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[5, 7, 999, 3, 3, 3, 3, 3]])  # eot=max id at pos 2
    emb = clip_text_embed(params, ids, cfg)
    assert emb.shape == (1, 16)
    # changing a token AFTER the eot position must not affect the pooled emb
    ids2 = ids.at[0, 5].set(11)
    emb2 = clip_text_embed(params, ids2, cfg)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-5)
