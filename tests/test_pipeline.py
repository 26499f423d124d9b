import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.models.clip_text import (
    CLIPTextConfig,
    StubTokenizer,
    init_clip_text,
)
from motioneditor_tpu.models.controlnet import init_controlnet
from motioneditor_tpu.models.unet import UNetConfig, init_unet
from motioneditor_tpu.models.vae import VAEConfig, init_vae
from motioneditor_tpu.pipelines.editor import MotionEditorPipeline
from motioneditor_tpu.schedulers import DiffusionSchedule

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

TINY_UNET = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=24,
    use_sc_attn=True,
)
TINY_VAE = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=4)
TINY_TEXT = CLIPTextConfig(
    vocab_size=50000, hidden_size=24, num_layers=2, num_heads=4,
    intermediate_size=48, max_position_embeddings=77,
)


@pytest.fixture(scope="module")
def pipe():
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    return MotionEditorPipeline(
        unet_params=init_unet(keys[0], TINY_UNET),
        vae_params=init_vae(keys[1], TINY_VAE),
        text_params=init_clip_text(keys[2], TINY_TEXT),
        controlnet_params=init_controlnet(
            keys[3],
            dataclasses.replace(TINY_UNET, video=False, use_sc_attn=False),
        ),
        tokenizer=StubTokenizer(),
        unet_config=TINY_UNET,
        vae_config=TINY_VAE,
        text_config=TINY_TEXT,
        use_flash=False,
    )


def test_encode_decode_roundtrip_shapes(pipe):
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 64, 64, 3)) * 2 - 1
    lat = pipe.encode_video(video, sample=False)
    assert lat.shape == (1, 2, 8, 8, 4)
    out = pipe.decode_latents(lat)
    assert out.shape == video.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_ddim_invert_runs(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    inv = pipe.ddim_invert(lat, prompt="", num_inv_steps=4, normal_infer=True)
    assert inv.shape == lat.shape
    assert np.isfinite(np.asarray(inv)).all()
    # inversion adds noise: magnitude should grow toward the prior
    assert float(jnp.std(inv)) > float(jnp.std(lat)) * 0.5


def test_invert_scan_trajectory_indexing(pipe):
    """The inversion scan's trajectory bookkeeping must match a manual loop:
    all_lat[i+1] = ddim_inverse_step(eps(all_lat[i], ts[n-i-1])) — the
    index-reversal at util.py:120 is the classic off-by-one trap."""
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    n = 4
    inv, all_lat = pipe.ddim_invert(
        lat, prompt="x", num_inv_steps=n, normal_infer=False, return_all=True
    )
    assert all_lat.shape[0] == n + 1
    np.testing.assert_allclose(np.asarray(all_lat[0]), np.asarray(lat), atol=1e-6)
    np.testing.assert_allclose(np.asarray(all_lat[-1]), np.asarray(inv), atol=1e-6)

    from motioneditor_tpu.models.unet import unet_apply
    from motioneditor_tpu.schedulers import ddim_inverse_step

    cond = pipe.encode_prompt(["x"])
    ts = pipe.schedule.inference_timesteps(n)
    cur = lat
    for i in range(n):
        t = jnp.asarray(ts[n - i - 1])  # ascending: [1, 21, ...] order
        eps = unet_apply(pipe.unet_params, TINY_UNET, cur, t, cond, use_flash=False)
        cur = ddim_inverse_step(pipe.schedule, eps, t, cur, n)
        np.testing.assert_allclose(
            np.asarray(all_lat[i + 1]), np.asarray(cur), atol=5e-4
        )


def test_null_text_inversion_shapes(pipe):
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    x_t, uncond = pipe.null_text_inversion(lat, "a girl is dancing", num_steps=3)
    assert x_t.shape == lat.shape
    assert uncond.shape[0] == 3
    assert np.isfinite(np.asarray(uncond)).all()


def test_null_text_early_stop(pipe):
    """The inner Adam loop breaks on loss < epsilon + i*2e-5
    (null_text_optimization.py:159-162): a huge epsilon makes inner_steps=5
    run exactly one update — identical to inner_steps=1 — while a negative
    epsilon (never trips) must keep iterating and diverge from it."""
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    kw = dict(num_steps=2, null_base_lr=1e-1)
    _, u_one = pipe.null_text_inversion(
        lat, "a girl", null_inner_steps=1, early_stop_epsilon=-1.0, **kw
    )
    _, u_stopped = pipe.null_text_inversion(
        lat, "a girl", null_inner_steps=5, early_stop_epsilon=1e9, **kw
    )
    _, u_full = pipe.null_text_inversion(
        lat, "a girl", null_inner_steps=5, early_stop_epsilon=-1.0, **kw
    )
    np.testing.assert_allclose(np.asarray(u_stopped), np.asarray(u_one), atol=1e-6)
    assert not np.allclose(np.asarray(u_full), np.asarray(u_one), atol=1e-6)


def test_two_branch_edit_end_to_end(pipe):
    """Full __call__: 2 branches, injection from step 1, masks, controlnet."""
    f = 2
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, f, 8, 8, 4)) * 0.2
    seed = jnp.concatenate([lat, lat], axis=0)
    skel = jax.random.uniform(jax.random.PRNGKey(2), (f, 64, 64, 3))
    masks = (jax.random.uniform(jax.random.PRNGKey(3), (f, 64, 64)) > 0.5).astype(
        jnp.float32
    )
    out = pipe(
        ["a girl is dancing", "a man is dancing"],
        seed,
        skel,
        source_masks=masks,
        num_inference_steps=4,
        start_step=2,
        start_layer=10,
    )
    assert out.shape == (2, f, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # the two branches must differ (different prompts + injection asymmetry)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
