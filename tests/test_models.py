import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply
from motioneditor_tpu.models.controlnet import controlnet_apply, init_controlnet
from motioneditor_tpu.models.adapter import (
    adapter_block_channels,
    control_adapter_apply,
    init_control_adapter,
)
from motioneditor_tpu.models.vae import (
    VAEConfig,
    init_vae,
    vae_decode_video,
    vae_encode_video,
)
from motioneditor_tpu.models.clip_text import (
    CLIPTextConfig,
    StubTokenizer,
    clip_text_apply,
    init_clip_text,
    tokenize,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=16,
    use_sc_attn=True,
)


@pytest.fixture(scope="module")
def tiny_unet():
    params = init_unet(jax.random.PRNGKey(0), TINY)
    return params


def _res_sample_channels(cfg):
    c = cfg.block_out_channels
    return [c[0], c[0], c[0], c[0], c[1], c[1], c[1], c[2], c[2], c[2], c[3], c[3]]


def test_unet_forward_shape(tiny_unet):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    t = jnp.asarray(10)
    out = unet_apply(tiny_unet, TINY, x, t, enc, use_flash=False)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unet_zero_init_video_equals_per_frame(tiny_unet):
    """Zero-init temporal modules + normal_infer make the video UNet an exact
    per-frame 2D SD UNet on *identical* frames (resnet_2d.py:15-16,
    attention_2d.py:462). The reference's resnet GroupNorm pools stats across
    frames (torch GN on [B,C,F,H,W], resnet_2d.py:160/176), so the per-frame
    equality only holds when every frame is the same — with identical frames
    the pooled stats equal the per-frame stats."""
    frame = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16, 4))
    x = jnp.broadcast_to(frame, (1, 3, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(500)
    out_video = unet_apply(tiny_unet, TINY, x, t, enc, normal_infer=True, use_flash=False)
    out_f = unet_apply(tiny_unet, TINY, frame, t, enc, normal_infer=True, use_flash=False)
    for f in range(3):
        np.testing.assert_allclose(
            np.asarray(out_video[:, f]), np.asarray(out_f[:, 0]), atol=2e-4
        )


def test_unet_motion_frame_differs_after_frame0(tiny_unet):
    """MOTION_FRAME attn1 equals NORMAL on identical frames (duplicated K/V
    renormalizes to the same probabilities) and differs on distinct frames."""
    frame = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16, 4))
    same = jnp.broadcast_to(frame, (1, 3, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(500)
    out_mf_same = unet_apply(tiny_unet, TINY, same, t, enc, normal_infer=False, use_flash=False)
    out_n_same = unet_apply(tiny_unet, TINY, same, t, enc, normal_infer=True, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_mf_same), np.asarray(out_n_same), atol=2e-4
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16, 4))
    out_mf = unet_apply(tiny_unet, TINY, x, t, enc, normal_infer=False, use_flash=False)
    out_n = unet_apply(tiny_unet, TINY, x, t, enc, normal_infer=True, use_flash=False)
    assert not np.allclose(np.asarray(out_mf[:, 1]), np.asarray(out_n[:, 1]), atol=1e-3)


def test_controlnet_zero_init_outputs_zero():
    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64),
        norm_num_groups=8,
        attention_heads=4,
        cross_attention_dim=16,
        video=False,
        use_sc_attn=False,
    )
    params = init_controlnet(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 4))
    cond = jax.random.uniform(jax.random.PRNGKey(2), (2, 2, 128, 128, 3))
    enc = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 16))
    down, mid = controlnet_apply(params, cfg, lat, jnp.asarray(5), enc, cond,
                                 use_flash=False)
    assert len(down) == 12
    for d in down:
        np.testing.assert_array_equal(np.asarray(d), 0.0)
    np.testing.assert_array_equal(np.asarray(mid), 0.0)
    # spatial pyramid: 16,16,16,16(ds->8)...
    assert down[0].shape == (2, 2, 16, 16, 32)
    assert down[3].shape == (2, 2, 8, 8, 32)
    assert mid.shape == (2, 2, 2, 2, 64)


def test_adapter_channel_map():
    assert [adapter_block_channels(i) for i in range(12)] == [
        320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280,
    ]


def test_adapter_forward():
    chans = (32, 64, 64, 64)
    params = init_control_adapter(jax.random.PRNGKey(0), chans)
    cfg_ch = _res_sample_channels(UNetConfig(block_out_channels=chans))
    sizes = [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    x_list = [
        jax.random.normal(jax.random.PRNGKey(i), (2, 2, s, s, ch))
        for i, (s, ch) in enumerate(zip(sizes, cfg_ch))
    ]
    src = [
        jax.random.normal(jax.random.PRNGKey(100 + i), (2, 2, s, s, ch))
        for i, (s, ch) in enumerate(zip(sizes, cfg_ch))
    ]
    out = control_adapter_apply(params, x_list, src, use_flash=False)
    assert len(out) == 12
    for o, x in zip(out, x_list):
        assert o.shape == x.shape
        assert np.isfinite(np.asarray(o)).all()


def test_unet_with_adapter_batch4(tiny_unet):
    """Batch-4 plumbing: adapter residuals land on edit rows [1,3] only;
    reconstruction rows get zero residual + zero mid
    (unet_2d_condition.py:477-494, pipeline:628-629)."""
    cfg = TINY
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 16))
    t = jnp.asarray(100)
    cfg_ch = _res_sample_channels(cfg)
    sizes = [16, 16, 16, 8, 8, 8, 4, 4, 4, 2, 2, 2]
    down_res = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (2, 2, s, s, ch)) * 0.1
        for i, (s, ch) in enumerate(zip(sizes, cfg_ch))
    ]
    mid4 = jnp.concatenate(
        [
            jnp.zeros((1, 2, 2, 2, 64)),
            jax.random.normal(jax.random.PRNGKey(50), (1, 2, 2, 2, 64)) * 0.1,
        ]
        * 2,
        axis=0,
    )
    out = unet_apply(
        tiny_unet, cfg, x, t, enc,
        down_block_additional_residuals=down_res,
        mid_block_additional_residual=mid4,
        use_flash=False,
    )
    assert out.shape == x.shape
    # without residuals, recon rows must be unchanged (their residual is zero
    # only if mid is zero for them AND adapter zeros rows 0,2)
    out_plain = unet_apply(tiny_unet, cfg, x, t, enc, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[jnp.array([0, 2])]),
        np.asarray(out_plain[jnp.array([0, 2])]),
        atol=2e-4,
    )
    assert not np.allclose(
        np.asarray(out[jnp.array([1, 3])]), np.asarray(out_plain[jnp.array([1, 3])]),
        atol=1e-3,
    )


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=4)
    params = init_vae(jax.random.PRNGKey(0), cfg)
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 64, 64, 3)) * 2 - 1
    lat = vae_encode_video(params, video, sample=False, config=cfg)
    assert lat.shape == (1, 2, 8, 8, 4)
    img = vae_decode_video(params, lat, config=cfg)
    assert img.shape == video.shape
    assert np.isfinite(np.asarray(img)).all()


def test_clip_text_causal():
    cfg = CLIPTextConfig(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
                         intermediate_size=64, max_position_embeddings=16)
    params = init_clip_text(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]]) % 1000
    out = clip_text_apply(params, ids, cfg)
    assert out.shape == (1, 16, 32)
    ids2 = ids.at[0, 10].set(999)
    out2 = clip_text_apply(params, ids2, cfg)
    np.testing.assert_allclose(np.asarray(out[:, :10]), np.asarray(out2[:, :10]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 10:]), np.asarray(out2[:, 10:]))


def test_stub_tokenizer():
    tok = StubTokenizer()
    ids = tokenize(tok, ["a girl is dancing", "a man is dancing"])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos_token_id
    # same prompt -> same ids; different prompt -> different
    ids2 = tokenize(tok, ["a girl is dancing"])
    np.testing.assert_array_equal(np.asarray(ids[0]), np.asarray(ids2[0]))
    assert not np.array_equal(np.asarray(ids[0]), np.asarray(ids[1]))
