import pytest
import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.injection import (
    InjectionSpec,
    aggregate_cross_attn_mask,
    injected_spatial_attention_auto,
)
from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply
from motioneditor_tpu.ops.attention import init_attention

pytestmark = pytest.mark.slow  # auto-mask UNet forward compiles ~6 min (see pytest.ini)

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=16,
)


def test_aggregate_cross_attn_mask():
    f = 2
    maps = []
    for _ in range(3):
        m = jnp.zeros((4 * f, 256, 77))
        # light up token 1 on the top-left quadrant for cond-edit rows
        m = m.at[3 * f :, :64, 1].set(1.0)
        maps.append(m)
    mask = aggregate_cross_attn_mask(maps, (1,), res=16, thres=0.1)
    assert mask.shape == (f, 256, 1)
    got = np.asarray(mask).reshape(f, 16, 16)
    assert got[:, :4, :].max() == 1.0  # top rows (first 64 of 256) lit
    assert got[:, 8:, :].max() == 0.0


def test_injected_auto_no_maps_falls_back_to_mutual():
    heads = 2
    params = init_attention(jax.random.PRNGKey(0), query_dim=8, heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16, 8))
    from motioneditor_tpu.control.injection import injected_spatial_attention

    out_auto = injected_spatial_attention_auto(
        params, x, heads, None, [], (1,), 0.1, use_flash=False
    )
    out_mutual = injected_spatial_attention(
        params, x, heads, None, mask_fgbg=False, use_flash=False
    )
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_mutual), atol=1e-5)


def test_injected_auto_with_maps_oracle():
    """With maps present: fg/bg attention over masked source K AND V,
    recomposed by the auto mask (fully_control.py:178-255, :302-325)."""
    heads = 2
    f, n, c = 2, 16, 8
    params = init_attention(jax.random.PRNGKey(0), query_dim=c, heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, f, n, c))
    src_mask = (jax.random.uniform(jax.random.PRNGKey(2), (f, n, 1)) > 0.5).astype(
        jnp.float32
    )
    maps = [jax.random.uniform(jax.random.PRNGKey(3), (4 * f, 256, 77))]
    out = injected_spatial_attention_auto(
        params, x, heads, src_mask, maps, (1,), 0.5, use_flash=False
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # source rows must equal the plain-mask editor's source rows
    from motioneditor_tpu.control.injection import injected_spatial_attention

    out_mask = injected_spatial_attention(
        params, x, heads, src_mask, True, use_flash=False
    )
    np.testing.assert_allclose(
        np.asarray(out[np.array([0, 2])]),
        np.asarray(out_mask[np.array([0, 2])]),
        atol=1e-5,
    )


def test_unet_auto_mode_runs():
    """End-to-end UNet forward with mask_mode='auto' — maps collected at the
    16x16 layers feed later injected layers within the same trace."""
    params = init_unet(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 16))
    spec = InjectionSpec.from_start_layer(10, mask_mode="auto", auto_token_idx=(1,))
    # masks at the attn resolutions of the tiny net (16->2 latents)
    from motioneditor_tpu.control.injection import prepare_injection_masks

    masks = prepare_injection_masks(
        jnp.ones((2, 16, 16)), 2,
        resolutions=((16, 16), (8, 8), (4, 4), (2, 2)),
    )
    out = unet_apply(
        params, TINY, x, jnp.asarray(100), enc,
        injection=spec, injection_masks=masks, use_flash=False,
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
