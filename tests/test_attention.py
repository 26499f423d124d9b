import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.ops.attention import (
    DENSE,
    MOTION_FRAME,
    NORMAL,
    SPARSE_CAUSAL,
    causal_temporal_bias,
    cross_attention,
    init_attention,
    select_kv,
    spatial_self_attention,
    split_heads,
    merge_heads,
    sdpa,
    temporal_self_attention,
)


def _numpy_attention(q, k, v, scale):
    """NumPy oracle: [H, N, D] per batch."""
    s = np.einsum("hqd,hkd->hqk", q, k) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hqk,hkd->hqd", p, v)


def test_select_kv_sparse_causal():
    """K/V = [frame0, prev frame] (attention_2d.py:573-580)."""
    x = jnp.arange(2 * 4 * 3 * 1, dtype=jnp.float32).reshape(2, 4, 3, 1)
    out = np.asarray(select_kv(x, SPARSE_CAUSAL))
    xn = np.asarray(x)
    for f in range(4):
        prev = max(f - 1, 0)
        expected = np.concatenate([xn[:, 0], xn[:, prev]], axis=1)
        np.testing.assert_array_equal(out[:, f], expected)


def test_select_kv_motion_frame():
    """K/V = [prev frame, current frame] (attention_2d.py:732-740)."""
    x = jnp.arange(2 * 4 * 3 * 1, dtype=jnp.float32).reshape(2, 4, 3, 1)
    out = np.asarray(select_kv(x, MOTION_FRAME))
    xn = np.asarray(x)
    for f in range(4):
        prev = max(f - 1, 0)
        expected = np.concatenate([xn[:, prev], xn[:, f]], axis=1)
        np.testing.assert_array_equal(out[:, f], expected)


def test_select_kv_dense():
    """K/V = all frames (attention_2d.py:651-657)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 3, 5))
    out = np.asarray(select_kv(x, DENSE))
    xn = np.asarray(x).reshape(2, 12, 5)
    for f in range(4):
        np.testing.assert_array_equal(out[:, f], xn)


def test_sdpa_vs_numpy():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 4, 16, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 24, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 24, 8))
    out = np.asarray(sdpa(q, k, v, 0.125, use_flash=False))
    for b in range(2):
        ref = _numpy_attention(np.asarray(q[b]), np.asarray(k[b]), np.asarray(v[b]), 0.125)
        np.testing.assert_allclose(out[b], ref, atol=1e-5)


def test_sdpa_bias():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 8))
    bias = causal_temporal_bias(4)
    out = np.asarray(sdpa(q, k, v, 0.3, bias=bias, use_flash=False))
    # row 0 can only attend to key 0
    ref0 = np.asarray(v)[0, :, 0]
    np.testing.assert_allclose(out[0, :, 0], ref0, atol=1e-4)


@pytest.mark.parametrize("mode", [NORMAL, SPARSE_CAUSAL, MOTION_FRAME, DENSE])
def test_spatial_self_attention_shapes(mode):
    key = jax.random.PRNGKey(0)
    params = init_attention(key, query_dim=32, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 32))
    out = spatial_self_attention(params, x, mode, heads=4, use_flash=False)
    assert out.shape == x.shape


def test_normal_mode_is_per_frame():
    """NORMAL mode must be frame-independent: permuting other frames does not
    change a frame's output (the normal_infer fallback of attention_2d.py)."""
    params = init_attention(jax.random.PRNGKey(0), query_dim=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 6, 16))
    out = spatial_self_attention(params, x, NORMAL, heads=2, use_flash=False)
    x_perm = x[:, [3, 1, 2, 0]]
    out_perm = spatial_self_attention(params, x_perm, NORMAL, heads=2, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out[:, 1]), np.asarray(out_perm[:, 1]), atol=1e-5
    )


def test_sparse_causal_frame0_consistency():
    """Frame 0's sparse-causal K/V is [frame0, frame0]; duplicating keys does
    not change softmax-attention output vs plain self-attention on frame 0."""
    params = init_attention(jax.random.PRNGKey(0), query_dim=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6, 16))
    out_sc = spatial_self_attention(params, x, SPARSE_CAUSAL, heads=2, use_flash=False)
    out_n = spatial_self_attention(params, x, NORMAL, heads=2, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_sc[:, 0]), np.asarray(out_n[:, 0]), atol=1e-5
    )


def test_temporal_attention_causal():
    """Causal temporal attention: frame f output independent of frames > f."""
    params = init_attention(jax.random.PRNGKey(0), query_dim=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 16))  # [B, N, F, C]
    out = temporal_self_attention(params, x, heads=2, causal=True)
    x2 = x.at[:, :, 3].set(123.0)  # mutate the last frame
    out2 = temporal_self_attention(params, x2, heads=2, causal=True)
    np.testing.assert_allclose(
        np.asarray(out[:, :, :3]), np.asarray(out2[:, :, :3]), atol=1e-5
    )
    assert not np.allclose(np.asarray(out[:, :, 3]), np.asarray(out2[:, :, 3]))


def test_temporal_kv_override():
    """kv_override substitutes K/V entirely (temporal_control.py:82-86)."""
    params = init_attention(jax.random.PRNGKey(0), query_dim=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 4, 16))
    src = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 4, 16))
    out_inj = temporal_self_attention(params, x, heads=2, causal=True, kv_override=src)
    out_self = temporal_self_attention(params, src, heads=2, causal=True)
    # queries differ, so outputs differ from src's own output
    assert not np.allclose(np.asarray(out_inj), np.asarray(out_self))
    # but with identical queries it must reduce to self-attention
    out_same = temporal_self_attention(params, src, heads=2, causal=True, kv_override=src)
    np.testing.assert_allclose(np.asarray(out_same), np.asarray(out_self), atol=1e-6)


def test_cross_attention_shapes():
    params = init_attention(jax.random.PRNGKey(0), query_dim=32, cross_dim=24, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 32))
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 24))
    out = cross_attention(params, x, enc, heads=4)
    assert out.shape == x.shape


def test_split_merge_heads_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 32))
    np.testing.assert_array_equal(
        np.asarray(merge_heads(split_heads(x, 4))), np.asarray(x)
    )
