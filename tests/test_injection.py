import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.injection import (
    InjectionSpec,
    injected_spatial_attention,
    injected_temporal_kv,
    motion_frame_mask,
    prepare_injection_masks,
    segment_step_ranges,
)
from motioneditor_tpu.ops.attention import init_attention


def test_segment_step_ranges_default():
    """Reference default: STEP=4 -> steps 0-3 vanilla, 4-49 injected
    (inference.py:307, fully_control.py:42)."""
    segs = segment_step_ranges(50, start_step=4)
    assert segs == ((0, 4, False), (4, 50, True))


def test_segment_step_ranges_custom():
    segs = segment_step_ranges(6, step_idx=(0, 1, 4, 5))
    assert segs == ((0, 2, True), (2, 4, False), (4, 6, True))
    segs = segment_step_ranges(4, start_step=0)
    assert segs == ((0, 4, True),)


def test_injection_spec_layers():
    spec = InjectionSpec.from_start_layer(10)
    assert spec.spatial_layers == (False,) * 10 + (True,) * 6
    assert spec.temporal_layers == spec.spatial_layers
    spec2 = InjectionSpec.from_start_layer(layer_idx=(0, 15))
    assert spec2.spatial_layers[0] and spec2.spatial_layers[15]
    assert not any(spec2.spatial_layers[1:15])


def test_prepare_injection_masks():
    masks = jnp.zeros((2, 8, 8)).at[:, :4].set(1.0)
    out = prepare_injection_masks(masks, 2, resolutions=((4, 4), (2, 2)))
    m4 = np.asarray(out[(4, 4)]).reshape(2, 4, 4)
    assert m4[:, :2].min() == 1.0 and m4[:, 2:].max() == 0.0


def test_motion_frame_mask():
    m = jnp.stack([jnp.full((3, 1), float(i)) for i in range(4)])  # [4,3,1]
    out = np.asarray(motion_frame_mask(m))
    assert out.shape == (4, 6, 1)
    # frame 0: [m0, m0]; frame 2: [m1, m2]
    np.testing.assert_array_equal(out[0, :, 0], [0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(out[2, :, 0], [1, 1, 1, 2, 2, 2])


def _oracle_fully_mask(params, x, mask_n, heads):
    """NumPy oracle implementing fully_control.py:425-460 + attn_batch
    :372-422 directly (per-head loop, explicit concats)."""
    xn = np.asarray(x, np.float64)
    b, f, n, c = xn.shape
    Wq = np.asarray(params["to_q"]["kernel"], np.float64)
    Wk = np.asarray(params["to_k"]["kernel"], np.float64)
    Wv = np.asarray(params["to_v"]["kernel"], np.float64)
    Wo = np.asarray(params["to_out"]["kernel"], np.float64)
    bo = np.asarray(params["to_out"]["bias"], np.float64)
    q, k, v = xn @ Wq, xn @ Wk, xn @ Wv
    former = [0] + list(range(f - 1))
    k_mf = np.concatenate([k[:, former], k], axis=2)  # [4, F, 2N, C]
    v_mf = np.concatenate([v[:, former], v], axis=2)
    m = np.asarray(mask_n, np.float64)  # [F, N, 1]
    m_mf = np.concatenate([m[former], m], axis=1)  # [F, 2N, 1]

    d = c // heads
    scale = d**-0.5

    def attn(qr, kr, vr):
        # qr [F,N,C], kr/vr [F,K,C]
        out = np.zeros_like(qr)
        for fi in range(f):
            for h in range(heads):
                qs = qr[fi, :, h * d : (h + 1) * d]
                ks = kr[fi, :, h * d : (h + 1) * d]
                vs = vr[fi, :, h * d : (h + 1) * d]
                s = qs @ ks.T * scale
                s = s - s.max(-1, keepdims=True)
                p = np.exp(s)
                p /= p.sum(-1, keepdims=True)
                out[fi, :, h * d : (h + 1) * d] = p @ vs
        return out

    outs = []
    for row in range(4):
        if row in (0, 2):
            outs.append(attn(q[row], k_mf[row], v_mf[row]))
        else:
            src = row - 1
            k_fg = k_mf[src] * m_mf
            k_bg = k_mf[src] * (1 - m_mf)
            k_cat = np.concatenate([k_fg, k_bg, k[row]], axis=1)
            v_cat = np.concatenate([v_mf[src], v_mf[src], v[row]], axis=1)
            outs.append(attn(q[row], k_cat, v_cat))
    out = np.stack(outs)
    return out @ Wo + bo


def test_injected_spatial_attention_vs_oracle():
    heads = 2
    params = init_attention(jax.random.PRNGKey(0), query_dim=8, heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 8))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (3, 4, 1)) > 0.5).astype(jnp.float32)
    out = injected_spatial_attention(params, x, heads, mask, True, use_flash=False)
    ref = _oracle_fully_mask(params, x, mask, heads)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_injected_mutual_no_mask():
    """mask_fgbg=False: target rows attend over source K/V wholesale
    (MutualSelfAttentionControl, fully_control.py:83-87). With identical
    source/target rows, outputs must be identical across branches."""
    heads = 2
    params = init_attention(jax.random.PRNGKey(0), query_dim=8, heads=heads)
    row = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 8))
    x = jnp.concatenate([row, row, row * 2, row * 2], axis=0)
    out = injected_spatial_attention(params, x, heads, None, False, use_flash=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(out[3]), atol=1e-5)


def test_injected_temporal_kv_rows():
    x = jnp.arange(4.0)[:, None, None, None] * jnp.ones((4, 2, 3, 5))
    kv = np.asarray(injected_temporal_kv(x))
    np.testing.assert_array_equal(kv[0], np.asarray(x[0]))
    np.testing.assert_array_equal(kv[1], np.asarray(x[0]))
    np.testing.assert_array_equal(kv[2], np.asarray(x[2]))
    np.testing.assert_array_equal(kv[3], np.asarray(x[2]))
