import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.injection import injected_spatial_attention
from motioneditor_tpu.ops.attention import MOTION_FRAME, init_attention, select_kv, split_heads
from motioneditor_tpu.models.layers import linear
from motioneditor_tpu.ops.injection_flash import fused_injection_attention
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def _reference_concat(q, ks, vs, mask, kt, vt, scale):
    """Materialized-concat oracle: softmax over [ks*m, ks*(1-m), kt] with
    V = [vs, vs, vt]."""
    b, f, h, nq, d = q.shape
    m = mask[None, :, None, :, None]  # [1, F, 1, Ns, 1]
    k_cat = jnp.concatenate([ks * m, ks * (1 - m), kt], axis=-2)
    v_cat = jnp.concatenate([vs, vs, vt], axis=-2)
    s = jnp.einsum("bfhqd,bfhkd->bfhqk", q, k_cat,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v_cat.dtype)
    return jnp.einsum("bfhqk,bfhkd->bfhqd", p, v_cat)


def test_fused_kernel_matches_concat_oracle():
    b, f, h, nq, d = 2, 3, 2, 256, 16
    ns, nt = 2 * nq, nq
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, f, h, nq, d))
    ks = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, ns, d))
    vs = jax.random.normal(jax.random.PRNGKey(2), (b, f, h, ns, d))
    kt = jax.random.normal(jax.random.PRNGKey(3), (b, f, h, nt, d))
    vt = jax.random.normal(jax.random.PRNGKey(4), (b, f, h, nt, d))
    mask = (jax.random.uniform(jax.random.PRNGKey(5), (f, ns)) > 0.5).astype(jnp.float32)
    scale = d**-0.5

    got = fused_injection_attention(q, ks, vs, mask, kt, vt, scale,
                                    block_q=128, block_k=128)
    ref = _reference_concat(q, ks, vs, mask, kt, vt, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_kernel_per_frame_masks_differ():
    """Frames must see their own mask row, not a shared one."""
    b, f, h, nq, d = 1, 2, 1, 128, 8
    ns, nt = 256, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (b, f, h, nq, d))
    ks = jax.random.normal(jax.random.PRNGKey(1), (b, f, h, ns, d))
    vs = jax.random.normal(jax.random.PRNGKey(2), (b, f, h, ns, d))
    kt = jax.random.normal(jax.random.PRNGKey(3), (b, f, h, nt, d))
    vt = jax.random.normal(jax.random.PRNGKey(4), (b, f, h, nt, d))
    mask = jnp.stack([jnp.ones((ns,)), jnp.zeros((ns,))])
    got = fused_injection_attention(q, ks, vs, mask, kt, vt, d**-0.5,
                                    block_q=128, block_k=128)
    ref = _reference_concat(q, ks, vs, mask, kt, vt, d**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_injected_spatial_attention_flash_matches_concat_path():
    """End-to-end: the flash-routed injected attention (N>=1024 triggers the
    fused kernel) must match the jnp concat path."""
    heads = 2
    n = 1024  # crosses the fused-kernel threshold
    params = init_attention(jax.random.PRNGKey(0), query_dim=16, heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, n, 16)) * 0.5
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (2, n, 1)) > 0.5).astype(
        jnp.float32
    )
    out_flash = injected_spatial_attention(params, x, heads, mask, True, use_flash=True)
    out_ref = injected_spatial_attention(params, x, heads, mask, True, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), atol=5e-4, rtol=1e-3
    )
