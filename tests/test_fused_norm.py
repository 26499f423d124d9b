"""Fused residual-add + LayerNorm kernel (ops/fused_norm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.models.layers import layer_norm
from motioneditor_tpu.ops.fused_norm import add_layer_norm


@pytest.fixture(autouse=True)
def _force_kernel_on(monkeypatch):
    """Exercise the kernel path regardless of the single-chip-TPU default
    gate (interpret mode off-TPU)."""
    monkeypatch.setenv("MOTIONEDITOR_FUSED_LN", "1")


def _params(c, key):
    k1, k2 = jax.random.split(key)
    return {
        "scale": jax.random.normal(k1, (c,)) * 0.2 + 1.0,
        "bias": jax.random.normal(k2, (c,)) * 0.2,
    }


def test_add_layer_norm_matches_unfused():
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 4e-2)):
        key = jax.random.PRNGKey(0)
        kt, kd, kp = jax.random.split(key, 3)
        t = (jax.random.normal(kt, (2, 3, 1024, 320)) * 2.0).astype(dtype)
        d = (jax.random.normal(kd, (2, 3, 1024, 320)) * 0.5).astype(dtype)
        params = _params(320, kp)
        summed, normed = add_layer_norm(params, t, d)
        ref_sum = t + d
        ref_norm = layer_norm(params, ref_sum)
        np.testing.assert_allclose(
            np.asarray(summed, np.float32), np.asarray(ref_sum, np.float32),
            atol=tol,
        )
        np.testing.assert_allclose(
            np.asarray(normed, np.float32), np.asarray(ref_norm, np.float32),
            atol=tol,
        )


def test_add_layer_norm_gradient_routes_through_oracle():
    """Under jax.grad the custom VJP must produce the unfused gradients."""
    key = jax.random.PRNGKey(1)
    kt, kd, kp = jax.random.split(key, 3)
    t = jax.random.normal(kt, (1, 2, 512, 64))
    d = jax.random.normal(kd, (1, 2, 512, 64)) * 0.3
    params = _params(64, kp)

    def fused_loss(t, d, p):
        s, n = add_layer_norm(p, t, d)
        return jnp.sum(n**2) + jnp.sum(s)

    def ref_loss(t, d, p):
        s = t + d
        return jnp.sum(layer_norm(p, s) ** 2) + jnp.sum(s)

    g_f = jax.grad(fused_loss, argnums=(0, 1, 2))(t, d, params)
    g_r = jax.grad(ref_loss, argnums=(0, 1, 2))(t, d, params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_add_layer_norm_odd_tokens_falls_back():
    """Token counts with no lane-aligned blocking use the jnp fallback."""
    params = _params(32, jax.random.PRNGKey(2))
    t = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 7, 32))
    d = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 7, 32))
    summed, normed = add_layer_norm(params, t, d)
    np.testing.assert_allclose(
        np.asarray(normed), np.asarray(layer_norm(params, t + d)), atol=1e-5
    )
