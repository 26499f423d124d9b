"""Training differentiates through the UNet's Pallas attention kernels;
pallas_call has no VJP, so each kernel routes autodiff through an XLA oracle
(ops/diffable.py). These tests check grads exist, are finite, and match the
oracle's own grads."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from motioneditor_tpu.ops.attention import (
    MOTION_FRAME,
    init_attention,
    spatial_self_attention,
    temporal_self_attention_video,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def _grad_check(loss_kernel, loss_oracle, args):
    g_k = jax.grad(loss_kernel)(*args)
    g_o = jax.grad(loss_oracle)(*args)
    for a, b in zip(jax.tree_util.tree_leaves(g_k), jax.tree_util.tree_leaves(g_o)):
        assert np.all(np.isfinite(np.asarray(a)))
        # fp32 contraction-order noise between the two einsum formulations
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )


def test_spatial_flash_grad():
    params = init_attention(jax.random.PRNGKey(0), 32, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 1024, 32), jnp.float32)

    def loss(p, x, use_flash):
        out = spatial_self_attention(p, x, MOTION_FRAME, 4, use_flash=use_flash)
        return jnp.sum(out**2)

    _grad_check(
        lambda p, x: loss(p, x, True), lambda p, x: loss(p, x, False), (params, x)
    )


def test_temporal_kernel_grad():
    params = init_attention(jax.random.PRNGKey(0), 32, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 512, 32), jnp.float32)

    def loss(p, x, use_kernel):
        out = temporal_self_attention_video(p, x, 4, use_kernel=use_kernel)
        return jnp.sum(out**2)

    _grad_check(
        lambda p, x: loss(p, x, True), lambda p, x: loss(p, x, False), (params, x)
    )


def test_injected_attention_grad():
    from motioneditor_tpu.control.injection import injected_spatial_attention

    params = init_attention(jax.random.PRNGKey(0), 32, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 1024, 32), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (2, 1024, 1)) > 0.5).astype(
        jnp.float32
    )

    def loss(p, x, use_flash):
        out = injected_spatial_attention(p, x, 4, mask, use_flash=use_flash)
        return jnp.sum(out**2)

    _grad_check(
        lambda p, x: loss(p, x, True), lambda p, x: loss(p, x, False), (params, x)
    )
