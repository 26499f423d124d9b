"""Fused flash backward (ops/video_flash_bwd.py) vs the exact XLA oracle.

The reference trains / null-text-optimizes through xformers'
memory_efficient_attention whose fused backward never materializes score
matrices (attention_2d.py:246-253). These tests check our Pallas backward
against grads of the materialized select_kv softmax oracle, for every
frame-selection mode, both dtypes, and that the vjp-path primal is
bit-consistent with the primal-only kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.ops.attention import merge_heads, select_kv, split_heads
from motioneditor_tpu.ops.video_flash import video_flash_attention
from motioneditor_tpu.ops.video_flash_bwd import pick_blocks_bwd

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

B, F, N, C, HEADS = 1, 3, 512, 64, 8
SCALE = (C // HEADS) ** -0.5


def _oracle(q, k, v, mode):
    kk = select_kv(k, mode)
    vv = select_kv(v, mode)
    qh = split_heads(q, HEADS)
    kh = split_heads(kk, HEADS)
    vh = split_heads(vv, HEADS)
    s = jnp.einsum("...qd,...kd->...qk", qh, kh,
                   preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
    return merge_heads(jnp.einsum("...qk,...kd->...qd", p, vh))


def _qkv(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(
        jax.random.normal(k, (B, F, N, C), jnp.float32).astype(dtype) for k in ks
    )


@pytest.mark.parametrize("mode", ["normal", "sparse_causal", "motion_frame"])
def test_flash_bwd_matches_oracle_fp32(mode):
    q, k, v = _qkv(jnp.float32)
    assert pick_blocks_bwd(N, C, 4, heads=HEADS) is not None

    def loss_k(q, k, v):
        return jnp.sum(video_flash_attention(q, k, v, mode, SCALE, HEADS) ** 2)

    def loss_o(q, k, v):
        return jnp.sum(_oracle(q, k, v, mode) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, go):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("mode", ["normal", "motion_frame"])
def test_flash_bwd_bf16(mode):
    """bf16 path: bounded-score softmax; grads compared against the fp32
    oracle evaluated at the same points — bounded-precision agreement."""
    q, k, v = _qkv(jnp.bfloat16)

    def loss_k(q, k, v):
        return jnp.sum(
            video_flash_attention(q, k, v, mode, SCALE, HEADS).astype(jnp.float32)
            ** 2
        )

    def loss_o(q, k, v):
        out = _oracle(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32), mode)
        return jnp.sum(out**2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_o, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for a, b in zip(gk, go):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.all(np.isfinite(a))
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 0.06


def test_vjp_primal_matches_kernel():
    """The residual-emitting forward must produce the same primal as the
    plain kernel (same blockings, same accumulation order)."""
    q, k, v = _qkv(jnp.float32)
    f = functools.partial(
        video_flash_attention, mode="motion_frame", scale=SCALE, heads=HEADS
    )
    plain = f(q, k, v)
    via_vjp, _ = jax.vjp(f, q, k, v)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(via_vjp))


def test_bwd_memory_shape_invariants():
    """dk/dv come back in the primal shape/dtype for every mode (the
    partial-scatter combine is easy to get off by one on the frame axis)."""
    for mode in ("normal", "sparse_causal", "motion_frame"):
        q, k, v = _qkv(jnp.float32)

        def loss(q, k, v, m=mode):
            return jnp.sum(video_flash_attention(q, k, v, m, SCALE, HEADS))

        gq, gkk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        assert gq.shape == q.shape and gq.dtype == q.dtype
        assert gkk.shape == k.shape and gkk.dtype == k.dtype
        assert gv.shape == v.shape and gv.dtype == v.dtype
