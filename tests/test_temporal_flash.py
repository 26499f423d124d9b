"""Temporal-attention Pallas kernel vs the XLA transpose-path oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.ops.attention import (
    init_attention,
    temporal_self_attention,
    temporal_self_attention_video,
)
from motioneditor_tpu.ops.temporal_flash import temporal_flash_attention

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_einsum(causal, dtype):
    b, f, n, c, heads = 2, 5, 16, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], (b, f, n, c), dtype)
    k = _rand(ks[1], (b, f, n, c), dtype)
    v = _rand(ks[2], (b, f, n, c), dtype)
    d = c // heads
    scale = d**-0.5

    out = temporal_flash_attention(q, k, v, scale, heads, causal=causal)

    # oracle: per-head einsum with explicit (causal) masking, fp32 softmax
    q5 = np.asarray(q, np.float32).reshape(b, f, n, heads, d)
    k5 = np.asarray(k, np.float32).reshape(b, f, n, heads, d)
    v5 = np.asarray(v, np.float32).reshape(b, f, n, heads, d)
    s = np.einsum("bfnhd,bgnhd->bnhfg", q5, k5) * scale
    if causal:
        mask = np.tril(np.ones((f, f), bool))
        s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bnhfg,bgnhd->bfnhd", p, v5).reshape(b, f, n, c)

    atol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=atol)


@pytest.mark.parametrize("n", [576, 9])
def test_non_power_of_two_token_count(n):
    """Regression: n=576 (192px latents) used to pick bn=128 which does not
    divide n, leaving the last 64 tokens per batch unwritten; odd n must fall
    back to the XLA path instead of degenerating to bn=1."""
    b, f, c, heads = 1, 4, 32, 4
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(ks[0], (b, f, n, c), jnp.float32)
    k = _rand(ks[1], (b, f, n, c), jnp.float32)
    v = _rand(ks[2], (b, f, n, c), jnp.float32)
    d = c // heads
    scale = d**-0.5

    out = temporal_flash_attention(q, k, v, scale, heads, causal=True)

    q5 = np.asarray(q, np.float32).reshape(b, f, n, heads, d)
    k5 = np.asarray(k, np.float32).reshape(b, f, n, heads, d)
    v5 = np.asarray(v, np.float32).reshape(b, f, n, heads, d)
    s = np.einsum("bfnhd,bgnhd->bnhfg", q5, k5) * scale
    mask = np.tril(np.ones((f, f), bool))
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bnhfg,bgnhd->bfnhd", p, v5).reshape(b, f, n, c)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=1e-5)


def test_pick_block_n_divides():
    from motioneditor_tpu.ops.temporal_flash import _pick_block_n

    # the ADVICE repro: n=576, c=320, f=8, bf16 previously returned 128
    assert 576 % _pick_block_n(576, 8, 320, 2) == 0
    for n in (64, 576, 1024, 4096, 100, 9, 7):
        bn = _pick_block_n(n, 8, 320, 2)
        assert n % bn == 0, (n, bn)


def test_video_wrapper_matches_transpose_path():
    """temporal_self_attention_video == transpose -> temporal_self_attention,
    including the kv_override (temporal injection) path."""
    b, f, n, c, heads = 4, 3, 512, 32, 4  # n >= 512: the kernel path
    params = init_attention(jax.random.PRNGKey(1), c, heads=heads)
    x = _rand(jax.random.PRNGKey(2), (b, f, n, c), jnp.float32)
    kv = _rand(jax.random.PRNGKey(3), (b, f, n, c), jnp.float32)

    for override in (None, kv):
        got = temporal_self_attention_video(
            params, x, heads, causal=True, kv_override=override, use_kernel=True
        )
        xt = x.transpose(0, 2, 1, 3)
        kvt = None if override is None else override.transpose(0, 2, 1, 3)
        want = temporal_self_attention(
            params, xt, heads, causal=True, kv_override=kvt
        ).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )
