import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.ops.attention import sdpa
from motioneditor_tpu.ops.flash_attention import flash_attention

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


@pytest.mark.parametrize(
    "nq,nk,d",
    [
        (256, 256, 40),
        (512, 1024, 64),
        (384, 640, 80),  # non-multiple-of-block kv
    ],
)
def test_flash_matches_reference(nq, nk, d):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 4, nq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, nk, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, nk, d), jnp.float32)
    scale = d**-0.5
    ref = sdpa(q, k, v, scale, use_flash=False)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 256, 64), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 256, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 256, 64), jnp.bfloat16)
    ref = sdpa(q, k, v, 0.125, use_flash=False)
    out = flash_attention(q, k, v, 0.125, block_q=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_flash_bf16_nomax_extreme_scores():
    """The bf16 path uses a bounded-score softmax with no running max; verify
    it stays correct when scores reach the ±_CAP region and when a whole row
    is strongly negative (underflow guard must give ~uniform-free output, not
    NaN)."""
    nq, nk, d = 256, 384, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 1, nq, d), jnp.bfloat16) * 3.0
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, nk, d), jnp.bfloat16) * 3.0
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, nk, d), jnp.bfloat16)
    scale = d**-0.5  # scores ~N(0, 9^2): tails reach ~±40, inside _CAP=60
    ref = sdpa(q, k, v, scale, use_flash=False)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128)
    assert not np.any(np.isnan(np.asarray(out, np.float32)))
    # softmax concentrates on 1-2 keys at this score spread, so the bf16
    # q-prescale quantization (vs the oracle's fp32 post-scale) shows up
    # amplified; 6e-2 bounds that inherent quantization, not kernel error
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=6e-2
    )


def test_max_abs_logit_debug_stat():
    """Parity runs assert max_abs_logit < score_cap so bf16 bounded-score
    clamping can never silently change a softmax (advisor round-2 ask)."""
    from motioneditor_tpu.ops.flash_attention import max_abs_logit, score_cap

    d = 64
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 128, d)) * 2.0
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 128, d)) * 2.0
    scale = d**-0.5
    stat = float(max_abs_logit(q, k, scale))
    ref = float(jnp.max(jnp.abs(jnp.einsum("bqd,bkd->bqk", q, k) * scale)))
    assert stat == pytest.approx(ref, rel=1e-6)
    assert stat < score_cap()  # SD-scale operands sit far inside the cap
    # packed-head form scores each d-slice separately (what the kernels see)
    stat_packed = float(max_abs_logit(q, k, scale, heads=4))
    per_head = jnp.einsum(
        "bqhd,bkhd->bhqk", q.reshape(2, 128, 4, 16), k.reshape(2, 128, 4, 16)
    )
    assert stat_packed == pytest.approx(
        float(jnp.max(jnp.abs(per_head)) * scale), rel=1e-6
    )
