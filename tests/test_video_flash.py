"""Packed-head video flash kernel vs the select_kv + split-head oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.ops.attention import (
    DENSE,
    MOTION_FRAME,
    NORMAL,
    SPARSE_CAUSAL,
    merge_heads,
    sdpa,
    select_kv,
    split_heads,
)
from motioneditor_tpu.ops.video_flash import (
    video_flash_attention,
    video_flash_supported,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


def _oracle(q, k, v, mode, scale, heads):
    ks = select_kv(k, mode)
    vs = select_kv(v, mode)
    out = sdpa(
        split_heads(q, heads), split_heads(ks, heads), split_heads(vs, heads),
        scale, use_flash=False,
    )
    return merge_heads(out)


@pytest.mark.parametrize("mode", [NORMAL, SPARSE_CAUSAL, MOTION_FRAME, DENSE])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_video_flash_matches_oracle(mode, dtype):
    b, f, n, heads, d = 2, 4, 1024, 4, 8
    c = heads * d
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, f, n, c), dtype)
    k = jax.random.normal(ks[1], (b, f, n, c), dtype)
    v = jax.random.normal(ks[2], (b, f, n, c), dtype)
    scale = d**-0.5
    assert video_flash_supported(n, c, heads)
    out = video_flash_attention(q, k, v, mode, scale, heads)
    ref = _oracle(q, k, v, mode, scale, heads)
    atol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_frame0_duplicate_keys():
    """f=0 reads its source frame twice in sparse_causal/motion_frame — the
    duplicated-key softmax weighting must match the reference concat."""
    b, f, n, heads, d = 1, 1, 512, 2, 8
    c = heads * d
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (b, f, n, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, f, n, c), jnp.float32)
    v = jax.random.normal(ks[2], (b, f, n, c), jnp.float32)
    scale = d**-0.5
    for mode in (SPARSE_CAUSAL, MOTION_FRAME):
        out = video_flash_attention(q, k, v, mode, scale, heads)
        ref = _oracle(q, k, v, mode, scale, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_supported_gate():
    assert video_flash_supported(4096, 320, 8)
    assert video_flash_supported(1024, 320, 8)
    assert not video_flash_supported(1000, 320, 8)  # n not block-divisible
    assert not video_flash_supported(1024, 320, 7)  # c % heads != 0


@pytest.mark.parametrize("mask_fgbg", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_injected_attention_packed_path(mask_fgbg, dtype):
    """injected_spatial_attention's packed kernels (n >= 1024 triggers them)
    must match the pure-jnp oracle path, including the fg/bg mask split."""
    from motioneditor_tpu.control.injection import injected_spatial_attention
    from motioneditor_tpu.ops.attention import init_attention

    f, n, heads, d = 3, 1024, 4, 8
    c = heads * d
    params = init_attention(jax.random.PRNGKey(0), c, heads=heads)
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, f, n, c), dtype)
    mask = (
        jax.random.uniform(jax.random.PRNGKey(2), (f, n, 1)) > 0.5
    ).astype(jnp.float32)

    got = injected_spatial_attention(
        params, x, heads, mask, mask_fgbg=mask_fgbg, use_flash=True
    )
    want = injected_spatial_attention(
        params, x, heads, mask, mask_fgbg=mask_fgbg, use_flash=False
    )
    atol = 3e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )
