"""Supported-shapes matrix for the attention kernel stack (VERDICT round-1
weak #8): for each (n, c, heads, dtype) class, assert which path the gates
select AND that the end result stays correct when the packed kernel is
infeasible and a fallback must serve (split-head kernel, XLA sdpa, or the
temporal transpose path).

Shape classes of interest:
  - 64x64/32x32 latents (n 4096/1024): packed kernel path
  - 24x24 latents (n 576, 192px video): NO dividing block — must fall back
    (the round-1 advisor found the temporal kernel silently corrupted this)
  - 16x16 (n 256): below _FLASH_MIN_Q — plain sdpa
  - fat channels at small n (VMEM-infeasible blockings)
"""

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
from motioneditor_tpu.ops.video_flash import _pick_blocks, video_flash_supported

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)


@pytest.mark.parametrize(
    "n,c,heads,itemsize,expect",
    [
        (4096, 320, 8, 2, True),    # level-0 bf16
        (4096, 320, 8, 4, True),    # level-0 fp32 (parity)
        (1024, 640, 8, 2, True),    # level-1
        (576, 320, 8, 2, False),    # 24x24: no dividing block
        (256, 1280, 8, 2, True),    # gated by _FLASH_MIN_Q at the caller
        (512, 2560, 8, 4, False),   # VMEM-infeasible fat fp32
        (1024, 320, 6, 2, False),   # c % heads != 0
        (1024, 330, 10, 2, False),  # d=33: lane slices misaligned
    ],
)
def test_supported_matrix(n, c, heads, itemsize, expect):
    assert video_flash_supported(n, c, heads, itemsize) is expect
    if not expect and c % heads == 0 and (c // heads) % 8 == 0:
        # when only the blocking is infeasible, _pick_blocks agrees
        assert _pick_blocks(n, c, itemsize, kv_streams=2, heads=heads) is None


def _oracle_vs_flash(n, heads, f=2, c=32):
    """spatial attention use_flash=True must equal use_flash=False on shapes
    where the kernel path is NOT available (i.e. the fallback serves)."""
    params = init_attention(jax.random.PRNGKey(0), c, heads=heads)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, f, n, c), jnp.float32)
    a = spatial_self_attention(params, x, MOTION_FRAME, heads, use_flash=True)
    b = spatial_self_attention(params, x, MOTION_FRAME, heads, use_flash=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fallback_serves_576_tokens():
    """24x24 latents (192px): packed kernel unsupported; output must still
    be exact vs the XLA oracle."""
    assert not video_flash_supported(576, 32, 4, 4)
    _oracle_vs_flash(576, heads=4)


def test_fallback_serves_small_n():
    """n=256 < _FLASH_MIN_Q: sdpa path."""
    _oracle_vs_flash(256, heads=4)


def test_temporal_fallback_576_tokens():
    """The advisor's round-1 finding: n=576 had no dividing block and the
    kernel left tokens uninitialized. The gate must route to the transpose
    path and produce oracle-exact output."""
    params = init_attention(jax.random.PRNGKey(0), 32, heads=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 576, 32), jnp.float32)
    a = temporal_self_attention_video(params, x, 4, use_kernel=True)
    b = temporal_self_attention_video(params, x, 4, use_kernel=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    assert np.all(np.isfinite(np.asarray(a)))
