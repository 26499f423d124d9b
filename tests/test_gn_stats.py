"""Fused GroupNorm stats kernel (ops/gn_stats.py) vs the XLA group_norm.

The kernel must be bit-compatible in fp32 and within bf16 rounding in bf16,
in BOTH directions (the custom VJP is exact math, not an XLA-oracle
bridge), and must decline shapes with no feasible row blocking so
models/layers.py:group_norm falls back to the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.models.layers import group_norm, init_group_norm
from motioneditor_tpu.ops.gn_stats import channel_pair_stats, group_norm_fused


def _xla_gn(params, x, groups=32, eps=1e-6):
    import os

    old = os.environ.get("MOTIONEDITOR_FUSED_GN")
    os.environ["MOTIONEDITOR_FUSED_GN"] = "0"
    try:
        return group_norm(params, x, groups, eps)
    finally:
        if old is None:
            del os.environ["MOTIONEDITOR_FUSED_GN"]
        else:
            os.environ["MOTIONEDITOR_FUSED_GN"] = old


def test_pair_stats_matches_jnp():
    a = jax.random.normal(jax.random.PRNGKey(0), (3, 512, 320), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (3, 512, 320), jnp.bfloat16)
    s1, s2 = channel_pair_stats(a, b)
    af, bf = a.astype(jnp.float32), b.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(af.sum(1)), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray((af * bf).sum(1)), rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((2, 4, 16, 16, 320), jnp.bfloat16),  # 5D across-frame video GN
        ((8, 8, 8, 1280), jnp.float32),  # 4D per-frame GN
    ],
)
def test_fused_forward_matches_xla(monkeypatch, shape, dtype):
    monkeypatch.setenv("MOTIONEDITOR_FUSED_GN", "1")
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype) * 2 + 1.3
    p = init_group_norm(shape[-1])
    p = {
        "scale": p["scale"] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p["scale"].shape),
        "bias": 0.2 * jax.random.normal(jax.random.PRNGKey(2), p["bias"].shape),
    }
    y_fused = group_norm_fused(p, x, 32, 1e-6)
    assert y_fused is not None, "feasible shape must take the kernel"
    y_xla = _xla_gn(p, x)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_xla, np.float32), atol=tol
    )


def test_fused_grads_match_xla(monkeypatch):
    monkeypatch.setenv("MOTIONEDITOR_FUSED_GN", "1")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 256), jnp.float32) * 1.5 + 0.7
    p = init_group_norm(256)
    p = {
        "scale": p["scale"] + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (256,)),
        "bias": 0.1 * jax.random.normal(jax.random.PRNGKey(2), (256,)),
    }
    w = jax.random.normal(jax.random.PRNGKey(3), x.shape, jnp.float32)

    g_fused = jax.grad(
        lambda p, x: jnp.sum(group_norm_fused(p, x, 32, 1e-6) * w), argnums=(0, 1)
    )(p, x)
    g_xla = jax.grad(lambda p, x: jnp.sum(_xla_gn(p, x) * w), argnums=(0, 1))(p, x)

    for a, b in [
        (g_fused[0]["scale"], g_xla[0]["scale"]),
        (g_fused[0]["bias"], g_xla[0]["bias"]),
        (g_fused[1], g_xla[1]),
    ]:
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_infeasible_shape_falls_back(monkeypatch):
    monkeypatch.setenv("MOTIONEDITOR_FUSED_GN", "1")
    # 7*5 spatial rows: no power-of-two block divides it -> kernel declines
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 5, 64), jnp.float32)
    p = init_group_norm(64)
    assert group_norm_fused(p, x, 32, 1e-6) is None
    y = group_norm(p, x, 32, 1e-6)  # layers path must still work
    np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_gn(p, x, 32)), atol=1e-6)


@pytest.mark.parametrize("val", ["0", "false", "False", "no", "off", "OFF", " 0 "])
def test_env_knob_falsy_spellings_disable(monkeypatch, val):
    """Common falsy spellings must disable the kernel (advisor round-3)."""
    from motioneditor_tpu.utils.runtime import env_flag

    monkeypatch.setenv("MOTIONEDITOR_FUSED_GN", val)
    assert env_flag("MOTIONEDITOR_FUSED_GN", True) is False
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64), jnp.float32)
    assert group_norm_fused(init_group_norm(64), x, 32, 1e-6) is None


def test_env_knob_truthy_and_default(monkeypatch):
    from motioneditor_tpu.utils.runtime import env_flag

    monkeypatch.setenv("X_FLAG", "1")
    assert env_flag("X_FLAG", False) is True
    monkeypatch.delenv("X_FLAG", raising=False)
    assert env_flag("X_FLAG", True) is True
    assert env_flag("X_FLAG", False) is False
