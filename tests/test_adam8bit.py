"""Blockwise 8-bit AdamW (training/adam8bit.py — the reference's
use_8bit_adam option, /root/reference/train_bg.py:190-208)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motioneditor_tpu.training.adam8bit import BLOCK, _dequantize, _quantize, adamw8bit
from motioneditor_tpu.training.common import make_optimizer


def test_quantize_roundtrip_error_bounded():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 700).astype(np.float32))  # non-multiple of BLOCK
    q = _quantize(x, signed=True)
    assert q.q.dtype == jnp.int8 and q.n == 2100
    back = _dequantize(q, x.shape)
    # max-abs linear int8: error <= scale/2 = blockmax/254 per element
    err = np.abs(np.asarray(back - x))
    blocks = np.abs(np.pad(np.asarray(x).reshape(-1), (0, (-2100) % BLOCK))).reshape(-1, BLOCK)
    bound = blocks.max(-1) / 254.0 + 1e-7
    assert (err.reshape(-1) <= np.repeat(bound, BLOCK)[:2100]).all()

    v = jnp.abs(x)
    qv = _quantize(v, signed=False)
    assert qv.q.dtype == jnp.uint8
    assert float(jnp.min(_dequantize(qv, v.shape))) >= 0.0


def test_adam8bit_tracks_fp32_adamw():
    """A few steps on a quadratic: the 8-bit trajectory stays close to fp32
    AdamW and the state is actually 8-bit."""
    params = {"w": jnp.asarray(np.random.RandomState(1).randn(512).astype(np.float32))}
    target = jnp.zeros(512)

    def loss(p):
        return jnp.mean((p["w"] - target) ** 2)

    opt8 = adamw8bit(1e-2)
    optf = optax.chain(optax.scale_by_adam(), optax.add_decayed_weights(1e-2),
                       optax.scale(-1e-2))
    p8, pf = params, params
    s8, sf = opt8.init(p8), optf.init(pf)

    @jax.jit
    def step8(p, s):
        g = jax.grad(loss)(p)
        u, s = opt8.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(20):
        p8, s8 = step8(p8, s8)
        gf = jax.grad(loss)(pf)
        uf, sf = optf.update(gf, sf, pf)
        pf = optax.apply_updates(pf, uf)

    # moments are stored quantized
    leaves = jax.tree_util.tree_leaves(s8)
    dtypes = {l.dtype for l in leaves if hasattr(l, "dtype")}
    assert jnp.dtype(jnp.int8) in dtypes and jnp.dtype(jnp.uint8) in dtypes
    # both trajectories decreased the loss and stay close: 8-bit moment
    # quantization perturbs individual steps (that's the trade), so the
    # bound is a few lr-sized steps, not exact-tracking
    assert float(loss(p8)) < float(loss(params)) * 0.9
    diff = np.abs(np.asarray(p8["w"]) - np.asarray(pf["w"]))
    assert diff.max() < 1.5e-1 and diff.mean() < 1e-2


def test_make_optimizer_8bit_with_trainable_mask():
    """The 8-bit path composes with the None-masked trainable pytrees the
    train steps use (training/common.partition_params)."""
    trainable = {"a": jnp.ones(300), "b": None}
    opt = make_optimizer(1e-3, use_8bit=True)
    state = opt.init(trainable)
    grads = {"a": jnp.full(300, 0.5), "b": None}
    updates, _ = opt.update(grads, state, trainable)
    assert updates["b"] is None
    assert np.isfinite(np.asarray(updates["a"])).all()
