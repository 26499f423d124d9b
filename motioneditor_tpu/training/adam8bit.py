"""Blockwise 8-bit AdamW (optax transformation).

The reference exposes ``use_8bit_adam`` via bitsandbytes
(/root/reference/train_bg.py:190-208) to fit optimizer state on small GPUs.
TPU-native equivalent: the Adam moments are stored as int8/uint8 with one
fp32 scale per 256-element block (bitsandbytes' dynamic blockwise scheme,
simplified to linear max-abs quantization), dequantized transiently inside
the update. State memory: 1 byte/param/moment + 1/64 scale overhead vs 4 —
an ~4x optimizer-state reduction.

On TPU this is rarely needed (HBM headroom — the stage-1 trainables are
~100M params), so it is off by default; the flag exists for config parity
and for very large fine-tunes.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


@dataclasses.dataclass
class _Q:
    q: jnp.ndarray       # int8 (signed moments) or uint8 (non-negative)
    scale: jnp.ndarray   # fp32 per-block max-abs / qmax
    n: int               # original element count (STATIC: pytree aux data,
                         # so reshape sizes stay concrete under jit)


jax.tree_util.register_pytree_node(
    _Q,
    lambda s: ((s.q, s.scale), s.n),
    lambda n, c: _Q(c[0], c[1], n),
)


def _blocks(x: jnp.ndarray):
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    flat = jnp.pad(flat, (0, (-n) % BLOCK))
    return flat.reshape(-1, BLOCK), n


def _quantize(x: jnp.ndarray, signed: bool) -> _Q:
    """signed (first moment): linear max-abs int8, round-to-nearest.

    unsigned (second moment): SQRT-domain uint8 with ROUND-UP. Linear codes
    flush second moments below blockmax/255 to zero, which turns the Adam
    denominator into eps and explodes the update for elements whose m
    survives quantization but whose v does not. The sqrt code gives
    quadratic resolution near zero (down to blockmax/65025) and rounding UP
    biases v high, so quantization can only shrink an update, never inflate
    it — conservative and stable (bitsandbytes' dynamic code solves the
    same failure mode nonparametrically)."""
    blocks, n = _blocks(x)
    if signed:
        scale = jnp.max(jnp.abs(blocks), axis=-1, keepdims=True) / 127.0
        q = jnp.round(blocks / jnp.maximum(scale, 1e-30))
        return _Q(q.astype(jnp.int8), scale, n)
    vmax = jnp.max(blocks, axis=-1, keepdims=True)
    u = jnp.sqrt(blocks / jnp.maximum(vmax, 1e-30))
    q = jnp.clip(jnp.ceil(u * 255.0), 0.0, 255.0)
    return _Q(q.astype(jnp.uint8), vmax, n)


def _dequantize(s: _Q, shape) -> jnp.ndarray:
    if s.q.dtype == jnp.int8:
        blocks = s.q.astype(jnp.float32) * s.scale
    else:
        u = s.q.astype(jnp.float32) / 255.0
        blocks = u * u * s.scale
    return blocks.reshape(-1)[: s.n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m: object  # pytree of _Q
    v: object


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """optax transformation: Adam scaling with blockwise 8-bit moments."""

    def init(params):
        zeros_m = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), signed=True), params
        )
        zeros_v = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), signed=False), params
        )
        return Adam8bitState(count=jnp.zeros([], jnp.int32), m=zeros_m, v=zeros_v)

    def update(grads, state, params=None):
        del params
        count = state.count + 1

        def leaf(g, mq, vq):
            g = g.astype(jnp.float32)
            m = b1 * _dequantize(mq, g.shape) + (1 - b1) * g
            v = b2 * _dequantize(vq, g.shape) + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            upd = mhat / (jnp.sqrt(vhat) + eps)
            return upd, _quantize(m, signed=True), _quantize(v, signed=False)

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        outs = [leaf(g, m, v) for g, m, v in zip(flat_g, flat_m, flat_v)]
        upds = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        return upds, Adam8bitState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init, update)


def adamw8bit(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
):
    """AdamW with 8-bit moment state (train_bg.py:190-208 equivalent)."""
    return optax.chain(
        scale_by_adam8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
        optax.scale(-learning_rate),
    )
