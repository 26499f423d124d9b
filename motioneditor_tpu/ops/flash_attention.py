"""Pallas TPU flash attention.

Replaces the reference's xformers ``memory_efficient_attention`` calls
(attention_2d.py:246-253, fully_control.py:415-418, controlnet_adapter.py)
with an MXU-tiled streaming-softmax kernel: scores are never materialized in
HBM, K/V stream through VMEM one block at a time with a running max/denom.

Measured on TPU v5e at SD-1.5 attention shapes (d=40, bf16) the kernel is
4-6x faster than jax's bundled pallas flash_attention. Design notes from
measurement: the kernel is softmax(VPU)-bound at d=40, so elementwise passes
are minimized (q pre-scaled once, single-column running max/denom scratch);
K blocks are transposed IN-KERNEL via the dot_general contraction — feeding
K pre-transposed from HBM costs an XLA copy that is 20%+ of end-to-end time.

Interface: q/k/v shaped [..., H, N, D] (any leading batch dims). Falls back
to interpret mode off-TPU so the same code path is unit-testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Defaults tuned on v5e (see module docstring); VMEM use at (1024, 1024):
# s block 4MB fp32 + q/k/v blocks + acc ≈ 6MB of 16MB.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024

# bf16 fast path (v4): bounded-score softmax with NO running max. Scores are
# clamped at _CAP and shifted by it, removing the per-block max reduce and
# the acc/l rescale passes — measured 17% kernel time at the SD hot shape.
# p = exp(s - _CAP): exact vs running-max softmax for scores in
# [_CAP - 103, _CAP] (fp32 denormal floor e^-103); scores below the floor
# round to probability 0, which is harmless unless an entire row is there
# (then the eps in the final divide yields 0, not NaN). SD attention logits
# live within roughly ±30, so _CAP=60 keeps both margins comfortable.
# exp2 form folds log2(e) into the q pre-scale (one fewer VPU multiply).
_CAP = 60.0
_NOMAX_BLOCK_Q = 2048  # best measured (s block 8MB fp32 of 16MB VMEM)


def max_abs_logit(q, k, scale: float, heads: int = None):
    """Debug stat for the bounded-score cap: the maximum |score| the no-max
    bf16 kernels would see for these operands. Parity runs should assert
    ``max_abs_logit(...) < score_cap()`` — scores above the cap are clamped
    (prob 1.0 pre-normalization) and scores more than ~103 below it
    underflow to 0, so a violation silently changes the softmax. q/k:
    [..., N, C] packed-head layout when ``heads`` is given (per-head d-slices
    scored separately), else [..., N, D] split-head."""
    import jax.numpy as jnp

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    if heads is not None:
        c = q.shape[-1]
        d = c // heads
        qf = qf.reshape(qf.shape[:-1] + (heads, d))
        kf = kf.reshape(kf.shape[:-1] + (heads, d))
        s = jnp.einsum("...qhd,...khd->...hqk", qf, kf)
    else:
        s = jnp.einsum("...qd,...kd->...qk", qf, kf)
    return jnp.max(jnp.abs(s)) * scale


def score_cap() -> float:
    """The bf16 no-max softmax clamp (see the _CAP note above)."""
    return _CAP


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    kv_len: int,
    block_k: int,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d) — pre-scaled by the wrapper
    k = k_ref[0]  # (block_k, d) — transposed in-kernel: cheaper than an HBM copy
    v = v_ref[0]

    # Pin per-dot precision: the global jax_default_matmul_precision knob
    # (used for fp32 parity runs) requests multi-pass emulation that Mosaic
    # rejects for bf16 operands.
    prec = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (block_q, block_k)

    # mask padded keys in the final block
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:, :1] = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    )
    m_scr[:, :1] = m_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_kernel_nomax(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    l_scr,
    acc_scr,
    *,
    kv_len: int,
    block_k: int,
):
    """bf16 fast path: shared-shift softmax, no running max (see _CAP note)."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # pre-scaled by scale * log2(e)
    k = k_ref[0]
    v = v_ref[0]
    # pin per-dot precision: the global jax_default_matmul_precision knob
    # requests multi-pass emulation that Mosaic rejects for bf16 operands
    prec = jax.lax.Precision.DEFAULT
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (block_q, block_k), in log2 units

    cap2 = _CAP * 1.4426950408889634
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jnp.exp2(jnp.minimum(s, cap2) - cap2)
    l_scr[:, :1] = l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        # eps guards the (pathological) all-underflow row: 0 instead of NaN
        o_ref[0] = (acc_scr[:] / (l_scr[:, :1] + 1e-30)).astype(o_ref.dtype)


def _pad_axis(x, axis: int, multiple: int):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def _flash_3d(q, k, v, scale: float, block_q: int, block_k: int, interpret: bool):
    bh, nq, d = q.shape
    kv_len = k.shape[1]
    nomax = q.dtype == jnp.bfloat16  # fp32 keeps the exact running-max path
    q_scale = scale * 1.4426950408889634 if nomax else scale
    qs = (q.astype(jnp.float32) * q_scale).astype(q.dtype)
    qp = _pad_axis(qs, 1, block_q)
    kp = _pad_axis(k, 1, block_k)
    vp = _pad_axis(v, 1, block_k)
    nq_p, nk_p = qp.shape[1], vp.shape[1]
    grid = (bh, nq_p // block_q, nk_p // block_k)

    if nomax:
        kernel = functools.partial(_flash_kernel_nomax, kv_len=kv_len, block_k=block_k)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    else:
        kernel = functools.partial(_flash_kernel, kv_len=kv_len, block_k=block_k)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :nq, :]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention over [..., H, N, D]; returns same shape as q.

    Differentiable: under jax.grad the computation routes through the plain
    fp32-softmax einsum oracle (ops/diffable.py) — pallas_call has no VJP."""
    import math

    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    if scale is None:
        scale = q.shape[-1] ** -0.5
    *lead, nq, d = q.shape
    kv_len = k.shape[-2]
    add_kernel_flops(2 * 2 * math.prod(lead) * nq * kv_len * d)
    interpret = jax.default_backend() != "tpu"
    if q.dtype == jnp.bfloat16 and block_q == DEFAULT_BLOCK_Q:
        block_q = _NOMAX_BLOCK_Q
    bq = min(block_q, max(128, nq))
    bk = min(block_k, max(128, kv_len))

    def _kernel_path(q, k, v):
        q3 = q.reshape(-1, nq, d)
        k3 = jnp.broadcast_to(k, tuple(lead) + (kv_len, d)).reshape(-1, kv_len, d)
        v3 = jnp.broadcast_to(v, tuple(lead) + (kv_len, d)).reshape(-1, kv_len, d)
        out = _flash_3d(q3, k3, v3, float(scale), bq, bk, interpret)
        return out.reshape(*lead, nq, d)

    def _attn(q, k, v):
        scores = jnp.einsum(
            "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        return jnp.einsum("...qk,...kd->...qd", probs, v)

    def _oracle(q, k, v):
        # Chunk over the flattened lead dims with jax.checkpoint so the grad
        # path holds at most one chunk's [G, nq, kv] fp32 score tile instead
        # of the full batch*frames*heads set (OOMs at 512px under jax.grad).
        lead_n = 1
        for s in lead:
            lead_n *= s
        q3 = q.reshape(lead_n, nq, d)
        k3 = jnp.broadcast_to(k, tuple(lead) + (kv_len, d)).reshape(
            lead_n, kv_len, d
        )
        v3 = jnp.broadcast_to(v, tuple(lead) + (kv_len, d)).reshape(
            lead_n, kv_len, d
        )
        g = 8
        while lead_n % g:
            g //= 2
        ck = jax.checkpoint(_attn)
        out = jax.lax.map(
            lambda args: ck(*args),
            (
                q3.reshape(lead_n // g, g, nq, d),
                k3.reshape(lead_n // g, g, kv_len, d),
                v3.reshape(lead_n // g, g, kv_len, d),
            ),
        )
        return out.reshape(*lead, nq, d)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(q, k, v)
