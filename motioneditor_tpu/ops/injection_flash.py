"""Fused fg/bg-masked injection attention kernel (Pallas TPU).

The editing branch's attention (fully_control.py:372-422) computes softmax
over K = [K_src*m, K_src*(1-m), K_tgt_cur] with V = [V_src, V_src, V_tgt_cur]
(values NOT masked). Key algebraic identity: the mask multiplies a whole key
vector by a scalar, so

    q . (k_j * m_j) = m_j * (q . k_j)

which means the fg and bg score columns are elementwise rescalings of ONE
QK^T product, and because their value rows are identical the PV contraction
collapses:

    out = sum_j [exp(m_j s_j - M) + exp((1-m_j) s_j - M)] v_src_j
        + sum_t exp(s_t - M) v_tgt_t          (all over the shared softmax)

Compared to materializing the 5N-key concat (what the reference does through
xformers), this kernel does 1 QK + 1 PV over the 2N source keys instead of
2 + 2, never writes the concatenated K/V to HBM, and streams the mask as a
per-key scalar row.

Correctness oracle: control/injection.injected_spatial_attention's jnp path
(tests/test_injection_flash.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(
    q_ref,      # (1, bq, d)        pre-scaled queries
    ks_ref,     # (1, bk, d)        source K block (clamped index when in tgt phase)
    vs_ref,     # (1, bk, d)        source V block
    m_ref,      # (1, 1, bk)        fg mask over source keys
    kt_ref,     # (1, bk, d)        target-current K block (clamped in src phase)
    vt_ref,     # (1, bk, d)        target-current V block
    o_ref,      # (1, bq, d)
    m_scr,
    l_scr,
    acc_scr,
    *,
    n_src_blocks: int,
    tgt_len: int,
    block_k: int,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    prec = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def update(p, vv):
        l_scr[:, :1] = l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] + jax.lax.dot(
            p.astype(vv.dtype), vv, preferred_element_type=jnp.float32, precision=prec
        )

    @pl.when(kb < n_src_blocks)
    def _src_phase():
        kk = ks_ref[0]
        v = vs_ref[0]
        mask = m_ref[0, 0].astype(jnp.float32)  # (bk,)
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (bq, bk)
        s_fg = s * mask[None, :]
        s_bg = s - s_fg
        blk_max = jnp.maximum(
            jnp.max(s_fg, axis=-1, keepdims=True),
            jnp.max(s_bg, axis=-1, keepdims=True),
        )
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, blk_max)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha
        acc_scr[:] = acc_scr[:] * alpha
        m_scr[:, :1] = m_new
        p = jnp.exp(s_fg - m_new) + jnp.exp(s_bg - m_new)
        update(p, v)

    @pl.when(kb >= n_src_blocks)
    def _tgt_phase():
        kk = kt_ref[0]
        v = vt_ref[0]
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if tgt_len % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + (kb - n_src_blocks) * block_k
            )
            s = jnp.where(col < tgt_len, s, _NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:, :1] = l_scr[:, :1] * alpha
        acc_scr[:] = acc_scr[:] * alpha
        m_scr[:, :1] = m_new
        update(jnp.exp(s - m_new), v)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634
_CAP = 60.0  # see ops/flash_attention.py: bounded-score softmax cap


def _kernel_nomax(
    q_ref, ks_ref, vs_ref, m_ref, kt_ref, vt_ref, o_ref, l_scr, acc_scr,
    *, n_src_blocks: int, tgt_len: int, block_k: int,
):
    """bf16 fast path: shared-shift softmax without the running max
    (same bounded-score argument as flash_attention._flash_kernel_nomax;
    queries pre-scaled by scale*log2e so scores are in log2 units)."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    cap2 = _CAP * _LOG2E

    @pl.when(kb == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    # pin per-dot precision (global matmul-precision knob vs Mosaic bf16)
    prec = jax.lax.Precision.DEFAULT

    def update(p, vv):
        l_scr[:, :1] = l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] + jax.lax.dot(
            p.astype(vv.dtype), vv, preferred_element_type=jnp.float32,
            precision=prec,
        )

    @pl.when(kb < n_src_blocks)
    def _src_phase():
        kk = ks_ref[0]
        v = vs_ref[0]
        mask = m_ref[0, 0].astype(jnp.float32)  # (bk,)
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        s_fg = s * mask[None, :]
        s_bg = s - s_fg
        p = jnp.exp2(jnp.minimum(s_fg, cap2) - cap2) + jnp.exp2(
            jnp.minimum(s_bg, cap2) - cap2
        )
        update(p, v)

    @pl.when(kb >= n_src_blocks)
    def _tgt_phase():
        kk = kt_ref[0]
        v = vt_ref[0]
        s = jax.lax.dot_general(
            q, kk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if tgt_len % block_k != 0:
            col = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + (kb - n_src_blocks) * block_k
            )
            s = jnp.where(col < tgt_len, s, _NEG_INF)
        update(jnp.exp2(jnp.minimum(s, cap2) - cap2), v)

    @pl.when(kb == num_kb - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / (l_scr[:, :1] + 1e-30)).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    r = x.shape[axis] % mult
    if r == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, mult - r)
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "heads", "frames", "interpret"),
)
def _fused_3d(
    q, k_src, v_src, mask, k_tgt, v_tgt, scale, block_q, block_k, heads, frames,
    interpret,
):
    """Flattened batch ordering is (branch, frame, head); ``mask`` is
    per-frame [F, Ns] and the index map recovers frame = (b // heads) % F."""
    bh, nq, d = q.shape
    n_src = k_src.shape[1]
    n_tgt = k_tgt.shape[1]
    assert n_src % block_k == 0, "source keys (2*HW) align to block_k"

    nomax = q.dtype == jnp.bfloat16  # fp32 keeps the exact running-max path
    q_scale = scale * _LOG2E if nomax else scale
    qs = (q.astype(jnp.float32) * q_scale).astype(q.dtype)
    qp = _pad_to(qs, 1, block_q)
    kst = k_src
    ktt = _pad_to(k_tgt, 1, block_k)
    vtp = _pad_to(v_tgt, 1, block_k)
    nq_p = qp.shape[1]
    n_src_blocks = n_src // block_k
    n_tgt_blocks = ktt.shape[1] // block_k
    grid = (bh, nq_p // block_q, n_src_blocks + n_tgt_blocks)

    def src_idx(b, qi, ki):
        return (b, jnp.minimum(ki, n_src_blocks - 1), 0)

    def srcv_idx(b, qi, ki):
        return (b, jnp.minimum(ki, n_src_blocks - 1), 0)

    def mask_idx(b, qi, ki):
        frame = (b // heads) % frames
        return (frame * n_src_blocks + jnp.minimum(ki, n_src_blocks - 1), 0, 0)

    def tgt_idx(b, qi, ki):
        return (b, jnp.maximum(ki - n_src_blocks, 0), 0)

    def tgtv_idx(b, qi, ki):
        return (b, jnp.maximum(ki - n_src_blocks, 0), 0)

    # (F*n_src_blocks, 1, block_k): sublane dim 1 == full dim so Mosaic
    # accepts the (1, 1, block_k) block shape
    mask3 = mask.reshape(mask.shape[0] * n_src_blocks, 1, block_k)
    if nomax:
        kernel = functools.partial(
            _kernel_nomax, n_src_blocks=n_src_blocks, tgt_len=n_tgt, block_k=block_k
        )
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _kernel, n_src_blocks=n_src_blocks, tgt_len=n_tgt, block_k=block_k
        )
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
            pl.BlockSpec((1, block_k, d), src_idx),
            pl.BlockSpec((1, block_k, d), srcv_idx),
            pl.BlockSpec((1, 1, block_k), mask_idx),
            pl.BlockSpec((1, block_k, d), tgt_idx),
            pl.BlockSpec((1, block_k, d), tgtv_idx),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_p, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(qp, kst, v_src, mask3, ktt, vtp)
    return out[:, :nq]


def fused_injection_attention(
    q: jnp.ndarray,       # [B, F, H, Nq, D] target-branch queries
    k_src: jnp.ndarray,   # [B, F, H, Ns, D] source-branch motion-frame keys
    v_src: jnp.ndarray,   # [B, F, H, Ns, D]
    mask: jnp.ndarray,    # [F, Ns]          fg mask over source keys, per frame
    k_tgt: jnp.ndarray,   # [B, F, H, Nt, D] target current-frame keys
    v_tgt: jnp.ndarray,   # [B, F, H, Nt, D]
    scale: float,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Softmax over [K_src*m, K_src*(1-m), K_tgt] with V [V_src, V_src, V_tgt]
    without materializing the concatenation (see module docstring).

    Differentiable via the XLA concat oracle (ops/diffable.py)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    b, f, h, nq, d = q.shape
    ns, nt = k_src.shape[-2], k_tgt.shape[-2]
    # score + PV matmuls over the [2*Ns fg/bg-src + Nt tgt] virtual concat
    add_kernel_flops(2 * 2 * b * f * h * nq * (2 * ns + nt) * d)
    bk = min(block_k, ns)
    while ns % bk != 0:
        bk //= 2
    bq = min(block_q, max(128, nq))
    interpret = jax.default_backend() != "tpu"

    def _kernel_path(q, k_src, v_src, mask, k_tgt, v_tgt):
        out = _fused_3d(
            q.reshape(-1, nq, d),
            k_src.reshape(-1, ns, d),
            v_src.reshape(-1, ns, d),
            mask.astype(jnp.float32),
            k_tgt.reshape(-1, nt, d),
            v_tgt.reshape(-1, nt, d),
            float(scale), bq, bk, h, f, interpret,
        )
        return out.reshape(b, f, h, nq, d)

    def _oracle(q, k_src, v_src, mask, k_tgt, v_tgt):
        m = mask.astype(k_src.dtype)[None, :, None, :, None]  # [1,F,1,Ns,1]
        k_cat = jnp.concatenate([k_src * m, k_src * (1.0 - m), k_tgt], axis=-2)
        v_cat = jnp.concatenate([v_src, v_src, v_tgt], axis=-2)
        scores = jnp.einsum(
            "...qd,...kd->...qk", q, k_cat, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(v_cat.dtype)
        return jnp.einsum("...qk,...kd->...qd", probs, v_cat)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(
        q, k_src, v_src, mask, k_tgt, v_tgt
    )
