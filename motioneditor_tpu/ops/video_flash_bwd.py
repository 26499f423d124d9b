"""Flash BACKWARD kernels for the packed-head video attention (Pallas TPU).

The reference trains and null-text-optimizes through xformers'
memory_efficient_attention, whose fused backward never materializes the
score matrices (attention_2d.py:246-253). This module is the TPU
equivalent for ops/video_flash.video_flash_attention: a custom VJP whose
forward saves only O(N·H) softmax statistics and whose backward recomputes
score tiles block-by-block in VMEM.

Math (standard flash backward, per head h):
    P  = softmax(S),  S = scale * Q_h K_h^T   (restricted to sel(f) frames)
    D  = rowsum(dO_h ∘ O_h)
    dV = P^T dO_h
    dP = dO_h V_h^T
    dS = P ∘ (dP - D)
    dQ = scale * dS K_h          dK = scale * dS^T Q_h

P is recomputed from the saved per-row-per-head log-sum-exp:
  - bf16 (bounded no-max forward):  P = exp2(min(s2, CAP') - lse2),
    s2 = (scale*log2e)·(q·k), lse2 = CAP' + log2(l).  dS additionally
    carries the clamp indicator [s2 < CAP'] so the kernel gradient is the
    exact gradient OF THE KERNEL'S forward (identical to exact softmax
    whenever scores stay under the cap — see ops/flash_attention._CAP).
  - fp32 (running-max forward):     P = exp(s - lse), lse = m + ln(l).

Frame-selection modes reuse the forward's grid index maps. dQ streams kv
blocks per target frame exactly like the forward. dK/dV are computed as
per-(target-frame, source-slot) PARTIALS [B, F, S, N, C] — each (bq, bk)
tile's contribution accumulates in VMEM over the q-block grid axis — and
the tiny frame-scatter (which source frame each slot feeds: prev/cur/first)
is a handful of XLA index-adds on the partials afterwards. ``dense`` mode
keeps the XLA-oracle VJP (all-to-all scatter; only used by the optional
st_attn block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from motioneditor_tpu.ops.video_flash import (
    _CAP,
    _LOG2E,
    _NEG_INF,
    _head_lane_matrix,
)

_CAP2 = _CAP * _LOG2E


def pick_blocks_bwd(n: int, c: int, itemsize: int, heads: int = 8):
    """(block_q, block_k) for the backward kernels, or None.

    The dq/dkv kernels stream up to 4 q-sized and 4 kv-sized blocks
    (q, dout, out, dq / k, v, dkp, dvp) plus fp32 accumulators and ~4 live
    fp32 score tiles per (bq, bk) step (s, p, dp, ds); the fp32 variants
    unroll the head loop like the forward and budget live tiles per head
    (see ops/video_flash._pick_blocks calibration notes)."""
    for bq, bk in ((256, 512), (256, 256), (128, 256), (128, 128)):
        if bq > n or bk > n or n % bq or n % bk:
            continue
        io = itemsize * c * (4 * bq + 4 * bk) * 2  # double-buffered streams
        scratch = 4 * c * (bq + 2 * bk) + 3 * 4 * 128 * bq
        live = 3 * heads if itemsize >= 4 else 4
        s_tiles = live * 4 * bq * bk
        if io + scratch + s_tiles <= 10_000_000:
            return bq, bk
    return None


def _sources(mode: str, f: int) -> int:
    if mode == "normal":
        return 1
    if mode in ("sparse_causal", "motion_frame"):
        return 2
    raise ValueError(mode)


def _src_frame(mode: str, src, fr):
    """Source frame index for kv slot ``src`` of target frame ``fr``
    (mirrors ops/video_flash._video_flash kv_idx)."""
    if mode == "normal":
        return fr
    if mode == "motion_frame":
        return jnp.where(src == 0, jnp.maximum(fr - 1, 0), fr)
    if mode == "sparse_causal":
        return jnp.where(src == 0, 0, jnp.maximum(fr - 1, 0))
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# forward-with-residuals: the forward kernels, additionally emitting the
# per-row-per-head log-sum-exp in the first `heads` lanes of a 128-lane buf
# ---------------------------------------------------------------------------


def _fwd_res_nomax(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_scr, l_scr, *, heads, q_scale
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        l_scr[:] = jnp.zeros_like(l_scr)

    prec = jax.lax.Precision.DEFAULT
    qb = q_ref[0, 0]
    kb_blk = k_ref[0, 0]
    vb = v_ref[0, 0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = q_scale * jax.lax.dot_general(
            qb[:, sl], kb_blk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        p = jnp.exp2(jnp.minimum(s, _CAP2) - _CAP2)
        l_scr[:, h : h + 1] = l_scr[:, h : h + 1] + jnp.sum(p, -1, keepdims=True)
        acc_scr[:, sl] = acc_scr[:, sl] + jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl],
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l = l_scr[:] + 1e-30
        l_lane = jax.lax.dot(
            l[:, :heads], _head_lane_matrix(heads, d),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc_scr[:] / l_lane).astype(o_ref.dtype)
        lse_ref[0, 0] = _CAP2 + jnp.log2(l)


def _fwd_res_maxsafe(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_scr, l_scr, m_scr, *, heads,
    q_scale,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    c = q_ref.shape[-1]
    d = c // heads

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        l_scr[:] = jnp.zeros_like(l_scr)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)

    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    qb = q_ref[0, 0]
    kb_blk = k_ref[0, 0]
    vb = v_ref[0, 0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = q_scale * jax.lax.dot_general(
            qb[:, sl], kb_blk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        m_prev = m_scr[:, h : h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[:, h : h + 1] = alpha * l_scr[:, h : h + 1] + jnp.sum(
            p, -1, keepdims=True
        )
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl],
            preferred_element_type=jnp.float32, precision=prec,
        )
        m_scr[:, h : h + 1] = m_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_lane = jax.lax.dot(
            l_scr[:, :heads], _head_lane_matrix(heads, d),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc_scr[:] / l_lane).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:] + jnp.log(l_scr[:] + 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "scale", "heads", "block_q", "block_k", "interpret"),
)
def video_flash_fwd_res(q, k, v, mode, scale, heads, block_q, block_k, interpret):
    """Forward pass returning (out, lse [B, F, N, 128] fp32)."""
    b, f, n, c = q.shape
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale

    nb = n // block_k
    grid = (b * f, n // block_q, _sources(mode, f) * nb)

    def q_idx(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    def kv_idx(bfi, qi, ki):
        return (bfi // f, _src_frame(mode, ki // nb, bfi % f), ki % nb, 0)

    if nomax:
        kernel = functools.partial(_fwd_res_nomax, heads=heads, q_scale=q_scale)
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _fwd_res_maxsafe, heads=heads, q_scale=q_scale
        )
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, c), q_idx),
            pl.BlockSpec((1, 1, block_k, c), kv_idx),
            pl.BlockSpec((1, 1, block_k, c), kv_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, c), q_idx),
            pl.BlockSpec((1, 1, block_q, 128), q_idx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, f, n, 128), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# dQ kernel: forward-shaped grid, kv blocks stream per target frame
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, dq_scr, d_scr,
    *, heads, nomax, dq_mult, q_scale,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    c = q_ref.shape[-1]
    d = c // heads
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    qb = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]

    @pl.when(kb == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)
        # D_h = rowsum(dO_h ∘ O_h), one lane per head
        d_scr[:] = jnp.zeros_like(d_scr)
        prod = (do.astype(jnp.float32)) * (o_ref[0, 0].astype(jnp.float32))
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            d_scr[:, h : h + 1] = jnp.sum(prod[:, sl], -1, keepdims=True)

    kk = k_ref[0, 0]
    vv = v_ref[0, 0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = q_scale * jax.lax.dot_general(
            qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if nomax:
            p = jnp.exp2(jnp.minimum(s, _CAP2) - lse[:, h : h + 1])
        else:
            p = jnp.exp(s - lse[:, h : h + 1])
        dp = jax.lax.dot_general(
            do[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        ds = p * (dp - d_scr[:, h : h + 1])
        if nomax:
            ds = jnp.where(s < _CAP2, ds, 0.0)
        dq_scr[:, sl] = dq_scr[:, sl] + jax.lax.dot(
            ds.astype(kk.dtype), kk[:, sl],
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_scr[:] * dq_mult).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# dK/dV kernel: per-(target frame, source slot) partials, q blocks innermost
# ---------------------------------------------------------------------------


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dkp_ref, dvp_ref,
    dk_scr, dv_scr, *, heads, nomax, dk_mult, q_scale,
):
    qi = pl.program_id(3)
    num_q = pl.num_programs(3)
    c = q_ref.shape[-1]
    d = c // heads
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qb = q_ref[0, 0]
    kk = k_ref[0, 0]
    vv = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    prod = (do.astype(jnp.float32)) * (o_ref[0, 0].astype(jnp.float32))
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s = q_scale * jax.lax.dot_general(
            qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if nomax:
            p = jnp.exp2(jnp.minimum(s, _CAP2) - lse[:, h : h + 1])
        else:
            p = jnp.exp(s - lse[:, h : h + 1])
        # dV_h += P^T dO_h   (contract the q rows)
        dv_scr[:, sl] = dv_scr[:, sl] + jax.lax.dot_general(
            p.astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            do[:, sl], vv[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dh = jnp.sum(prod[:, sl], -1, keepdims=True)
        ds = p * (dp - dh)
        if nomax:
            ds = jnp.where(s < _CAP2, ds, 0.0)
        # dK_h += dS^T Q_h (q raw; dk_mult carries the scale factor)
        dk_scr[:, sl] = dk_scr[:, sl] + jax.lax.dot_general(
            ds.astype(qb.dtype), qb[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(qi == num_q - 1)
    def _finalize():
        dkp_ref[0, 0, 0] = (dk_scr[:] * dk_mult).astype(dkp_ref.dtype)
        dvp_ref[0, 0, 0] = dv_scr[:].astype(dvp_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "scale", "heads", "block_q", "block_k", "interpret"),
)
def video_flash_bwd(q, k, v, out, lse, do, mode, scale, heads,
                    block_q, block_k, interpret):
    """Full backward: returns (dq, dk, dv) in the primal dtype."""
    b, f, n, c = q.shape
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale
    # q enters the kernels RAW (scores scaled in-VMEM, see the forward
    # kernels' q_scale note), so both dQ = scale * dS K and
    # dK = scale * dS^T Q carry the plain scale factor.
    dq_mult = scale
    dk_mult = scale

    nb = n // block_k
    nq = n // block_q
    n_src = _sources(mode, f)
    part_dtype = q.dtype if nomax else jnp.float32

    def q_idx3(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    def kv_idx3(bfi, qi, ki):
        return (bfi // f, _src_frame(mode, ki // nb, bfi % f), ki % nb, 0)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, heads=heads, nomax=nomax, dq_mult=dq_mult,
            q_scale=q_scale,
        ),
        grid=(b * f, nq, n_src * nb),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, c), q_idx3),
            pl.BlockSpec((1, 1, block_k, c), kv_idx3),
            pl.BlockSpec((1, 1, block_k, c), kv_idx3),
            pl.BlockSpec((1, 1, block_q, c), q_idx3),
            pl.BlockSpec((1, 1, block_q, c), q_idx3),
            pl.BlockSpec((1, 1, block_q, 128), q_idx3),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, c), q_idx3),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, out, lse)

    # partials: grid (b*f, src, kv_block, q_block) — q innermost so each
    # output block's accumulation is a consecutive revisit sequence
    def q_idx4(bfi, src, ki, qi):
        return (bfi // f, bfi % f, qi, 0)

    def kv_idx4(bfi, src, ki, qi):
        return (bfi // f, _src_frame(mode, src, bfi % f), ki, 0)

    def p_idx4(bfi, src, ki, qi):
        return (bfi // f, bfi % f, src, ki, 0)

    dkp, dvp = pl.pallas_call(
        functools.partial(
            _dkv_kernel, heads=heads, nomax=nomax, dk_mult=dk_mult,
            q_scale=q_scale,
        ),
        grid=(b * f, n_src, nb, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, c), q_idx4),
            pl.BlockSpec((1, 1, block_k, c), kv_idx4),
            pl.BlockSpec((1, 1, block_k, c), kv_idx4),
            pl.BlockSpec((1, 1, block_q, c), q_idx4),
            pl.BlockSpec((1, 1, block_q, c), q_idx4),
            pl.BlockSpec((1, 1, block_q, 128), q_idx4),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, block_k, c), p_idx4),
            pl.BlockSpec((1, 1, 1, block_k, c), p_idx4),
        ],
        # partials materialize in the primal dtype for bf16 runs: VMEM
        # accumulation is fp32 either way, only the HBM staging buffer and
        # the handful of frame scatter-adds run at bf16 — this halves the
        # backward's largest transient (24f 512px null-text OOMs otherwise)
        out_shape=[
            jax.ShapeDtypeStruct((b, f, n_src, n, c), part_dtype),
            jax.ShapeDtypeStruct((b, f, n_src, n, c), part_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, c), jnp.float32),
            pltpu.VMEM((block_k, c), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, out, lse)

    dk = _combine_partials(dkp, mode).astype(k.dtype)
    dv = _combine_partials(dvp, mode).astype(v.dtype)
    return dq, dk, dv


def flash_vjp_attention(q, k, v, mode: str, scale: float, heads: int,
                        fwd_blocks, bwd_blocks, interpret: bool):
    """video_flash_attention with a FULLY-FUSED flash backward.

    Primal-only evaluation runs the plain forward kernel; under jax.vjp the
    forward additionally emits per-row log-sum-exp residuals and the backward
    recomputes score tiles in VMEM (never materializing [N, N] in HBM).
    The gradient is the exact gradient of the kernel's own forward (including
    the bf16 bounded-score clamp — see module docstring)."""
    from motioneditor_tpu.ops.video_flash import _video_flash

    fbq, fbk = fwd_blocks
    bbq, bbk = bwd_blocks

    @jax.custom_vjp
    def f(q, k, v):
        return _video_flash(q, k, v, mode, scale, heads, fbq, fbk, interpret)

    def fwd(q, k, v):
        out, lse = video_flash_fwd_res(
            q, k, v, mode, scale, heads, fbq, fbk, interpret
        )
        return out, (q, k, v, out, lse)

    def bwd(res, g):
        q, k, v, out, lse = res
        return video_flash_bwd(
            q, k, v, out, lse, g.astype(q.dtype), mode, scale, heads,
            bbq, bbk, interpret,
        )

    f.defvjp(fwd, bwd)
    return f(q, k, v)


def _combine_partials(p, mode: str):
    """Scatter per-(target, slot) partials [B, F, S, N, C] onto source
    frames [B, F, N, C] (the inverse of the forward's kv frame selection;
    a few XLA index-adds, negligible next to the kernels)."""
    if mode == "normal":
        return p[:, :, 0]
    if mode == "motion_frame":
        # slot 1 = cur (1-1); slot 0 = prev: target f -> frame max(f-1, 0)
        g = p[:, :, 1]
        g = g.at[:, 0].add(p[:, 0, 0])
        return g.at[:, :-1].add(p[:, 1:, 0])
    if mode == "sparse_causal":
        # slot 0 = first: every target -> frame 0; slot 1 = prev
        g = jnp.zeros_like(p[:, :, 0])
        g = g.at[:, 0].add(p[:, :, 0].sum(axis=1))
        g = g.at[:, 0].add(p[:, 0, 1])
        return g.at[:, :-1].add(p[:, 1:, 1])
    raise ValueError(mode)
