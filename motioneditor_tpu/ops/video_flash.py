"""Packed-head video flash attention (Pallas TPU).

The second-generation spatial attention kernel: takes projected q/k/v in the
NATIVE video token layout [B, F, N, C] and performs BOTH the head split and
the frame-selection K/V build INSIDE the kernel:

  - heads: each program loads (bq, C)/(bk, C) blocks and statically
    lane-slices the per-head d=40 columns. Measured equal to the split-head
    kernel on pure kernel time (33.7 vs 32.8 ms at the level-0 shape) while
    eliminating the [.., N, H, D] relayout copies of split_heads/merge_heads
    on q, k, v AND the output (~25-30 ms per 3 steps in traces).
  - frames: the K/V source frames of the reference's attention variants
    (attention_2d.py:573-580, :732-740, :651-657) are selected by the grid
    index map, so the [first|prev|cur] concats (select_kv) are never
    materialized in HBM:
        normal        kv blocks = [f]
        sparse_causal kv blocks = [frame 0 | frame f-1]   (f=0: [0 | 0])
        motion_frame  kv blocks = [frame f-1 | frame f]   (f=0: [0 | 0])
        dense         kv blocks = [frame 0 .. frame F-1]
    The f=0 duplicate reads reproduce the reference's duplicated-key softmax
    weighting exactly (the oracle concatenates x[:, former] with former[0]=0).

Softmax: bf16 inputs use the bounded-score no-max form (see
ops/flash_attention.py _CAP note); fp32 inputs keep an exact per-head
running max for parity runs. Off-TPU the kernel runs in interpret mode.

Requires N % block_k == 0 and nq % block_q == 0 — the caller
(ops/attention.spatial_self_attention) gates on this and falls back to the
select_kv + split-head path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634
_CAP = 60.0

BLOCK_Q = 512
BLOCK_K = 1024

# mode -> number of kv source passes (dense resolved separately)
_MODES = ("normal", "sparse_causal", "motion_frame", "dense")


def _pick_blocks(n: int, c: int, itemsize: int, kv_streams: int, heads: int = 8):
    """(block_q, block_k) for kernels whose q and kv token counts are both
    ``n`` (the in-kernel frame-selection variants)."""
    return _pick_blocks_qk(n, n, c, itemsize, kv_streams, heads)


def _pick_blocks_qk(
    nq: int, nk: int, c: int, itemsize: int, kv_streams: int, heads: int = 8
):
    """(block_q, block_k) fitting VMEM for a kernel with ``kv_streams``
    K/V-sized input streams (2 for plain attention, 4 for injection), or
    None if no candidate divides nq/nk. Budget: double-buffered in/out
    blocks + fp32 acc/l scratch + live fp32 score tiles, under ~10MB of
    16MB VMEM.

    Live-tile counts are calibrated against measured Mosaic stack OOMs:
    bf16 kernels keep ~2 (plain: s, p) / ~4 (injection src phase: s,
    s_fg/s_bg, exp2 terms) tiles (16.05M actual at 512/1024 C=320 inj);
    the fp32 running-max kernels keep temporaries from the whole unrolled
    head loop alive (~1.6 tiles/head measured: 19.15M at 512/512 C=320
    plain), so they budget per head."""
    for bq, bk in (
        (512, 1024), (512, 512), (256, 512), (256, 256), (128, 256), (128, 128)
    ):
        if bq > nq or bk > nk or nq % bq or nk % bk:
            continue
        io = itemsize * c * (2 * bq + kv_streams * bk) * 2
        scratch = 4 * c * bq + 2 * 4 * 128 * bq
        if itemsize >= 4:
            live = (3 if kv_streams >= 4 else 2) * heads
        else:
            live = 4 if kv_streams >= 4 else 2
        s_tiles = live * 4 * bq * bk
        if io + scratch + s_tiles <= 10_000_000:
            return bq, bk
    return None


def _head_lane_matrix(heads: int, d: int):
    """(H, H*d) one-hot expanding a per-head column to that head's lanes."""
    hh = jax.lax.broadcasted_iota(jnp.int32, (heads, heads * d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (heads, heads * d), 1) // d
    return (hh == cols).astype(jnp.float32)


def _kernel_nomax(
    q_ref, k_ref, v_ref, o_ref, acc_scr, l_scr, *, heads: int, q_scale: float
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    c = q_ref.shape[-1]
    d = c // heads
    cap2 = _CAP * _LOG2E

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        l_scr[:] = jnp.zeros_like(l_scr)

    prec = jax.lax.Precision.DEFAULT
    qb = q_ref[0, 0]  # (bq, C), raw
    kb_blk = k_ref[0, 0]  # (bk, C)
    vb = v_ref[0, 0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        # scale*log2e applied to the fp32 score tile IN-KERNEL: a VPU
        # multiply hidden under the MXU passes (v6 ablation), vs the old
        # HBM-level q pre-scale which materialized a full fp32 relayout
        # copy per call (elementwise ops cannot fuse into a pallas_call
        # operand) — ~10.6 ms/step of the 24f denoise trace.
        s = q_scale * jax.lax.dot_general(
            qb[:, sl], kb_blk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        p = jnp.exp2(jnp.minimum(s, cap2) - cap2)
        l_scr[:, h : h + 1] = l_scr[:, h : h + 1] + jnp.sum(p, -1, keepdims=True)
        acc_scr[:, sl] = acc_scr[:, sl] + jax.lax.dot(
            p.astype(vb.dtype), vb[:, sl],
            preferred_element_type=jnp.float32, precision=prec,
        )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_lane = jax.lax.dot(
            l_scr[:, :heads], _head_lane_matrix(heads, d),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc_scr[:] / (l_lane + 1e-30)).astype(o_ref.dtype)


def _kernel_maxsafe(
    q_ref, k_ref, v_ref, o_ref, acc_scr, l_scr, m_scr, *, heads: int,
    q_scale: float,
):
    """fp32 parity path: exact per-head running-max softmax."""
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


@functools.partial(
    jax.jit,
    static_argnames=("mode", "scale", "heads", "block_q", "block_k", "interpret"),
)
def _video_flash(q, k, v, mode: str, scale: float, heads: int,
                 block_q: int, block_k: int, interpret: bool):
    b, f, n, c = q.shape
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale

    nb = n // block_k  # kv blocks per source frame
    if mode == "normal":
        sources = 1
    elif mode in ("sparse_causal", "motion_frame"):
        sources = 2
    elif mode == "dense":
        sources = f
    else:
        raise ValueError(mode)
    grid = (b * f, n // block_q, sources * nb)

    def q_idx(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    def kv_idx(bfi, qi, ki):
        fr = bfi % f
        blk = ki % nb
        src = ki // nb  # which source pass
        if mode == "normal":
            frame = fr
        elif mode == "motion_frame":
            frame = jnp.where(src == 0, jnp.maximum(fr - 1, 0), fr)
        elif mode == "sparse_causal":
            frame = jnp.where(src == 0, 0, jnp.maximum(fr - 1, 0))
        else:  # dense
            frame = src
        return (bfi // f, frame, blk, 0)

    if nomax:
        kernel = functools.partial(_kernel_nomax, heads=heads, q_scale=q_scale)
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _kernel_maxsafe, heads=heads, q_scale=q_scale
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
        out_specs=pl.BlockSpec((1, 1, block_q, c), q_idx),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


def video_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mode: str,
    scale: float,
    heads: int,
) -> jnp.ndarray:
    """Spatial video attention on [B, F, N, C] with in-kernel head packing
    and frame-selection K/V (see module docstring). Returns q's shape.

    Differentiable: frame-selection modes carry a fully-fused flash backward
    (ops/video_flash_bwd.py — the TPU answer to xformers' fused bwd,
    attention_2d.py:246-253); ``dense`` mode and VMEM-infeasible backward
    blockings fall back to the XLA oracle VJP (ops/diffable.py)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    b, f, n, c = q.shape
    kv = (f if mode == "dense" else 2 if mode != "normal" else 1) * n
    add_kernel_flops(2 * 2 * b * f * n * kv * c)  # score + PV matmuls
    blocks = _pick_blocks(n, c, q.dtype.itemsize, kv_streams=2, heads=heads)
    if blocks is None:
        raise ValueError(
            f"video_flash_attention: no VMEM-feasible blocking for n={n}, "
            f"c={c} — gate calls with video_flash_supported()"
        )
    bq, bk = blocks
    interpret = jax.default_backend() != "tpu"

    if mode != "dense":
        from motioneditor_tpu.ops.video_flash_bwd import (
            flash_vjp_attention,
            pick_blocks_bwd,
        )

        bwd_blocks = pick_blocks_bwd(n, c, q.dtype.itemsize, heads=heads)
        if bwd_blocks is not None:
            return flash_vjp_attention(
                q, k, v, mode, float(scale), heads, (bq, bk), bwd_blocks,
                interpret,
            )

    def _kernel_path(q, k, v):
        return _video_flash(q, k, v, mode, float(scale), heads, bq, bk, interpret)

    def _oracle(q, k, v):
        # Frame-chunked XLA attention: one frame's score matrix at a time
        # (lax.map) with jax.checkpoint so the scan VJP recomputes instead of
        # saving per-frame probabilities — this bounds the grad-path's
        # transient HBM to one [B*H, n, kv] fp32 tile (a full-frames einsum
        # OOMs at 512px: F x 1GB score tensors live simultaneously).
        from motioneditor_tpu.ops.attention import (
            merge_heads,
            sdpa,
            split_heads,
        )

        bb, ff, nn, cc = q.shape

        @jax.checkpoint
        def frame_attn(qf, kf, vf):
            out = sdpa(
                split_heads(qf, heads), split_heads(kf, heads),
                split_heads(vf, heads), scale, use_flash=False,
            )
            return merge_heads(out)

        def body(fi):
            qf = jnp.take(q, fi, axis=1)  # [B, n, C]
            prev = jnp.maximum(fi - 1, 0)
            if mode == "normal":
                kf = jnp.take(k, fi, axis=1)
                vf = jnp.take(v, fi, axis=1)
            elif mode == "motion_frame":
                kf = jnp.concatenate(
                    [jnp.take(k, prev, axis=1), jnp.take(k, fi, axis=1)], axis=1
                )
                vf = jnp.concatenate(
                    [jnp.take(v, prev, axis=1), jnp.take(v, fi, axis=1)], axis=1
                )
            elif mode == "sparse_causal":
                kf = jnp.concatenate([k[:, 0], jnp.take(k, prev, axis=1)], axis=1)
                vf = jnp.concatenate([v[:, 0], jnp.take(v, prev, axis=1)], axis=1)
            else:  # dense
                kf = k.reshape(bb, ff * nn, cc)
                vf = v.reshape(bb, ff * nn, cc)
            return frame_attn(qf, kf, vf)

        out = jax.lax.map(body, jnp.arange(ff))  # [F, B, n, C]
        return jnp.swapaxes(out, 0, 1)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(q, k, v)


def video_flash_supported(
    n: int, c: int, heads: int, itemsize: int = 4, injection: bool = False
) -> bool:
    """Caller-side gate: shapes the kernels handle without padding and
    within VMEM (itemsize defaults to the fp32 worst case)."""
    return (
        c % heads == 0
        and (c // heads) % 8 == 0  # lane slices on sublane-aligned boundaries
        and _pick_blocks(
            n, c, itemsize, kv_streams=4 if injection else 2, heads=heads
        )
        is not None
    )


# ---------------------------------------------------------------------------
# packed-head fg/bg injection attention (target branch rows)
# ---------------------------------------------------------------------------


def _inj_kernel_nomax(
    q_ref, ks_ref, vs_ref, m_ref, kt_ref, vt_ref, o_ref, acc_scr, l_scr,
    *, heads: int, n_src_blocks: int, q_scale: float,
):
    """bf16 target-row injection: softmax over [K_src*m, K_src*(1-m), K_tgt]
    with V [V_src, V_src, V_tgt] via the q.(k*m) = m.(q.k) identity
    (ops/injection_flash.py docstring), packed heads, frame-selected K/V."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    c = q_ref.shape[-1]
    d = c // heads
    cap2 = _CAP * _LOG2E

    @pl.when(kb == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        l_scr[:] = jnp.zeros_like(l_scr)

    prec = jax.lax.Precision.DEFAULT
    qb = q_ref[0, 0]

    @pl.when(kb < n_src_blocks)
    def _src_phase():
        kk = ks_ref[0, 0]
        vv = vs_ref[0, 0]
        mask = m_ref[0, 0].astype(jnp.float32)  # (bk,)
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = q_scale * jax.lax.dot_general(
                qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            s_fg = s * mask[None, :]
            s_bg = s - s_fg
            p = jnp.exp2(jnp.minimum(s_fg, cap2) - cap2) + jnp.exp2(
                jnp.minimum(s_bg, cap2) - cap2
            )
            l_scr[:, h : h + 1] = l_scr[:, h : h + 1] + jnp.sum(p, -1, keepdims=True)
            acc_scr[:, sl] = acc_scr[:, sl] + jax.lax.dot(
                p.astype(vv.dtype), vv[:, sl],
                preferred_element_type=jnp.float32, precision=prec,
            )

    @pl.when(kb >= n_src_blocks)
    def _tgt_phase():
        kk = kt_ref[0, 0]
        vv = vt_ref[0, 0]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = q_scale * jax.lax.dot_general(
                qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            p = jnp.exp2(jnp.minimum(s, cap2) - cap2)
            l_scr[:, h : h + 1] = l_scr[:, h : h + 1] + jnp.sum(p, -1, keepdims=True)
            acc_scr[:, sl] = acc_scr[:, sl] + jax.lax.dot(
                p.astype(vv.dtype), vv[:, sl],
                preferred_element_type=jnp.float32, precision=prec,
            )

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_lane = jax.lax.dot(
            l_scr[:, :heads], _head_lane_matrix(heads, c // heads),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc_scr[:] / (l_lane + 1e-30)).astype(o_ref.dtype)


def _inj_kernel_maxsafe(
    q_ref, ks_ref, vs_ref, m_ref, kt_ref, vt_ref, o_ref, acc_scr, l_scr, m_scr,
    *, heads: int, n_src_blocks: int, q_scale: float,
):
    """fp32 parity variant: exact per-head running max over the fg/bg/tgt
    score streams (port of ops/injection_flash._kernel)."""
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

    @pl.when(kb < n_src_blocks)
    def _src_phase():
        kk = ks_ref[0, 0]
        vv = vs_ref[0, 0]
        mask = m_ref[0, 0].astype(jnp.float32)
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = q_scale * jax.lax.dot_general(
                qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            s_fg = s * mask[None, :]
            s_bg = s - s_fg
            blk_max = jnp.maximum(
                jnp.max(s_fg, -1, keepdims=True), jnp.max(s_bg, -1, keepdims=True)
            )
            m_prev = m_scr[:, h : h + 1]
            m_new = jnp.maximum(m_prev, blk_max)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s_fg - m_new) + jnp.exp(s_bg - m_new)
            l_scr[:, h : h + 1] = alpha * l_scr[:, h : h + 1] + jnp.sum(
                p, -1, keepdims=True
            )
            acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot(
                p.astype(vv.dtype), vv[:, sl],
                preferred_element_type=jnp.float32, precision=prec,
            )
            m_scr[:, h : h + 1] = m_new

    @pl.when(kb >= n_src_blocks)
    def _tgt_phase():
        kk = kt_ref[0, 0]
        vv = vt_ref[0, 0]
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            s = q_scale * jax.lax.dot_general(
                qb[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
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
                p.astype(vv.dtype), vv[:, sl],
                preferred_element_type=jnp.float32, precision=prec,
            )
            m_scr[:, h : h + 1] = m_new

    @pl.when(kb == num_kb - 1)
    def _finalize():
        l_lane = jax.lax.dot(
            l_scr[:, :heads], _head_lane_matrix(heads, c // heads),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = (acc_scr[:] / l_lane).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "block_k", "interpret"),
)
def _video_injection(q, k_src, v_src, k_tgt, v_tgt, mask, scale: float,
                     heads: int, block_q: int, block_k: int, interpret: bool):
    b, f, n, c = q.shape
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale

    nb = n // block_k
    n_src_blocks = 2 * nb  # motion-frame source: [frame f-1 | frame f]
    grid = (b * f, n // block_q, n_src_blocks + nb)

    def q_idx(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    def src_idx(bfi, qi, ki):
        fr = bfi % f
        blk = ki % nb
        frame = jnp.where(ki < nb, jnp.maximum(fr - 1, 0), fr)
        blk = jnp.where(ki < n_src_blocks, blk, nb - 1)  # clamp in tgt phase
        frame = jnp.where(ki < n_src_blocks, frame, fr)
        return (bfi // f, frame, blk, 0)

    def mask_idx(bfi, qi, ki):
        fr = bfi % f
        blk = ki % nb
        frame = jnp.where(ki < nb, jnp.maximum(fr - 1, 0), fr)
        frame = jnp.where(ki < n_src_blocks, frame, fr)
        blk = jnp.where(ki < n_src_blocks, blk, nb - 1)
        return (frame * nb + blk, 0, 0)

    def tgt_idx(bfi, qi, ki):
        blk = jnp.where(ki >= n_src_blocks, ki - n_src_blocks, 0)
        return (bfi // f, bfi % f, blk, 0)

    mask3 = mask.reshape(f * nb, 1, block_k)

    if nomax:
        kernel = functools.partial(
            _inj_kernel_nomax, heads=heads, n_src_blocks=n_src_blocks,
            q_scale=q_scale,
        )
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _inj_kernel_maxsafe, heads=heads, n_src_blocks=n_src_blocks,
            q_scale=q_scale,
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
            pl.BlockSpec((1, 1, block_k, c), src_idx),
            pl.BlockSpec((1, 1, block_k, c), src_idx),
            pl.BlockSpec((1, 1, block_k), mask_idx),
            pl.BlockSpec((1, 1, block_k, c), tgt_idx),
            pl.BlockSpec((1, 1, block_k, c), tgt_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, c), q_idx),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k_src, v_src, mask3, k_tgt, v_tgt)


def video_injection_attention(
    q_tgt: jnp.ndarray,   # [B, F, N, C] target-row queries
    k_src: jnp.ndarray,   # [B, F, N, C] source-row keys (pre-select)
    v_src: jnp.ndarray,
    k_tgt: jnp.ndarray,   # [B, F, N, C] target-row keys (current frame only)
    v_tgt: jnp.ndarray,
    mask: jnp.ndarray,    # [F, N] fg mask, indexed by the KEY's frame
    scale: float,
    heads: int,
) -> jnp.ndarray:
    """Packed-head fused fg/bg injection attention on native video layout:
    softmax over [K_src[f-1,f]*m, K_src[f-1,f]*(1-m), K_tgt[f]] with values
    [V_src, V_src, V_tgt] (fully_control.py:372-422); motion-frame source
    selection happens via the grid index map, the mask rides as a per-key
    scalar row of the matching frame.

    Differentiable via the XLA concat oracle (ops/diffable.py)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    b, f, n, c = q_tgt.shape
    add_kernel_flops(2 * 2 * b * f * n * (3 * n) * c)  # [2N fg/bg-src + N tgt]
    blocks = _pick_blocks(n, c, q_tgt.dtype.itemsize, kv_streams=4, heads=heads)
    if blocks is None:
        raise ValueError(
            f"video_injection_attention: no VMEM-feasible blocking for n={n}, "
            f"c={c} — gate calls with video_flash_supported(injection=True)"
        )
    bq, bk = blocks
    interpret = jax.default_backend() != "tpu"

    def _kernel_path(q_tgt, k_src, v_src, k_tgt, v_tgt, mask):
        return _video_injection(
            q_tgt, k_src, v_src, k_tgt, v_tgt, mask.astype(jnp.float32),
            float(scale), heads, bq, bk, interpret,
        )

    def _oracle(q_tgt, k_src, v_src, k_tgt, v_tgt, mask):
        from motioneditor_tpu.control.injection import motion_frame_mask
        from motioneditor_tpu.ops.attention import (
            MOTION_FRAME,
            merge_heads,
            sdpa,
            select_kv,
            split_heads,
        )

        k_mf = select_kv(k_src, MOTION_FRAME)  # [B, F, 2N, C]
        v_mf = select_kv(v_src, MOTION_FRAME)
        m = motion_frame_mask(mask[..., None]).astype(k_mf.dtype)  # [F, 2N, 1]
        k_inj = jnp.concatenate([k_mf * m, k_mf * (1.0 - m), k_tgt], axis=2)
        v_inj = jnp.concatenate([v_mf, v_mf, v_tgt], axis=2)
        out = sdpa(
            split_heads(q_tgt, heads),
            split_heads(k_inj, heads),
            split_heads(v_inj, heads),
            scale, use_flash=False,
        )
        return merge_heads(out)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(
        q_tgt, k_src, v_src, k_tgt, v_tgt, mask
    )


# ---------------------------------------------------------------------------
# explicit-KV variants (the frame-sharded hot path)
#
# Under a frame-sharded mesh the in-kernel frame-selection index maps above
# cannot reach across device boundaries, so the shard_map wrappers in
# parallel/flash_sharding.py build each frame's K/V source EXPLICITLY with
# collectives (ppermute halo for the prev frame, all-gather for frame 0 /
# dense) and hand the kernels identity-mapped [B, Fk, M, C] sources. Same
# kernel bodies, different index maps. Fk == F means per-frame K/V; Fk == 1
# means one shared source for all frames (the dense / all-gathered case).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "block_k", "interpret"),
)
def _video_flash_kv(q, k, v, scale: float, heads: int,
                    block_q: int, block_k: int, interpret: bool):
    b, f, n, c = q.shape
    fk, m = k.shape[1], k.shape[2]
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale

    grid = (b * f, n // block_q, m // block_k)

    def q_idx(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    if fk == 1:
        def kv_idx(bfi, qi, ki):
            return (bfi // f, 0, ki, 0)
    else:
        def kv_idx(bfi, qi, ki):
            return (bfi // f, bfi % f, ki, 0)

    if nomax:
        kernel = functools.partial(_kernel_nomax, heads=heads, q_scale=q_scale)
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _kernel_maxsafe, heads=heads, q_scale=q_scale
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
        out_specs=pl.BlockSpec((1, 1, block_q, c), q_idx),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


def video_flash_kv_supported(
    nq: int, m: int, c: int, heads: int, itemsize: int = 4, injection: bool = False
) -> bool:
    """Gate for the explicit-KV kernels (q tokens nq, kv tokens m)."""
    return (
        c % heads == 0
        and (c // heads) % 8 == 0
        and _pick_blocks_qk(
            nq, m, c, itemsize, kv_streams=4 if injection else 2, heads=heads
        )
        is not None
    )


def video_flash_attention_kv(
    q: jnp.ndarray,      # [B, F, N, C]
    k: jnp.ndarray,      # [B, Fk, M, C], Fk in {1, F}
    v: jnp.ndarray,
    scale: float,
    heads: int,
) -> jnp.ndarray:
    """Packed-head flash attention with an EXPLICIT per-frame K/V source
    (see section comment). Differentiable via a frame-chunked XLA oracle —
    inside shard_map the oracle's VJP flows back through the halo
    collectives that built k/v (ppermute/all-gather transposes)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    b, f, n, c = q.shape
    fk, m = k.shape[1], k.shape[2]
    add_kernel_flops(2 * 2 * b * f * n * m * c)
    blocks = _pick_blocks_qk(n, m, c, q.dtype.itemsize, kv_streams=2, heads=heads)
    if blocks is None:
        raise ValueError(
            f"video_flash_attention_kv: no VMEM-feasible blocking for nq={n}, "
            f"m={m}, c={c} — gate calls with video_flash_kv_supported()"
        )
    bq, bk = blocks
    interpret = jax.default_backend() != "tpu"

    def _kernel_path(q, k, v):
        return _video_flash_kv(q, k, v, float(scale), heads, bq, bk, interpret)

    def _oracle(q, k, v):
        from motioneditor_tpu.ops.attention import merge_heads, sdpa, split_heads

        @jax.checkpoint
        def frame_attn(qf, kf, vf):
            out = sdpa(
                split_heads(qf, heads), split_heads(kf, heads),
                split_heads(vf, heads), scale, use_flash=False,
            )
            return merge_heads(out)

        def body(fi):
            qf = jnp.take(q, fi, axis=1)
            kf = jnp.take(k, jnp.minimum(fi, fk - 1), axis=1)
            vf = jnp.take(v, jnp.minimum(fi, fk - 1), axis=1)
            return frame_attn(qf, kf, vf)

        out = jax.lax.map(body, jnp.arange(f))  # [F, B, n, C]
        return jnp.swapaxes(out, 0, 1)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(q, k, v)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "heads", "block_q", "block_k", "interpret"),
)
def _video_injection_kv(q, k_src, v_src, mask, k_tgt, v_tgt, scale: float,
                        heads: int, block_q: int, block_k: int, interpret: bool):
    b, f, n, c = q.shape
    m_src = k_src.shape[2]
    nomax = q.dtype == jnp.bfloat16
    q_scale = scale * _LOG2E if nomax else scale

    nb_src = m_src // block_k
    nb_tgt = n // block_k
    grid = (b * f, n // block_q, nb_src + nb_tgt)

    def q_idx(bfi, qi, ki):
        return (bfi // f, bfi % f, qi, 0)

    def src_idx(bfi, qi, ki):
        blk = jnp.where(ki < nb_src, ki, nb_src - 1)  # clamp in tgt phase
        return (bfi // f, bfi % f, blk, 0)

    def mask_idx(bfi, qi, ki):
        blk = jnp.where(ki < nb_src, ki, nb_src - 1)
        return ((bfi % f) * nb_src + blk, 0, 0)

    def tgt_idx(bfi, qi, ki):
        blk = jnp.where(ki >= nb_src, ki - nb_src, 0)
        return (bfi // f, bfi % f, blk, 0)

    mask3 = mask.reshape(f * nb_src, 1, block_k)

    if nomax:
        kernel = functools.partial(
            _inj_kernel_nomax, heads=heads, n_src_blocks=nb_src,
            q_scale=q_scale,
        )
        scratch = [
            pltpu.VMEM((block_q, c), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _inj_kernel_maxsafe, heads=heads, n_src_blocks=nb_src,
            q_scale=q_scale,
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
            pl.BlockSpec((1, 1, block_k, c), src_idx),
            pl.BlockSpec((1, 1, block_k, c), src_idx),
            pl.BlockSpec((1, 1, block_k), mask_idx),
            pl.BlockSpec((1, 1, block_k, c), tgt_idx),
            pl.BlockSpec((1, 1, block_k, c), tgt_idx),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, c), q_idx),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k_src, v_src, mask3, k_tgt, v_tgt)


def video_injection_attention_kv(
    q_tgt: jnp.ndarray,   # [B, F, N, C] target-row queries
    k_src: jnp.ndarray,   # [B, F, M, C] EXPLICIT source K (e.g. [prev|cur])
    v_src: jnp.ndarray,
    k_tgt: jnp.ndarray,   # [B, F, N, C] target-row keys (current frame)
    v_tgt: jnp.ndarray,
    mask: jnp.ndarray,    # [F, M] fg mask aligned with k_src's token axis
    scale: float,
    heads: int,
) -> jnp.ndarray:
    """fg/bg injection attention with an explicit source K/V (the sharded
    twin of video_injection_attention: softmax over [K_src*m, K_src*(1-m),
    K_tgt], values [V_src, V_src, V_tgt], fully_control.py:372-422)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    b, f, n, c = q_tgt.shape
    m_src = k_src.shape[2]
    add_kernel_flops(2 * 2 * b * f * n * (m_src + n) * c)
    blocks = _pick_blocks_qk(
        n, min(m_src, n), c, q_tgt.dtype.itemsize, kv_streams=4, heads=heads
    )
    if blocks is None or m_src % blocks[1]:
        raise ValueError(
            f"video_injection_attention_kv: no VMEM-feasible blocking for "
            f"n={n}, m={m_src}, c={c}"
        )
    bq, bk = blocks
    interpret = jax.default_backend() != "tpu"

    def _kernel_path(q_tgt, k_src, v_src, k_tgt, v_tgt, mask):
        return _video_injection_kv(
            q_tgt, k_src, v_src, mask.astype(jnp.float32), k_tgt, v_tgt,
            float(scale), heads, bq, bk, interpret,
        )

    def _oracle(q_tgt, k_src, v_src, k_tgt, v_tgt, mask):
        from motioneditor_tpu.ops.attention import merge_heads, sdpa, split_heads

        m = mask[None, ..., None].astype(k_src.dtype)  # [1, F, M, 1]
        k_inj = jnp.concatenate([k_src * m, k_src * (1.0 - m), k_tgt], axis=2)
        v_inj = jnp.concatenate([v_src, v_src, v_tgt], axis=2)
        out = sdpa(
            split_heads(q_tgt, heads),
            split_heads(k_inj, heads),
            split_heads(v_inj, heads),
            scale, use_flash=False,
        )
        return merge_heads(out)

    return kernel_with_xla_vjp(_kernel_path, _oracle)(
        q_tgt, k_src, v_src, k_tgt, v_tgt, mask
    )
