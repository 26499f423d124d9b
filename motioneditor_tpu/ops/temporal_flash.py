"""Pallas TPU kernel for temporal self-attention over the frame axis.

The reference's ``TemporalSelfAttention`` (temporal_attn.py:14) attends over
frames at every spatial site: tokens [B, F, N, C] are viewed as N*H
independent length-F sequences of d=C/H channels. F is tiny (8-24), so on
TPU the XLA lowering of this shape is pathological: it transposes the whole
activation to [B, N, F, C], splits heads ([B, N, H, F, D] relayout copies),
and materializes a [B, N, H, F, F] fp32 score tensor in HBM — measured
~2.5 ms/layer of pure data movement at 64x64 (profiles in PERF.md).

This kernel keeps the NATIVE token layout end to end: blocks of
[F, bn, C] stream through VMEM, and the per-head score reduction uses the
head-summing matmul trick so no head split ever happens:

    s[n, h] = sum_c q[f, n, c] * k[g, n, c] * M[c, h],   M[c, h] = [c//d == h]

i.e. one elementwise product (VPU) + one (bn, C) x (C, H) matmul (MXU) per
frame pair, then probabilities are broadcast back per channel with M^T and
the PV contraction is an elementwise FMA against v[g]. The F x F pair loop
is fully unrolled at trace time; causal masking is exact (g > f pairs are
never computed, matching the additive -1e4 mask of attention_2d.py:542-543
to within exp(-1e4) ~= 0).

Softmax is computed in fp32 regardless of input dtype (parity with the
reference's fp32-upcast attention); off-TPU the kernel runs in interpret
mode so the same path is unit-testable on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_matrix(c: int, heads: int):
    """(C, H) 0/1 matrix summing each head's channel block."""
    d = c // heads
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // d
    hh = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    return (ch == hh).astype(jnp.float32)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, causal: bool, scale: float):
    f_len = q_ref.shape[1]
    c = q_ref.shape[3]
    m_mat = _head_matrix(c, heads)
    mt_mat = m_mat.T

    ks = [k_ref[0, g].astype(jnp.float32) for g in range(f_len)]
    vs = [v_ref[0, g] for g in range(f_len)]

    for f in range(f_len):
        qf = q_ref[0, f].astype(jnp.float32)  # (bn, C)
        glim = (f + 1) if causal else f_len
        s_list = []
        for g in range(glim):
            e = qf * ks[g]
            s = jax.lax.dot(e, m_mat, preferred_element_type=jnp.float32)
            s_list.append(s * scale)  # (bn, H)
        m = s_list[0]
        for s in s_list[1:]:
            m = jnp.maximum(m, s)
        ps = [jnp.exp(s - m) for s in s_list]
        l = ps[0]
        for p in ps[1:]:
            l = l + p
        inv = 1.0 / l
        acc = None
        for g in range(glim):
            pc = jax.lax.dot(ps[g] * inv, mt_mat, preferred_element_type=jnp.float32)
            term = pc * vs[g].astype(jnp.float32)
            acc = term if acc is None else acc + term
        o_ref[0, f] = acc.astype(o_ref.dtype)


def _pick_block_n(n: int, f: int, c: int, itemsize: int) -> int:
    """Largest power-of-two bn that DIVIDES n, within ~10MB total VMEM across
    the 4 double-buffered [F, bn, C] blocks. The grid is (b, n // bn), so a
    non-dividing bn would silently leave the last n % bn tokens unwritten —
    bn is halved until it divides (callers fall back to the XLA path when the
    result degenerates below 8)."""
    budget = 10_000_000 // (8 * f * c * itemsize)
    bn = 8
    while bn * 2 <= min(n, max(8, budget)):
        bn *= 2
    bn = min(bn, n)
    while bn > 1 and n % bn != 0:
        bn //= 2
    return bn


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, heads: int, causal: bool, scale: float,
):
    """Fused dq/dk/dv in ONE kernel: all F frames of a token block are
    resident, so the whole F x F pair loop (scores recomputed, softmax
    rebuilt, gradient accumulated) runs in VMEM with no saved residuals and
    no [.., F, F] tensor in HBM. Same head-summing matmul trick as the
    forward; exact gradient of the forward's math."""
    f_len = q_ref.shape[1]
    c = q_ref.shape[3]
    m_mat = _head_matrix(c, heads)
    mt_mat = m_mat.T

    qs = [q_ref[0, f].astype(jnp.float32) for f in range(f_len)]
    ks = [k_ref[0, g].astype(jnp.float32) for g in range(f_len)]
    vs = [v_ref[0, g].astype(jnp.float32) for g in range(f_len)]
    dos = [do_ref[0, f].astype(jnp.float32) for f in range(f_len)]
    dk_acc = [None] * f_len
    dv_acc = [None] * f_len

    def add(acc, g, term):
        acc[g] = term if acc[g] is None else acc[g] + term

    for f in range(f_len):
        glim = (f + 1) if causal else f_len
        s_list = []
        for g in range(glim):
            s = jax.lax.dot(qs[f] * ks[g], m_mat, preferred_element_type=jnp.float32)
            s_list.append(s * scale)
        m = s_list[0]
        for s in s_list[1:]:
            m = jnp.maximum(m, s)
        ps = [jnp.exp(s - m) for s in s_list]
        l = ps[0]
        for p in ps[1:]:
            l = l + p
        inv = 1.0 / l
        probs = [p * inv for p in ps]

        # dp[g] = <do_f, v_g> per head; D_f = sum_g p_g * dp_g
        dps = [
            jax.lax.dot(dos[f] * vs[g], m_mat, preferred_element_type=jnp.float32)
            for g in range(glim)
        ]
        d_f = probs[0] * dps[0]
        for g in range(1, glim):
            d_f = d_f + probs[g] * dps[g]

        dq_f = None
        for g in range(glim):
            ds = probs[g] * (dps[g] - d_f)  # (bn, H)
            ebar = scale * jax.lax.dot(
                ds, mt_mat, preferred_element_type=jnp.float32
            )  # (bn, C): grad wrt the elementwise product q_f * k_g
            dq_f = ebar * ks[g] if dq_f is None else dq_f + ebar * ks[g]
            add(dk_acc, g, ebar * qs[f])
            pc = jax.lax.dot(probs[g], mt_mat, preferred_element_type=jnp.float32)
            add(dv_acc, g, pc * dos[f])
        dq_ref[0, f] = dq_f.astype(dq_ref.dtype)

    zero = jnp.zeros_like(qs[0])
    for g in range(f_len):
        dk_ref[0, g] = (dk_acc[g] if dk_acc[g] is not None else zero).astype(
            dk_ref.dtype
        )
        dv_ref[0, g] = (dv_acc[g] if dv_acc[g] is not None else zero).astype(
            dv_ref.dtype
        )


def _pick_block_n_bwd(n: int, f: int, c: int, itemsize: int) -> int:
    """bn for the backward kernel: 7 streamed [F, bn, C] blocks
    (q,k,v,do,dq,dk,dv, double-buffered) + ~5F fp32 [bn, C] live values
    (qs/ks/vs/dos + dk/dv accumulators)."""
    per_bn = itemsize * 7 * f * c * 2 + 4 * 5 * f * c
    budget = 10_000_000 // per_bn
    bn = 8
    while bn * 2 <= min(n, max(8, budget)):
        bn *= 2
    bn = min(bn, n)
    while bn > 1 and n % bn != 0:
        bn //= 2
    return bn


@functools.partial(
    jax.jit, static_argnames=("scale", "heads", "causal", "interpret")
)
def _temporal_4d_bwd(q, k, v, do, scale, heads, causal, interpret):
    b, f, n, c = q.shape
    bn = _pick_block_n_bwd(n, f, c, q.dtype.itemsize)
    grid = (b, n // bn)
    spec = pl.BlockSpec((1, f, bn, c), lambda bi, ni: (bi, 0, ni, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, causal=causal, scale=scale),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(
    jax.jit, static_argnames=("scale", "heads", "causal", "interpret")
)
def _temporal_4d(q, k, v, scale: float, heads: int, causal: bool, interpret: bool):
    b, f, n, c = q.shape
    bn = _pick_block_n(n, f, c, q.dtype.itemsize)
    grid = (b, n // bn)
    spec = pl.BlockSpec((1, f, bn, c), lambda bi, ni: (bi, 0, ni, 0))
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, causal=causal, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def temporal_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    heads: int,
    causal: bool = True,
) -> jnp.ndarray:
    """Temporal attention over [B, F, N, C] without leaving the native token
    layout (see module docstring). Returns [B, F, N, C].

    Differentiable: under jax.grad the computation routes through the XLA
    einsum oracle (ops/diffable.py) — pallas_call has no VJP."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    interpret = jax.default_backend() != "tpu"
    b, f, n, c = q.shape
    add_kernel_flops(2 * 2 * b * n * f * f * c)  # per-site F x F over all heads
    degenerate_blocking = _pick_block_n(n, f, c, q.dtype.itemsize) < 8

    def _kernel_path(q, k, v):
        return _temporal_4d(q, k, v, float(scale), heads, causal, interpret)

    def _one_chunk(qc, kc, vc):
        bb, f, nc_, c = qc.shape
        d = c // heads
        q5 = qc.reshape(bb, f, nc_, heads, d)
        k5 = kc.reshape(bb, f, nc_, heads, d)
        v5 = vc.reshape(bb, f, nc_, heads, d)
        s = jnp.einsum(
            "bfnhd,bgnhd->bnhfg", q5, k5, preferred_element_type=jnp.float32
        ) * scale
        if causal:
            mask = jnp.tril(jnp.ones((f, f), bool))
            s = jnp.where(mask, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(vc.dtype)
        out = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v5)
        return out.reshape(bb, f, nc_, c)

    def _oracle(q, k, v):
        # Token-chunked: the [B, N, H, F, F] fp32 score tensor T(8,128)-pads
        # its (F, F) minor pair 24x24 -> 32x128 (5.3x); at 24f 512px it alone
        # is 384M and the backward keeps several alive (HBM OOM). lax.map
        # over lane-aligned token chunks + jax.checkpoint bounds the
        # transient to one chunk on both the value and gradient paths (same
        # pattern as the spatial oracle in ops/video_flash.py).
        b, f, n, c = q.shape
        chunk = 512
        if n % chunk:
            return _one_chunk(q, k, v)
        nch = n // chunk

        @jax.checkpoint
        def body(i):
            qc = jax.lax.dynamic_slice_in_dim(q, i * chunk, chunk, axis=2)
            kc = jax.lax.dynamic_slice_in_dim(k, i * chunk, chunk, axis=2)
            vc = jax.lax.dynamic_slice_in_dim(v, i * chunk, chunk, axis=2)
            return _one_chunk(qc, kc, vc)

        out = jax.lax.map(body, jnp.arange(nch))  # [nch, B, F, chunk, C]
        return jnp.moveaxis(out, 0, 2).reshape(b, f, n, c)

    if degenerate_blocking:
        # no lane-aligned bn divides n (e.g. odd spatial sizes) — the XLA
        # transpose path is the correct fallback
        return _oracle(q, k, v)

    if _pick_block_n_bwd(n, f, c, q.dtype.itemsize) >= 8:
        # fully-fused flash backward: saves only (q, k, v) — all F frames of
        # a token block are VMEM-resident, so the backward recomputes scores
        # and softmax in-kernel (no residuals, no [.., F, F] HBM tensor)
        @jax.custom_vjp
        def attn(q, k, v):
            return _kernel_path(q, k, v)

        def fwd_rule(q, k, v):
            return _kernel_path(q, k, v), (q, k, v)

        def bwd_rule(res, g):
            qr, kr, vr = res
            return _temporal_4d_bwd(
                qr, kr, vr, g.astype(qr.dtype), float(scale), heads, causal,
                interpret,
            )

        attn.defvjp(fwd_rule, bwd_rule)
        return attn(q, k, v)
    return kernel_with_xla_vjp(_kernel_path, _oracle)(q, k, v)


# ---------------------------------------------------------------------------
# frame-sharded variant: local q frames attend over ALL (gathered) kv frames
# ---------------------------------------------------------------------------


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, heads: int, scale: float):
    """Same head-summing-matmul attention as ``_kernel`` but with q and k/v
    frame counts decoupled and an additive per-(f, g) bias read from SMEM.
    The shard_map wrapper (parallel/flash_sharding.py) passes the LOCAL q
    frames, the all-gathered global k/v frames, and a causal bias offset by
    the shard's global frame position."""
    fq = q_ref.shape[1]
    fk = k_ref.shape[1]
    c = q_ref.shape[3]
    m_mat = _head_matrix(c, heads)
    mt_mat = m_mat.T

    ks = [k_ref[0, g].astype(jnp.float32) for g in range(fk)]
    vs = [v_ref[0, g] for g in range(fk)]

    for f in range(fq):
        qf = q_ref[0, f].astype(jnp.float32)  # (bn, C)
        s_list = []
        for g in range(fk):
            e = qf * ks[g]
            s = jax.lax.dot(e, m_mat, preferred_element_type=jnp.float32)
            s_list.append(s * scale + b_ref[f, g])  # (bn, H) + scalar bias
        m = s_list[0]
        for s in s_list[1:]:
            m = jnp.maximum(m, s)
        ps = [jnp.exp(s - m) for s in s_list]
        l = ps[0]
        for p in ps[1:]:
            l = l + p
        inv = 1.0 / l
        acc = None
        for g in range(fk):
            pc = jax.lax.dot(ps[g] * inv, mt_mat, preferred_element_type=jnp.float32)
            term = pc * vs[g].astype(jnp.float32)
            acc = term if acc is None else acc + term
        o_ref[0, f] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "heads", "interpret"))
def _temporal_4d_bias(q, k, v, bias, scale: float, heads: int, interpret: bool):
    b, fq, n, c = q.shape
    fk = k.shape[1]
    bn = _pick_block_n(n, fq + fk, c, q.dtype.itemsize)
    grid = (b, n // bn)
    qspec = pl.BlockSpec((1, fq, bn, c), lambda bi, ni: (bi, 0, ni, 0))
    kspec = pl.BlockSpec((1, fk, bn, c), lambda bi, ni: (bi, 0, ni, 0))
    bspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel_bias, heads=heads, scale=scale),
        grid=grid,
        in_specs=[qspec, kspec, kspec, bspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def temporal_flash_attention_global(
    q: jnp.ndarray,        # [B, Fq, N, C] local shard of the frame axis
    k: jnp.ndarray,        # [B, Fk, N, C] global (all-gathered) frames
    v: jnp.ndarray,
    scale: float,
    heads: int,
    causal: bool,
    q_offset: jnp.ndarray,  # scalar int: global index of q's frame 0
) -> jnp.ndarray:
    """Temporal attention where q holds a contiguous SLICE [q_offset,
    q_offset + Fq) of the global frame axis and k/v hold all frames — the
    per-shard computation of the frame-sharded temporal attention. The
    causal mask is applied at global frame indices via an additive bias.

    Differentiable through the XLA oracle VJP (bias is constant wrt grads;
    dk/dv flow back through the all-gather's transpose outside)."""
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp

    b, fq, n, c = q.shape
    fk = k.shape[1]
    interpret = jax.default_backend() != "tpu"

    if causal:
        gi = jnp.arange(fk)[None, :]
        fi = jnp.arange(fq)[:, None] + q_offset
        bias = jnp.where(gi <= fi, 0.0, -1e30).astype(jnp.float32)
    else:
        bias = jnp.zeros((fq, fk), jnp.float32)

    def _kernel_path(q, k, v, bias):
        return _temporal_4d_bias(q, k, v, bias, float(scale), heads, interpret)

    def _oracle(q, k, v, bias):
        d = c // heads
        q5 = q.reshape(b, fq, n, heads, d)
        k5 = k.reshape(b, fk, n, heads, d)
        v5 = v.reshape(b, fk, n, heads, d)
        s = jnp.einsum(
            "bfnhd,bgnhd->bnhfg", q5, k5, preferred_element_type=jnp.float32
        ) * scale
        s = s + bias[None, None, None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v5)
        return out.reshape(b, fq, n, c)

    if _pick_block_n(n, fq + fk, c, q.dtype.itemsize) < 8:
        return _oracle(q, k, v, bias)
    return kernel_with_xla_vjp(_kernel_path, _oracle)(q, k, v, bias)
