"""Fused per-channel statistics kernel for GroupNorm (Pallas TPU).

Round-3 profiling: the GroupNorm stats reduces (XLA ``convert_reduce``
fusions: bf16->fp32 convert + sum over the major spatial axes) cost
~74 ms of the 24f denoise step at single-digit percent of the HBM
roofline — XLA's column-reduce emitter streams the activation badly.
This kernel reads each (rows, C) block once, upcasts in VMEM and
accumulates fp32 per-channel sum / product-sum across sequential grid
steps, so the whole stats pass runs at streaming bandwidth.

The same primitive serves both directions of GroupNorm
(models/layers.py:group_norm, reference resnet_2d.py:160/176):

  forward   (s1, s2) = (sum(x), sum(x*x))     -> mean / var per group
  backward  (t1, t2) = (sum(dy), sum(dy*x))   -> the two reduces of the
            standard GN gradient; everything else is elementwise FMA
            that XLA fuses into neighbours.

``group_norm_fused`` wires them into a custom-VJP GroupNorm (exact
gradient math, not an XLA-oracle bridge); equivalence vs the plain-XLA
group_norm and its jax.grad is pinned by tests/test_gn_stats.py.

STATUS (round 4): DEFAULT-OFF. The 2x2 end-to-end ablation (PERF.md
round-4 table) measured the kernel as a regression — the "single-digit %
of roofline" stats fusions it replaces were epilogues of the producing
conv/matmul fusions, so the kernel adds a full activation write+read.
Opt in with MOTIONEDITOR_FUSED_GN=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _stats_kernel(a_ref, b_ref, s1_ref, s2_ref):
    j = pl.program_id(1)
    a = a_ref[0].astype(jnp.float32)  # (bs, C)
    b = b_ref[0].astype(jnp.float32)
    p1 = jnp.sum(a, axis=0, keepdims=True)
    p2 = jnp.sum(a * b, axis=0, keepdims=True)

    @pl.when(j == 0)
    def _():
        s1_ref[0] = p1
        s2_ref[0] = p2

    @pl.when(j > 0)
    def _():
        s1_ref[0] += p1
        s2_ref[0] += p2


def _pick_rows(s: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row block dividing s with the two double-buffered
    (rows, C) input streams + fp32 temporaries within ~6MB of VMEM."""
    budget = 6_000_000 // ((2 * 2 * itemsize + 2 * 4) * c)
    rows = 8
    while rows * 2 <= min(s, max(8, budget)):
        rows *= 2
    while rows > 1 and s % rows:
        rows //= 2
    return rows


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def _pair_stats(a, b, rows: int, interpret: bool):
    bt, s, c = a.shape
    grid = (bt, s // rows)
    in_spec = pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0))
    # (1, 1, C) output block: the last two dims equal the array dims, which
    # satisfies Mosaic's (8, 128)-or-full-dim block rule for any C
    out_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((bt, 1, c), jnp.float32)
    s1, s2 = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(a, b)
    return s1[:, 0], s2[:, 0]


def channel_pair_stats(a, b, interpret: bool | None = None):
    """(sum(a), sum(a*b)) over the middle axis of [B, S, C], fp32.

    Returns None when no feasible row blocking exists (caller falls back
    to the XLA reduce)."""
    from motioneditor_tpu.ops.flop_count import add_kernel_flops

    bt, s, c = a.shape
    rows = _pick_rows(s, c, max(a.dtype.itemsize, b.dtype.itemsize))
    if rows < 8 or s % rows:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # the XLA reduce this replaces would be cost_analysis-visible: count it
    # (1 add for sum(a) + mul/add for sum(a*b) per element)
    add_kernel_flops(3 * bt * s * c)
    return tuple(_pair_stats(a, b, rows, interpret))


def _enabled() -> bool:
    from motioneditor_tpu.utils.runtime import env_flag

    # Default OFF: the round-4 2x2 ablation measured this kernel as an
    # end-to-end REGRESSION on v5e (24f denoise 72.88 -> 75.26 ms/step/frame
    # with GN alone; PERF.md round-4 table). The standalone stats reduce is
    # faster than XLA's convert_reduce fusions, but those fusions were
    # epilogues of the producing conv/matmul fusions — an opaque pallas_call
    # forces the producer to write the activation to HBM and the kernel to
    # re-read it, costing more than the reduce saves (same mechanism as the
    # v6 LN probe). Kept behind the env knob for other chip generations.
    return env_flag("MOTIONEDITOR_FUSED_GN", False)


# ---------------------------------------------------------------------------
# fused GroupNorm (custom VJP, kernel reduces both directions)
# ---------------------------------------------------------------------------


def _group_stats(s1, s2, num_groups: int, n: float, eps: float):
    bt, c = s1.shape
    cpg = c // num_groups
    mean = s1.reshape(bt, num_groups, cpg).sum(-1) / n  # [B, G]
    ex2 = s2.reshape(bt, num_groups, cpg).sum(-1) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def _bshape(x, v):
    return v.reshape((x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_fused(scale, bias, x, num_groups: int, eps: float):
    out, _ = _gn_fwd(scale, bias, x, num_groups, eps)
    return out


def _gn_fwd(scale, bias, x, num_groups: int, eps: float):
    bt, c = x.shape[0], x.shape[-1]
    cpg = c // num_groups
    x2 = x.reshape(bt, -1, c)
    n = float(x2.shape[1] * cpg)
    s1, s2 = channel_pair_stats(x2, x2)
    mean, inv = _group_stats(s1, s2, num_groups, n, eps)
    scale_g = scale.reshape(num_groups, cpg)
    bias_g = bias.reshape(num_groups, cpg)
    gain = (inv[..., None] * scale_g).reshape(bt, c)
    offset = (bias_g - (mean * inv)[..., None] * scale_g).reshape(bt, c)
    out = (x.astype(jnp.float32) * _bshape(x, gain) + _bshape(x, offset))
    out = out.astype(x.dtype)
    return out, (scale, x, mean, inv)


def _gn_bwd(num_groups: int, eps: float, res, dy):
    scale, x, mean, inv = res
    bt, c = x.shape[0], x.shape[-1]
    cpg = c // num_groups
    x2 = x.reshape(bt, -1, c)
    dy2 = dy.reshape(bt, -1, c)
    n = float(x2.shape[1] * cpg)
    t1, t2 = channel_pair_stats(dy2, x2)  # [B, C] fp32: sum(dy), sum(dy*x)

    scale_g = scale.reshape(num_groups, cpg)[None]  # [1, G, cpg]
    t1g = t1.reshape(bt, num_groups, cpg)
    t2g = t2.reshape(bt, num_groups, cpg)
    # per-group: sum of w*dy and of w*dy*(x-mean), w_c = inv_g * scale_c
    sum_wdy = inv * (scale_g * t1g).sum(-1)  # [B, G]
    sum_wdy_xc = inv * (scale_g * (t2g - mean[..., None] * t1g)).sum(-1)
    a_g = sum_wdy / n
    b_g = inv * inv * sum_wdy_xc / n
    gain = (inv[..., None] * scale_g).reshape(bt, c)
    b_c = jnp.repeat(b_g, cpg, axis=-1)
    const_c = jnp.repeat(mean * b_g - a_g, cpg, axis=-1)
    dx = (
        dy.astype(jnp.float32) * _bshape(x, gain)
        - x.astype(jnp.float32) * _bshape(x, b_c)
        + _bshape(x, const_c)
    ).astype(x.dtype)

    # param grads: dscale = sum_b inv*(t2 - mean*t1) per channel, dbias = sum_b t1
    dscale = (inv[..., None] * (t2g - mean[..., None] * t1g)).sum(0).reshape(c)
    dbias = t1.sum(0)
    return dscale.astype(scale.dtype), dbias.astype(scale.dtype), dx


_gn_fused.defvjp(_gn_fwd, _gn_bwd)


def group_norm_fused(params, x, num_groups: int, eps: float):
    """Kernel-reduce GroupNorm over [B, ..., C], or None if infeasible.

    Drop-in for models/layers.py:group_norm on single-chip TPU; stats and
    backward reduces run in the Pallas stats kernel, the normalize /
    gradient FMA stays jnp so XLA fuses it with neighbours."""
    if not _enabled():
        return None
    bt, c = x.shape[0], x.shape[-1]
    if c % num_groups:
        return None
    s = 1
    for d in x.shape[1:-1]:
        s *= d
    rows = _pick_rows(s, c, x.dtype.itemsize)
    if rows < 8 or s % rows:
        return None
    return _gn_fused(params["scale"], params["bias"], x, num_groups, eps)
