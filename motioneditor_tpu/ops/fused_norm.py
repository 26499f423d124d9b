"""Fused residual-add + LayerNorm (Pallas TPU).

Round-2 profiling (PERF.md): GN/LN stats fusions cost 163 ms of the 24f
denoise step at ~40% of the HBM roofline, and the v6 probe showed WHY a
plain LN kernel doesn't help — XLA's convert_reduce LN fusions were carrying
the transformer blocks' residual-add epilogues, which reappeared as separate
add fusions once LN became an opaque kernel. This kernel keeps the epilogue
INSIDE: it computes

    summed = tokens + delta            (the residual add)
    normed = LN(summed) * scale + bias

in one VMEM pass, so the activation is read once and written twice instead
of read three times / written twice across the XLA add + stats + normalize
fusions. Stats are fp32 one-pass sum/sumsq over the channel axis.

Autodiff: routed through ops/diffable.kernel_with_xla_vjp — training takes
the plain XLA path (primal and grads), inference scans take the kernel.
Covers the reference's separate torch adds + LayerNorms
(attention_2d.py:493-547); equivalence guarded by tests/test_fused_norm.py.

STATUS (round 4): DEFAULT-OFF. The 2x2 end-to-end ablation (PERF.md
round-4 table) measured the kernel as a regression — exactly the v6
failure mode the module docstring above tried to dodge: the add+stats
fusions it replaces were epilogues of the attention/FF output-projection
fusions, so even with the add kept inside the kernel the projection must
spill its output to HBM. Opt in with MOTIONEDITOR_FUSED_LN=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(t_ref, d_ref, w_ref, b_ref, s_ref, n_ref, *, eps: float):
    t = t_ref[0, 0].astype(jnp.float32)  # (bn, C)
    d = d_ref[0, 0].astype(jnp.float32)
    x = t + d
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    var = jnp.sum(x * x, axis=-1, keepdims=True) * (1.0 / c) - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    w = w_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    normed = (x - mean) * inv * w[None, :] + b[None, :]
    s_ref[0, 0] = x.astype(s_ref.dtype)
    n_ref[0, 0] = normed.astype(n_ref.dtype)


def _pick_bn(n: int, c: int, itemsize: int) -> int:
    """Largest power-of-two row-block dividing n within ~8MB VMEM across the
    4 double-buffered (bn, C) streams + fp32 temporaries."""
    budget = 8_000_000 // ((4 * 2 * itemsize + 3 * 4) * c)
    bn = 8
    while bn * 2 <= min(n, max(8, budget)):
        bn *= 2
    while bn > 1 and n % bn:
        bn //= 2
    return bn


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def _add_ln(tokens, delta, w, b, eps: float, block_n: int, interpret: bool):
    bt, f, n, c = tokens.shape
    grid = (bt * f, n // block_n)
    spec = pl.BlockSpec((1, 1, block_n, c), lambda i, j: (i // f, i % f, j, 0))
    wspec = pl.BlockSpec((1, c), lambda i, j: (0, 0))
    out_shape = jax.ShapeDtypeStruct(tokens.shape, tokens.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[spec, spec, wspec, wspec],
        out_specs=[spec, spec],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(tokens, delta, w[None], b[None])


def _enabled() -> bool:
    from motioneditor_tpu.utils.runtime import env_flag

    # Default OFF: the round-4 2x2 ablation measured this kernel as an
    # end-to-end REGRESSION on v5e (24f denoise +~1.2 ms/step/frame on top
    # of the GN kernel; PERF.md round-4 table) — the very failure mode the
    # v6 probe documented (the XLA add+LN fusions were epilogues of the
    # attention/FF output projections; an opaque kernel strands them).
    # Kept behind the env knob for other chip generations.
    return env_flag("MOTIONEDITOR_FUSED_LN", False)


def add_layer_norm(params, tokens, delta, eps: float = 1e-5):
    """(tokens + delta, LayerNorm(tokens + delta)) over [B, F, N, C].

    The fused form of the transformer block's `tokens = tokens + attn_out;
    h = layer_norm(tokens)` pattern. Falls back to plain jnp for shapes
    without a feasible row blocking, or when MOTIONEDITOR_FUSED_LN
    disables the kernel; differentiable via the XLA oracle."""
    from motioneditor_tpu.models.layers import layer_norm
    from motioneditor_tpu.ops.diffable import kernel_with_xla_vjp

    b, f, n, c = tokens.shape
    bn = _pick_bn(n, c, tokens.dtype.itemsize)
    interpret = jax.default_backend() != "tpu"
    w, bias = params["scale"], params["bias"]

    def _oracle(tokens, delta, w, bias):
        summed = tokens + delta
        return summed, layer_norm({"scale": w, "bias": bias}, summed, eps=eps)

    if bn < 8 or not _enabled():
        return _oracle(tokens, delta, w, bias)

    def _kernel_path(tokens, delta, w, bias):
        from motioneditor_tpu.ops.flop_count import add_kernel_flops

        # the XLA add + stats + normalize fusions this replaces would be
        # cost_analysis-visible: ~8 elementwise flops per element
        add_kernel_flops(8 * b * f * n * c)
        # tuple-ify: pallas_call returns a list, custom_vjp needs the same
        # pytree structure as the oracle's tuple
        summed, normed = _add_ln(tokens, delta, w, bias, float(eps), bn, interpret)
        return summed, normed

    return kernel_with_xla_vjp(_kernel_path, _oracle)(tokens, delta, w, bias)
