"""Autodiff bridging for Pallas kernels.

``pallas_call`` has no VJP rule, but the attention kernels sit inside the
training forward (train_bg/train_adaptor differentiate through the full
UNet). ``kernel_with_xla_vjp`` builds a function that

  - evaluates the PALLAS KERNEL when not being differentiated (inference,
    the 50-step denoise scan), and
  - transparently switches the whole computation (primal AND gradient) to a
    mathematically-equivalent XLA oracle under ``jax.grad``/``jax.vjp``.

This is the FALLBACK autodiff path: the spatial video attention carries a
fully-fused flash backward (ops/video_flash_bwd.py) and the temporal kernel
a fused in-VMEM backward (ops/temporal_flash._bwd_kernel); only dense mode,
VMEM-infeasible blockings, the injection kernel (inference-only in the
reference flow) and the frame-sharded explicit-KV kernels route here.
"""

from __future__ import annotations

import jax


def kernel_with_xla_vjp(kernel_fn, oracle_fn):
    """Return kernel_fn with a custom VJP that routes differentiation
    through oracle_fn (same signature, same math)."""

    @jax.custom_vjp
    def f(*args):
        return kernel_fn(*args)

    def fwd(*args):
        return oracle_fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(oracle_fn, *args)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
