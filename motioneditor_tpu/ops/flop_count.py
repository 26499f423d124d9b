"""Trace-time FLOP accounting for Pallas kernels.

XLA's executable cost_analysis() models every HLO op EXCEPT custom-calls, so
the attention kernels report 0 flops — which makes an MFU computed from
cost_analysis alone understate reality by the whole attention share. Each
kernel entry point calls ``add_kernel_flops`` with its analytic model-flop
count (real d, not the MXU-padded cost) while being TRACED; wrapping a
``jax.jit(...).lower(...)`` in ``kernel_flop_counter`` therefore yields the
per-program kernel flops to add on top of cost_analysis()["flops"].

Counting happens at Python trace time (zero runtime cost; jit caches mean a
function traces once — lower() inside the context to guarantee the hooks
fire for the program being measured).
"""

from __future__ import annotations

_ACTIVE: list = []


class kernel_flop_counter:
    """Context manager accumulating analytic flops of every Pallas kernel
    traced inside it. Use around .lower()/.trace() of the jitted program."""

    def __enter__(self):
        self.flops = 0
        _ACTIVE.append(self)
        return self

    def __exit__(self, *exc):
        _ACTIVE.remove(self)
        return False


def add_kernel_flops(n: float) -> None:
    for c in _ACTIVE:
        c.flops += n
