"""Tracing / profiling utilities (SURVEY §5: the reference has none; the
rebuild ships jax.profiler integration + a per-op-family summary).

Typical use:

    from motioneditor_tpu.utils.profiling import trace, summarize_trace
    with trace("/tmp/my_trace"):
        out = step(...)
        float(jnp.sum(out))          # d2h read — see note below
    print(summarize_trace("/tmp/my_trace"))

NOTE (platform gotcha, measured): on the tunneled axon TPU,
``jax.block_until_ready`` returns before device work completes; force a
device-to-host read (e.g. ``float(jnp.sum(x))``) for correct wall timing.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Dict, List, Tuple


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 20) -> str:
    """Aggregate device-op durations by op family from a perfetto trace."""
    files = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    fam = collections.Counter()
    for fpath in files:
        with gzip.open(fpath, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev and "args" in ev:
                name = ev.get("name", "?")
                if name.startswith(("$", "jit_", "Pjit")):
                    continue
                fam[re.sub(r"[.\d]+$", "", name)] += ev["dur"]
    lines = [f"{'ms':>10}  op family"]
    for name, dur in fam.most_common(top):
        lines.append(f"{dur/1e3:10.1f}  {name}")
    return "\n".join(lines)


def timeit(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Wall-time a jitted function correctly on this platform (forces a d2h
    read after the final call). Returns seconds per call."""
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _sync(out):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        float(jnp.sum(leaves[0]))
