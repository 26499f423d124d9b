"""Runtime setup helpers: persistent compilation cache + precision policy."""

from __future__ import annotations

import os


def setup(precision: str = "default", cache_dir: str = "/tmp/jax_cache") -> None:
    """Configure JAX for this process.

    precision "highest" forces fp32 matmuls (parity runs, eval-motion.yaml
    mixed_precision "no"); "default" keeps the fast bf16-ish passes.
    """
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")


def env_flag(name: str, default: bool) -> bool:
    """Boolean env knob: unset -> default; common falsy spellings disable."""
    env = os.environ.get(name)
    if env is None:
        return default
    return env.strip().lower() not in ("0", "false", "no", "off", "")
