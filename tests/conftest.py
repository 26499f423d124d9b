import os

# Multi-device sharding tests force an 8-device virtual CPU mesh in
# subprocesses (see tests/sharding_runner.py) — the TPU answer to "multi-node
# tests without a cluster". The rest of the suite runs on the ambient
# platform (the local TPU when present — this host has one CPU core, so
# forcing CPU would make the suite pathologically slow). Set ME_FORCE_CPU=1
# to run everything on CPU.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("ME_FORCE_CPU") == "1":
    # NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the
    # platform must be forced through jax.config.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# fp32 parity: JAX's default matmul precision is bf16-ish on CPU/TPU; the
# reference runs fp32 at inference (eval-motion.yaml mixed_precision: "no").
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: model-forward tests are compile-bound.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
