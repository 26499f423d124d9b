"""Multi-device sharding tests.

Each case runs in a subprocess on a forced 8-device virtual CPU mesh (the
ambient axon TPU plugin ignores JAX_PLATFORMS, so in-process forcing is not
possible once jax initializes). See tests/sharding_runner.py for the cases.
"""

import os.path as osp
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

RUNNER = osp.join(osp.dirname(osp.abspath(__file__)), "sharding_runner.py")


def _run(case: str, timeout: int = 3000):
    proc = subprocess.run(
        [sys.executable, RUNNER, case],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=osp.dirname(osp.dirname(RUNNER)),
    )
    assert proc.returncode == 0, f"{case} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_frame_sharded_forward_matches_single_device():
    out = _run("frame_sharded_forward")
    assert "OK" in out


def test_data_and_frame_sharded_train_step():
    out = _run("train_step")
    assert "OK" in out


def test_graft_entry_dryrun_multichip():
    out = _run("dryrun")
    assert "dryrun_multichip ok" in out


def test_tensor_parallel_matches_replicated():
    """Megatron column/row TP shardings (parallel/tp.py) over the optional
    model mesh axis reproduce the replicated forward and psum over heads."""
    out = _run("tensor_parallel")
    assert "tensor_parallel OK" in out


def test_frame_sharded_collective_pattern():
    """Halo reads lower to collective-permute; all-gathers stay bounded to
    the frame-global ops (temporal attention/conv K/V)."""
    out = _run("collectives")
    assert "collectives OK" in out


def test_sharded_flash_spatial_kernels():
    """Pallas spatial kernels execute per frame shard through shard_map
    (explicit halo collectives) and match the single-device XLA reference —
    including fp=8 where every halo crosses a device boundary."""
    out = _run("flash_spatial")
    assert out.count("flash_parity OK") == 3


def test_sharded_flash_injection_and_temporal_kernels():
    out = _run("flash_injection_temporal")
    assert "flash_injection_temporal OK" in out


def test_sharded_flash_train_step():
    """Train step on the sharded-kernel hot path reproduces the unsharded
    reference loss (backward flows through the halo collectives)."""
    out = _run("train_step_flash")
    assert "train_step_flash OK" in out


def test_tp_composes_with_flash_kernels():
    """Model-sharded weights + frame-sharded Pallas kernels in one program:
    matches the replicated reference; GSPMD gathers the model axis at the
    kernel boundary (measured behavior, documented in PARITY.md §2.8)."""
    out = _run("tp_flash")
    assert "tp_flash OK" in out
