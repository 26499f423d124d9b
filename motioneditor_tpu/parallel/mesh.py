"""Device mesh + sharding layout for multi-chip scale.

The reference's only parallelism is DDP via HF accelerate (train_bg.py:123,
SURVEY §2.8). The TPU-native story replaces NCCL DDP with GSPMD over a
``jax.sharding.Mesh`` with axes:

  data   — data parallelism over videos (DCN-friendly)
  frames — the headline axis: the latent video's frame dimension is sharded
           over ICI. Sparse-causal / motion-frame attention needs only a
           1-frame halo (XLA lowers the frame-index gather in
           ops/attention.select_kv to a collective-permute); dense
           spatio-temporal and causal-temporal attention become K/V
           all-gathers over frames (Ulysses-style — F is small, so the
           all-gather is cheap); cross-branch injection is branch-axis
           indexing on replicated rows.

Parameters are replicated; gradients are reduced by GSPMD (psum) when the
loss is jitted over the mesh.

Measured communication pattern (8-frame tiny UNet forward on a (1, 4)
mesh, guarded by tests/sharding_runner.py case_collectives): 88
collective-permutes (the sparse-causal/motion-frame 1-frame halos) and
64 bounded all-gathers (temporal attention / temporal conv K/V over the
small frame axis) — i.e. the per-frame attention traffic rides neighbor
exchanges on ICI, not full gathers.

Two execution paths under the mesh:
  - GSPMD (use_flash=False): XLA lowers the jnp attention; the halos above
    are inserted automatically.
  - sharded kernels (use_flash=True + shard_ctx): the Pallas flash kernels
    run per frame shard through shard_map with the same halo collectives
    written explicitly (parallel/flash_sharding.py) — GSPMD cannot
    partition a pallas_call, so without this the kernels would replicate.
    Parity + train-step equivalence guarded by sharding_runner
    case_flash_* and exercised by the driver dryrun's (1, N) pass.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FRAME_AXIS = "frames"
MODEL_AXIS = "model"  # optional tensor-parallel axis (attention heads / FF)


def create_mesh(
    mesh_shape: Tuple[int, ...] = (1, 1), devices: Optional[Sequence] = None
) -> Mesh:
    """(data, frames[, model]) mesh. mesh_shape=(1, n_dev) shards only
    frames; a 3-tuple adds the tensor-parallel ``model`` axis (see tp.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh {mesh_shape} needs {n} devices, have {len(devices)}")
    axes = (DATA_AXIS, FRAME_AXIS, MODEL_AXIS)[: len(mesh_shape)]
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axes)


def auto_mesh(max_frames_shards: int = 8) -> Mesh:
    """All devices on the frame axis (single-video editing workload)."""
    n = min(len(jax.devices()), max_frames_shards)
    return create_mesh((1, n), jax.devices()[:n])


def video_sharding(mesh: Mesh) -> NamedSharding:
    """[B, F, H, W, C] -> batch over data, frames over frames."""
    return NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, None, None, None))


def branch_video_sharding(mesh: Mesh) -> NamedSharding:
    """[4, F, H, W, C] branch axis replicated, frames sharded (injection
    reads across branches, so the branch axis must stay local)."""
    return NamedSharding(mesh, P(None, FRAME_AXIS, None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))


def shard_video(x, mesh: Mesh, branch_axis: bool = False):
    s = branch_video_sharding(mesh) if branch_axis else video_sharding(mesh)
    return jax.device_put(x, s)
