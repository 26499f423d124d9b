"""Tensor parallelism: Megatron-style shardings for the transformer weights.

The reference has NO tensor parallelism (SURVEY §2.8 — SD-1.5 fits one GPU);
this is the TPU-native optional extra: shard the attention head dimension and
the FF hidden dimension over a ``model`` mesh axis and let GSPMD insert the
collectives. The column/row split is the classic pair:

  column-parallel (output features sharded): attn to_q/to_k/to_v
  row-parallel (input features sharded):     attn to_out

so within one attention the activation stays head-sharded between the two
projections and GSPMD reduces (psum over ``model``) only at the row-parallel
output — one all-reduce per attention, the Megatron pattern. The GEGLU FF is
left REPLICATED: its proj_in kernel stores [h | gate] contiguously
(layers.py:224/231 splits at inner), so a contiguous column shard puts h on
some devices and gate on others and the elementwise h*gelu(gate) forces a
reshard inside the FF — sharding it would add traffic, not remove it. All
other parameters (convs, norms, embeddings) are replicated; SD-1.5's conv
trunk is small enough that replicating it costs <2GB while the attention
stack carries most of the FLOPs at the inner resolutions.

These are layout *hints*: GSPMD guarantees the same logical result for any
sharding, so correctness is independent of the rules (guarded by
tests/sharding_runner.py case_tensor_parallel against a replicated run).

Pallas note (round 5): the fused attention kernels consume packed-head
[B, F, N, C] operands; the shard_map wrappers in parallel/flash_sharding.py
also map the CHANNEL axis over ``model`` when heads divide the axis size
(FrameShardingCtx.head_shards) — attention is embarrassingly parallel over
heads and this column layout makes contiguous channel blocks = contiguous
head blocks, so each model shard runs its own heads through the local
kernel with no collective at the kernel boundary (verified by
tests/sharding_runner.py case_tp_flash: parity + 94 -> 54 all-gathers on
the (1,2,2) mesh program). When heads don't divide, the wrappers fall back
to replicated channels (GSPMD gathers — correct, serial).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motioneditor_tpu.parallel.mesh import MODEL_AXIS

# parent-key name -> which axis of the 2D kernel is model-sharded
# (FF proj_in/proj_out stay replicated — GEGLU split layout, see docstring)
_COLUMN = ("to_q", "to_k", "to_v")
_ROW = ("to_out",)


def _dict_keys(path) -> list:
    return [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]


def _spec_for(path, leaf) -> P:
    names = _dict_keys(path)
    if len(names) < 2:
        return P()
    last, parent = names[-1], names[-2]
    column = parent in _COLUMN
    row = parent in _ROW
    if last == "kernel" and getattr(leaf, "ndim", 0) == 2:
        if column:
            return P(None, MODEL_AXIS)
        if row:
            return P(MODEL_AXIS, None)
    if last == "bias" and getattr(leaf, "ndim", 0) == 1 and column:
        return P(MODEL_AXIS)
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` (a UNet/adapter/ControlNet pytree,
    a train state containing one, or optimizer moments mirroring one —
    matching is by dict-key path, so mirrored subtrees shard identically).

    Dimensions not divisible by the ``model`` axis size fall back to
    replicated (GSPMD requires divisibility only for the hinted layout)."""
    tp = mesh.shape.get(MODEL_AXIS, 1)

    def to_sharding(path, leaf):
        spec = _spec_for(path, leaf)
        if tp > 1 and any(spec):
            shard_dim = [i for i, a in enumerate(spec) if a is not None]
            for i in shard_dim:
                if leaf.shape[i] % tp != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """device_put ``params`` with the tensor-parallel layout."""
    return jax.device_put(params, tp_param_shardings(params, mesh))
