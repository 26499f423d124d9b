"""Subprocess driver for multi-device sharding checks on a virtual CPU mesh.

Invoked by tests/test_sharding.py: ``python tests/sharding_runner.py <case>``.
Runs outside pytest so the platform can be forced to an 8-device CPU mesh
regardless of the ambient TPU plugin (which ignores JAX_PLATFORMS).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from motioneditor_tpu.models.unet import UNetConfig, init_unet, unet_apply  # noqa: E402
from motioneditor_tpu.parallel.mesh import (  # noqa: E402
    DATA_AXIS,
    FRAME_AXIS,
    create_mesh,
    shard_params,
    shard_video,
)

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=16,
)


def case_frame_sharded_forward():
    """Frame-sharded UNet forward == single-device forward."""
    assert len(jax.devices()) >= 8, jax.devices()
    mesh = create_mesh((1, 4))
    params = init_unet(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(100)

    ref = unet_apply(params, TINY, x, t, enc, use_flash=False)
    xs = shard_video(x, mesh)
    ps = shard_params(params, mesh)
    with mesh:
        out = jax.jit(lambda p, a: unet_apply(p, TINY, a, t, enc, use_flash=False))(
            ps, xs
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    print("frame_sharded_forward OK")


def case_train_step():
    """Stage-1 train step over a (2, 4) mesh: dp psum + frame sharding."""
    from motioneditor_tpu.schedulers import DiffusionSchedule
    from motioneditor_tpu.training.common import make_optimizer, make_train_state
    from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES, train_step_stage1

    mesh = create_mesh((2, 4))
    params = init_unet(jax.random.PRNGKey(0), TINY)
    optimizer = make_optimizer()
    state = make_train_state(params, list(TRAINABLE_MODULES), optimizer)
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8, 4)) * 0.2
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    lat_s = jax.device_put(
        latents, NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, None, None, None))
    )
    enc_s = jax.device_put(enc, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    state_s = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        _, metrics = train_step_stage1(
            state_s, lat_s, enc_s, jax.random.PRNGKey(3),
            unet_config=TINY, schedule=DiffusionSchedule(), optimizer=optimizer,
            use_flash=False, remat=False,
        )
        jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    print("train_step OK", float(metrics["loss"]))


def case_dryrun():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def case_collectives():
    """The frame-sharded forward's communication pattern: sparse-causal /
    motion-frame K/V halos lower to collective-permute (NOT full gathers);
    all-gathers appear only for the frame-global ops (temporal attention
    K/V, temporal convs). Guards the SURVEY §2.8 headline design claim."""
    import collections
    import re

    mesh = create_mesh((1, 4))
    params = init_unet(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(100)
    xs = shard_video(x, mesh)
    ps = shard_params(params, mesh)
    with mesh:
        f = jax.jit(lambda p, a: unet_apply(p, TINY, a, t, enc, use_flash=False))
        hlo = f.lower(ps, xs).compile().as_text()

    counts = collections.Counter()
    for m in re.finditer(
        r"= \S+ (collective-permute|all-gather|all-reduce|all-to-all)\(", hlo
    ):
        counts[m.group(1)] += 1
    # halo exchanges must exist (sparse-causal/motion-frame neighbor reads)
    assert counts["collective-permute"] > 0, counts
    # the all-gather count must stay bounded by the frame-global op count
    # (16 temporal-ish sites x a few tensors each) — a regression to
    # "gather everything, compute replicated" would blow far past this
    assert counts["all-gather"] <= 100, counts
    print("collectives OK", dict(counts))


def case_tensor_parallel():
    """Megatron-style TP over a (1, 2, 2) (data, frames, model) mesh:
    attention/FF weights column/row-sharded (parallel/tp.py) on top of frame
    sharding. Output must match the replicated single-device forward, and
    the program must psum over the model axis (all-reduce present)."""
    import re

    from motioneditor_tpu.parallel.tp import shard_params_tp, tp_param_shardings

    mesh = create_mesh((1, 2, 2))
    params = init_unet(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(100)

    ref = unet_apply(params, TINY, x, t, enc, use_flash=False)

    specs = tp_param_shardings(params, mesh)
    sharded_leaves = [
        s for s in jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda n: any(n.spec), specs)
        ) if s
    ]
    assert len(sharded_leaves) > 50, "TP rules matched too few weights"

    ps = shard_params_tp(params, mesh)
    xs = jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, None, None, None))
    )
    with mesh:
        f = jax.jit(lambda p, a: unet_apply(p, TINY, a, t, enc, use_flash=False))
        hlo = f.lower(ps, xs).compile().as_text()
        out = f(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    assert re.search(r"= \S+ all-reduce\(", hlo), "no model-axis psum in HLO"
    print("tensor_parallel OK")


if __name__ == "__main__":
    {
        "frame_sharded_forward": case_frame_sharded_forward,
        "train_step": case_train_step,
        "dryrun": case_dryrun,
        "collectives": case_collectives,
        "tensor_parallel": case_tensor_parallel,
    }[sys.argv[1]]()
