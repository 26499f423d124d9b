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
    """Megatron-style TP over a (1, 1, 2) (data, frames, model) mesh:
    attention weights column/row-sharded (parallel/tp.py). Output must match
    the replicated single-device forward, and the program must psum over the
    model axis. The frame axis is deliberately UNSHARDED here so the model
    axis is the only possible all-reduce source — an all-reduce in this HLO
    proves the Megatron psum specifically (advisor round-2 finding)."""
    import re

    from motioneditor_tpu.parallel.tp import shard_params_tp, tp_param_shardings

    mesh = create_mesh((1, 1, 2))
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


def _flash_parity(fp: int, dtype, modes=("normal", "sparse_causal", "motion_frame", "dense")):
    """Sharded kernel output == single-device XLA reference, per mode."""
    from motioneditor_tpu.ops.attention import sdpa, select_kv, split_heads, merge_heads
    from motioneditor_tpu.parallel.flash_sharding import (
        FrameShardingCtx,
        sharded_spatial_flash,
    )

    b, f, n, c, heads = 2, 8, 1024, 64, 8
    mesh = create_mesh((1, fp))
    ctx = FrameShardingCtx(mesh=mesh, batch_axis=None)
    scale = (c // heads) ** -0.5
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = (jax.random.normal(kq, (b, f, n, c)) * 0.5).astype(dtype)
    k = (jax.random.normal(kk, (b, f, n, c)) * 0.5).astype(dtype)
    v = (jax.random.normal(kv, (b, f, n, c)) * 0.5).astype(dtype)

    for mode in modes:
        ref = sdpa(
            split_heads(q, heads), split_heads(select_kv(k, mode), heads),
            split_heads(select_kv(v, mode), heads), scale, use_flash=False,
        )
        ref = merge_heads(ref)
        with mesh:
            out = jax.jit(
                lambda q, k, v, mode=mode: sharded_spatial_flash(
                    q, k, v, mode, scale, heads, ctx
                )
            )(q, k, v)
        assert out is not None, f"{mode}: sharded path unsupported"
        tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol,
            err_msg=f"mode={mode} fp={fp} dtype={dtype}",
        )
    print(f"flash_parity OK fp={fp} dtype={jnp.dtype(dtype).name}")


def case_flash_spatial():
    """Frame-sharded spatial flash kernels: parity on (1,4); fp=8 puts ONE
    frame per device so every halo read crosses a device boundary."""
    _flash_parity(4, jnp.float32)
    _flash_parity(4, jnp.bfloat16)
    _flash_parity(8, jnp.bfloat16)


def case_flash_injection_temporal():
    """Sharded injection + temporal kernels vs single-device references."""
    from motioneditor_tpu.control.injection import motion_frame_mask
    from motioneditor_tpu.ops.attention import (
        MOTION_FRAME, sdpa, select_kv, split_heads, merge_heads,
    )
    from motioneditor_tpu.parallel.flash_sharding import (
        FrameShardingCtx,
        sharded_injection_flash,
        sharded_temporal_flash,
    )

    b, f, n, c, heads = 2, 8, 1024, 64, 8
    scale = (c // heads) ** -0.5
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    mk = lambda i: jax.random.normal(ks[i], (b, f, n, c)) * 0.5
    q_t, k_s, v_s, k_t, v_t = mk(0), mk(1), mk(2), mk(3), mk(4)
    mask = (jax.random.uniform(ks[5], (f, n)) > 0.5).astype(jnp.float32)

    # reference: fused fg/bg injection oracle (fully_control.py:372-422)
    k_mf = select_kv(k_s, MOTION_FRAME)
    v_mf = select_kv(v_s, MOTION_FRAME)
    m = motion_frame_mask(mask[..., None])
    k_inj = jnp.concatenate([k_mf * m, k_mf * (1.0 - m), k_t], axis=2)
    v_inj = jnp.concatenate([v_mf, v_mf, v_t], axis=2)
    ref = merge_heads(sdpa(
        split_heads(q_t, heads), split_heads(k_inj, heads),
        split_heads(v_inj, heads), scale, use_flash=False,
    ))

    for fp in (4, 8):
        mesh = create_mesh((1, fp))
        ctx = FrameShardingCtx(mesh=mesh, batch_axis=None)
        with mesh:
            out = jax.jit(
                lambda *a: sharded_injection_flash(*a, scale, heads, ctx)
            )(q_t, k_s, v_s, k_t, v_t, mask)
        assert out is not None
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5,
            err_msg=f"injection fp={fp}",
        )

    # temporal: causal mask must hold at GLOBAL frame indices
    d = c // heads
    q5 = q_t.reshape(b, f, n, heads, d)
    k5 = k_s.reshape(b, f, n, heads, d)
    v5 = v_s.reshape(b, f, n, heads, d)
    s = jnp.einsum("bfnhd,bgnhd->bnhfg", q5, k5) * scale
    s = jnp.where(jnp.tril(jnp.ones((f, f), bool)), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    tref = jnp.einsum("bnhfg,bgnhd->bfnhd", p, v5).reshape(b, f, n, c)
    for fp in (4, 8):
        mesh = create_mesh((1, fp))
        ctx = FrameShardingCtx(mesh=mesh, batch_axis=None)
        with mesh:
            out = jax.jit(
                lambda q, k, v: sharded_temporal_flash(
                    q, k, v, scale, heads, True, ctx
                )
            )(q_t, k_s, v_s)
        assert out is not None
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(tref), atol=3e-5,
            err_msg=f"temporal fp={fp}",
        )
    print("flash_injection_temporal OK")


def case_train_step_flash():
    """Stage-1 train step over a (2, 4) mesh with the SHARDED KERNEL hot
    path (use_flash=True + shard_ctx): forward runs the Pallas kernels per
    frame shard, backward flows through the XLA-oracle VJPs and the halo
    collectives' transposes. Latents are 32x32 so level-0 attention (n=1024)
    actually reaches the kernels."""
    from motioneditor_tpu.parallel.flash_sharding import for_mesh
    from motioneditor_tpu.schedulers import DiffusionSchedule
    from motioneditor_tpu.training.common import make_optimizer, make_train_state
    from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES, train_step_stage1

    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64),
        norm_num_groups=8,
        attention_heads=4,
        cross_attention_dim=16,
    )
    mesh = create_mesh((2, 4))
    ctx = for_mesh(mesh)
    assert ctx is not None and ctx.fp == 4
    params = init_unet(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer()
    state = make_train_state(params, list(TRAINABLE_MODULES), optimizer)
    latents = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32, 32, 4)) * 0.2
    enc = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    lat_s = jax.device_put(
        latents, NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, None, None, None))
    )
    enc_s = jax.device_put(enc, NamedSharding(mesh, P(DATA_AXIS, None, None)))
    # deep-copy before device_put: the train step donates its state, and
    # device_put to a compatible sharding aliases rather than copies
    state_copy = jax.tree_util.tree_map(
        lambda x: jnp.array(x) if hasattr(x, "dtype") else x, state
    )
    state_s = jax.device_put(state_copy, NamedSharding(mesh, P()))

    # reference: identical step on one device, no sharding, same kernels off
    _, ref_metrics = train_step_stage1(
        state, latents, enc, jax.random.PRNGKey(3),
        unet_config=cfg, schedule=DiffusionSchedule(), optimizer=make_optimizer(),
        use_flash=False, remat=False,
    )
    with mesh:
        _, metrics = train_step_stage1(
            state_s, lat_s, enc_s, jax.random.PRNGKey(3),
            unet_config=cfg, schedule=DiffusionSchedule(), optimizer=optimizer,
            use_flash=True, remat=False, shard_ctx=ctx,
        )
        jax.block_until_ready(metrics["loss"])
    ref_loss, loss = float(ref_metrics["loss"]), float(metrics["loss"])
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4)
    print(f"train_step_flash OK loss={loss:.6f} (ref {ref_loss:.6f})")


def case_tp_flash():
    """TP x flash composition over a (1, 2, 2) (data, frames, model) mesh:
    model-sharded attention weights (parallel/tp.py) AND the frame-sharded
    Pallas kernel path (shard_ctx) in the SAME program.

    Round 5: the kernel wrappers now ALSO map the channel axis over
    ``model`` (flash_sharding.FrameShardingCtx.head_shards) — attention is
    embarrassingly parallel over heads and the Megatron column layout makes
    channel blocks = head blocks, so each model shard runs its own heads
    through the local kernel. This removes the all-gather GSPMD used to
    insert at the pallas_call boundary (the round-4 serialization noted in
    PARITY.md §2.8). Asserted here: numerical parity with the replicated
    XLA reference, the row-parallel to_out psum still present, and the
    kernel custom-calls operating on HEAD-LOCAL channel widths (C/tp)."""
    import re

    from motioneditor_tpu.parallel.flash_sharding import for_mesh
    from motioneditor_tpu.parallel.tp import shard_params_tp

    cfg = UNetConfig(
        block_out_channels=(32, 64, 64, 64),
        norm_num_groups=8,
        attention_heads=4,
        cross_attention_dim=16,
    )
    mesh = create_mesh((1, 2, 2))
    ctx = for_mesh(mesh)
    assert ctx is not None and ctx.fp == 2 and ctx.tp == 2
    assert ctx.head_shards(cfg.attention_heads, 32) == 2
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # 32x32 latents so level-0 attention (n=1024) actually reaches the kernels
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32, 32, 4))
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    t = jnp.asarray(100)

    ref = unet_apply(params, cfg, x, t, enc, use_flash=False)

    ps = shard_params_tp(params, mesh)
    xs = jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, FRAME_AXIS, None, None, None))
    )
    import dataclasses

    ctx_legacy = dataclasses.replace(ctx, model_axis=None)  # pre-round-5
    with mesh:
        f = jax.jit(
            lambda p, a: unet_apply(
                p, cfg, a, t, enc, use_flash=True, shard_ctx=ctx
            )
        )
        f_legacy = jax.jit(
            lambda p, a: unet_apply(
                p, cfg, a, t, enc, use_flash=True, shard_ctx=ctx_legacy
            )
        )
        hlo = f.lower(ps, xs).compile().as_text()
        hlo_legacy = f_legacy.lower(ps, xs).compile().as_text()
        out = f(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
    # the model-axis psum (row-parallel to_out) must still be present
    assert re.search(r"= \S+ all-reduce\(", hlo), "no model-axis psum in HLO"
    # head-local kernel dispatch: the legacy replicated-channel specs force
    # GSPMD to all-gather the model axis at every shard_map boundary; the
    # head-sharded specs must eliminate those (interpret-mode pallas has no
    # custom-call to shape-check on CPU, so assert on the collective count)
    n_ag = len(re.findall(r"= \S+ all-gather\(", hlo))
    n_ag_legacy = len(re.findall(r"= \S+ all-gather\(", hlo_legacy))
    assert n_ag < n_ag_legacy, (
        f"head sharding did not reduce model-axis gathers "
        f"({n_ag} vs legacy {n_ag_legacy})"
    )
    print(f"tp_flash OK (all-gathers {n_ag_legacy} -> {n_ag})")


if __name__ == "__main__":
    {
        "frame_sharded_forward": case_frame_sharded_forward,
        "train_step": case_train_step,
        "dryrun": case_dryrun,
        "collectives": case_collectives,
        "tensor_parallel": case_tensor_parallel,
        "flash_spatial": case_flash_spatial,
        "flash_injection_temporal": case_flash_injection_temporal,
        "train_step_flash": case_train_step_flash,
        "tp_flash": case_tp_flash,
    }[sys.argv[1]]()
