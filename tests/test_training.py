import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motioneditor_tpu.models.controlnet import init_controlnet
from motioneditor_tpu.models.unet import UNetConfig, init_unet
from motioneditor_tpu.schedulers import DiffusionSchedule
from motioneditor_tpu.training.common import (
    combine_params,
    make_optimizer,
    make_train_state,
    trainable_mask,
)
from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES, train_step_stage1
from motioneditor_tpu.training.stage2 import (
    TRAINABLE_MODULES as S2_MODULES,
    train_step_stage2,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pytest.ini)

TINY = UNetConfig(
    block_out_channels=(32, 64, 64, 64),
    norm_num_groups=8,
    attention_heads=4,
    cross_attention_dim=16,
)


@pytest.fixture(scope="module")
def setup():
    params = init_unet(jax.random.PRNGKey(0), TINY)
    optimizer = make_optimizer(learning_rate=1e-3)
    return params, optimizer


def test_trainable_mask_selects_reference_modules(setup):
    """Stage-1 unfreezes exactly attn1.to_q / attn2.to_q / attn_temp
    (train_bg.py:100-104). attn_temp as a module name unfreezes its whole
    subtree (q/k/v/out), like torch named_modules suffix matching."""
    params, _ = setup
    mask = trainable_mask(params, list(TRAINABLE_MODULES))
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = {".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
          for path, v in flat if v}
    assert any("attn1.to_q" in s for s in on)
    assert any("attn2.to_q" in s for s in on)
    assert any("attn_temp.to_k" in s for s in on)  # whole attn_temp module
    assert not any("attn1.to_k" in s for s in on)
    assert not any("conv1" in s for s in on)


def _fresh(p):
    # the train steps donate their state; tests must not reuse donated buffers
    return jax.tree_util.tree_map(lambda x: jnp.array(x), p)


def test_stage1_step_updates_only_trainables(setup):
    params, optimizer = setup
    state = make_train_state(_fresh(params), list(TRAINABLE_MODULES), optimizer)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    # snapshot compared leaves BEFORE the (donating) step
    old_q = np.asarray(
        state.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    )
    old_c = np.asarray(state.frozen["conv_in"]["kernel"])
    new_state, metrics = train_step_stage1(
        state, latents, enc, jax.random.PRNGKey(3),
        unet_config=TINY, schedule=DiffusionSchedule(), optimizer=optimizer,
        use_flash=False,
    )
    assert np.isfinite(float(metrics["loss"]))
    new_q = new_state.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    assert not np.allclose(old_q, np.asarray(new_q))
    new_c = new_state.frozen["conv_in"]["kernel"]
    np.testing.assert_array_equal(old_c, np.asarray(new_c))
    # loss decreases over a few steps on a fixed batch
    s = new_state
    losses = []
    for i in range(5):
        s, m = train_step_stage1(
            s, latents, enc, jax.random.PRNGKey(42),  # fixed noise: same batch
            unet_config=TINY, schedule=DiffusionSchedule(), optimizer=optimizer,
            use_flash=False,
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_stage2_step_updates_only_adapter(setup):
    params, optimizer = setup
    cn_cfg = dataclasses.replace(TINY, video=False, use_sc_attn=False)
    cn_params = init_controlnet(jax.random.PRNGKey(7), cn_cfg)
    state = make_train_state(_fresh(params), list(S2_MODULES), optimizer)
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    skel = jax.random.uniform(jax.random.PRNGKey(2), (1, 2, 64, 64, 3))
    enc = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    old_a = np.asarray(
        state.trainable["controlnet_adapter"]["body"][0]["attn_pose"]["to_q"]["kernel"]
    )
    new_state, metrics = train_step_stage2(
        state, cn_params, latents, skel, enc, jax.random.PRNGKey(4),
        unet_config=TINY, controlnet_config=cn_cfg,
        schedule=DiffusionSchedule(), optimizer=optimizer, use_flash=False,
    )
    assert np.isfinite(float(metrics["loss"]))
    new_a = new_state.trainable["controlnet_adapter"]["body"][0]["attn_pose"]["to_q"]["kernel"]
    assert not np.allclose(old_a, np.asarray(new_a))
    # UNet proper is frozen in stage 2
    assert new_state.frozen["conv_in"] is not None
    full = new_state.params
    np.testing.assert_array_equal(
        np.asarray(full["conv_in"]["kernel"]), np.asarray(params["conv_in"]["kernel"])
    )


def test_resume_continues_loss_trajectory(tmp_path, setup):
    """Train N steps, checkpoint, restore, continue M steps: the losses of
    steps N..N+M must match an uninterrupted N+M run exactly (reference
    resume semantics: train_bg.py:279-293 restores global_step and skips
    consumed data, so the resumed trajectory is the uninterrupted one).

    Uses the same step-indexed rng derivation as scripts/train_bg.py
    (jax.random.fold_in(base, step))."""
    from motioneditor_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    params, optimizer = setup
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4)) * 0.2
    enc = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    base_rng = jax.random.PRNGKey(0)
    N, M = 2, 2

    def run(state, start, stop, ckpt_at=None):
        losses = []
        for step in range(start, stop):
            srng = jax.random.fold_in(base_rng, step)
            state, m = train_step_stage1(
                state, latents, enc, srng,
                unet_config=TINY, schedule=DiffusionSchedule(),
                optimizer=optimizer, use_flash=False,
            )
            losses.append(float(m["loss"]))  # train_step already advanced state.step
            if ckpt_at is not None and step + 1 == ckpt_at:
                save_train_state(str(tmp_path), step + 1, state)
        return state, losses

    # uninterrupted N+M steps
    _, ref_losses = run(
        make_train_state(_fresh(params), list(TRAINABLE_MODULES), optimizer),
        0, N + M,
    )
    # interrupted: N steps + checkpoint, then restore into a FRESH state
    run(
        make_train_state(_fresh(params), list(TRAINABLE_MODULES), optimizer),
        0, N, ckpt_at=N,
    )
    found = latest_checkpoint(str(tmp_path))
    assert found is not None and found[1] == N
    fresh = make_train_state(_fresh(params), list(TRAINABLE_MODULES), optimizer)
    restored = restore_train_state(found[0], fresh)
    assert restored.step == N
    _, resumed_losses = run(restored, restored.step, N + M)
    np.testing.assert_allclose(resumed_losses, ref_losses[N:], rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path, setup):
    params, optimizer = setup
    from motioneditor_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    state = make_train_state(_fresh(params), list(TRAINABLE_MODULES), optimizer)
    path = save_train_state(str(tmp_path), 42, state)
    found = latest_checkpoint(str(tmp_path))
    assert found is not None and found[1] == 42
    restored = restore_train_state(path, state)
    assert restored.step == 42
    q0 = state.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    q1 = restored.trainable["down_blocks"][0]["attentions"][0]["blocks"][0]["attn1"]["to_q"]["kernel"]
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
