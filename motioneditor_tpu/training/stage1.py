"""Stage-1 appearance fine-tune (train_bg.py semantics) as one jitted step.

One-shot tune of the inflated UNet on the source video: freeze everything,
re-enable only attn1.to_q / attn2.to_q / attn_temp (train_bg.py:100-104),
DDPM eps-prediction MSE (:328-343), AdamW + grad clip (:202-208, :347-352).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from motioneditor_tpu.models.unet import UNetConfig, unet_apply
from motioneditor_tpu.schedulers import DiffusionSchedule, ddpm_add_noise, ddpm_velocity
from motioneditor_tpu.training.common import TrainState, combine_params

TRAINABLE_MODULES = ("attn1.to_q", "attn2.to_q", "attn_temp")


@functools.partial(
    jax.jit,
    static_argnames=("unet_config", "schedule", "optimizer", "prediction_type",
                     "use_flash", "remat", "compute_dtype", "accum_steps",
                     "shard_ctx"),
    donate_argnames=("state",),
)
def train_step_stage1(
    state: TrainState,
    latents: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    rng: jax.Array,
    unet_config: UNetConfig,
    schedule: DiffusionSchedule,
    optimizer,
    prediction_type: str = "epsilon",
    use_flash: bool = True,
    remat: bool = True,
    compute_dtype=None,
    accum_steps: int = 1,
    shard_ctx=None,
) -> Tuple[TrainState, dict]:
    """latents: [B, F, h, w, 4] (VAE-encoded source video x0.18215);
    encoder_hidden_states: [B, 77, 768] prompt embedding.

    ``compute_dtype`` (e.g. bf16) enables mixed-precision: activations run in
    that dtype (params are cast at use by the layer primitives), loss/grads in
    fp32 — the TPU equivalent of the reference's fp16 training default
    (train-bg.yaml mixed_precision: "fp16")."""
    b = latents.shape[0]
    enc_in = encoder_hidden_states
    if compute_dtype is not None:
        enc_in = enc_in.astype(compute_dtype)

    def micro_loss(trainable, micro_rng):
        rng_noise, rng_t = jax.random.split(micro_rng)
        noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
        t = jax.random.randint(rng_t, (b,), 0, schedule.num_train_timesteps)
        noisy = ddpm_add_noise(schedule, latents, noise, t)
        if prediction_type == "epsilon":
            target = noise
        elif prediction_type == "v_prediction":
            target = ddpm_velocity(schedule, latents, noise, t)
        else:
            raise ValueError(prediction_type)
        x_in = noisy if compute_dtype is None else noisy.astype(compute_dtype)
        params = combine_params(trainable, state.frozen)
        pred = unet_apply(
            params, unet_config, x_in, t, enc_in, use_flash=use_flash, remat=remat,
            shard_ctx=shard_ctx,
        )
        return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    if accum_steps == 1:
        loss, grads = jax.value_and_grad(micro_loss)(state.trainable, rng)
    else:
        # gradient accumulation (accelerator.accumulate, train_bg.py:312):
        # scan over microbatches, average loss and grads
        keys = jax.random.split(rng, accum_steps)

        def body(carry, k):
            acc_loss, acc_grads = carry
            l, g = jax.value_and_grad(micro_loss)(state.trainable, k)
            acc_grads = jax.tree_util.tree_map(
                lambda a, x: None if a is None else a + x,
                acc_grads, g, is_leaf=lambda x: x is None,
            )
            return (acc_loss + l, acc_grads), None

        zero_grads = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if x is not None else None,
            state.trainable,
            is_leaf=lambda x: x is None,
        )
        (loss, grads), _ = jax.lax.scan(body, (0.0, zero_grads), keys)
        loss = loss / accum_steps
        grads = jax.tree_util.tree_map(
            lambda g: g / accum_steps if g is not None else None, grads,
            is_leaf=lambda x: x is None,
        )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    new_state = TrainState(
        step=state.step + 1,
        trainable=trainable,
        frozen=state.frozen,
        opt_state=opt_state,
    )
    return new_state, {"loss": loss}
