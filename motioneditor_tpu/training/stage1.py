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
                     "use_flash", "remat", "compute_dtype"),
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
) -> Tuple[TrainState, dict]:
    """latents: [B, F, h, w, 4] (VAE-encoded source video x0.18215);
    encoder_hidden_states: [B, 77, 768] prompt embedding.

    ``compute_dtype`` (e.g. bf16) enables mixed-precision: activations run in
    that dtype (params are cast at use by the layer primitives), loss/grads in
    fp32 — the TPU equivalent of the reference's fp16 training default
    (train-bg.yaml mixed_precision: "fp16")."""
    rng_noise, rng_t = jax.random.split(rng)
    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    b = latents.shape[0]
    t = jax.random.randint(rng_t, (b,), 0, schedule.num_train_timesteps)
    noisy = ddpm_add_noise(schedule, latents, noise, t)
    if prediction_type == "epsilon":
        target = noise
    elif prediction_type == "v_prediction":
        target = ddpm_velocity(schedule, latents, noise, t)
    else:
        raise ValueError(prediction_type)

    x_in, enc_in = noisy, encoder_hidden_states
    if compute_dtype is not None:
        x_in = x_in.astype(compute_dtype)
        enc_in = enc_in.astype(compute_dtype)

    def loss_fn(trainable):
        params = combine_params(trainable, state.frozen)
        pred = unet_apply(
            params, unet_config, x_in, t, enc_in, use_flash=use_flash, remat=remat
        )
        return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    new_state = TrainState(
        step=state.step + 1,
        trainable=trainable,
        frozen=state.frozen,
        opt_state=opt_state,
    )
    return new_state, {"loss": loss}
