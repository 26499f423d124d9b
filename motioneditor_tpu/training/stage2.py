"""Stage-2 adapter training (train_adaptor.py semantics) as one jitted step.

Only ``controlnet_adapter`` params train (train_adaptor.py:170-173). Each
step runs the frozen ControlNet on the *source* skeleton over the noisy
latents (:347-371); the residuals feed the UNet's batch!=4 adapter branch
(unet_2d_condition.py:482-485) where the adapter cross-attends to the UNet's
own down-res features.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from motioneditor_tpu.models.controlnet import controlnet_apply
from motioneditor_tpu.models.unet import UNetConfig, unet_apply
from motioneditor_tpu.schedulers import DiffusionSchedule, ddpm_add_noise, ddpm_velocity
from motioneditor_tpu.training.common import TrainState, combine_params

TRAINABLE_MODULES = ("controlnet_adapter",)


@functools.partial(
    jax.jit,
    static_argnames=(
        "unet_config", "controlnet_config", "schedule", "optimizer",
        "prediction_type", "use_flash", "remat", "compute_dtype", "shard_ctx",
    ),
    donate_argnames=("state",),
)
def train_step_stage2(
    state: TrainState,
    controlnet_params,
    latents: jnp.ndarray,
    source_skeleton: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,
    rng: jax.Array,
    unet_config: UNetConfig,
    controlnet_config: UNetConfig,
    schedule: DiffusionSchedule,
    optimizer,
    prediction_type: str = "epsilon",
    use_flash: bool = True,
    remat: bool = True,
    compute_dtype=None,
    shard_ctx=None,
) -> Tuple[TrainState, dict]:
    """latents: [B, F, h, w, 4]; source_skeleton: [B, F, H, W, 3] in [0,1]."""
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
    skel_in = source_skeleton
    if compute_dtype is not None:
        x_in = x_in.astype(compute_dtype)
        enc_in = enc_in.astype(compute_dtype)
        skel_in = skel_in.astype(compute_dtype)

    # frozen ControlNet on source skeletons (train_adaptor.py:347-371)
    down_res, mid_res = controlnet_apply(
        controlnet_params,
        controlnet_config,
        x_in,
        t,
        enc_in,
        skel_in,
        conditioning_scale=1.0,
        use_flash=use_flash,
    )
    down_res = [jax.lax.stop_gradient(d) for d in down_res]
    mid_res = jax.lax.stop_gradient(mid_res)

    def loss_fn(trainable):
        params = combine_params(trainable, state.frozen)
        pred = unet_apply(
            params,
            unet_config,
            x_in,
            t,
            enc_in,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res,
            use_flash=use_flash,
            remat=remat,
            shard_ctx=shard_ctx,
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
