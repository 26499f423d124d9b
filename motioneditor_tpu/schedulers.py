"""Functional DDIM / DDPM scheduler math.

Closed-form re-derivation of the scheduler semantics the reference uses via
diffusers (DDIMScheduler / DDPMScheduler with the SD-1.5 config) plus the
hand-written DDIM inversion step (reference: motion_editor/util.py:77-87 and
motion_editor/p2p/null_text_optimization.py:26-48).

Everything here is pure jnp on static shapes: schedules are precomputed
arrays indexed by traced timesteps, so all of it lives happily inside
``lax.scan`` bodies.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed noise schedule (SD-1.5 defaults).

    Mirrors the scheduler config loaded at inference.py:192 /
    train_bg.py: DDPMScheduler.from_pretrained — scaled-linear betas,
    1000 train steps, steps_offset=1, set_alpha_to_one=False,
    prediction_type="epsilon".
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"

    @property
    def betas(self) -> np.ndarray:
        if self.beta_schedule == "scaled_linear":
            return (
                np.linspace(
                    self.beta_start**0.5,
                    self.beta_end**0.5,
                    self.num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        if self.beta_schedule == "linear":
            return np.linspace(
                self.beta_start, self.beta_end, self.num_train_timesteps, dtype=np.float64
            )
        raise ValueError(f"unknown beta schedule {self.beta_schedule}")

    @property
    def alphas_cumprod(self) -> jnp.ndarray:
        return jnp.asarray(np.cumprod(1.0 - self.betas), dtype=jnp.float32)

    @property
    def final_alpha_cumprod(self) -> jnp.ndarray:
        acp = self.alphas_cumprod
        if self.set_alpha_to_one:
            return jnp.asarray(1.0, dtype=jnp.float32)
        return acp[0]

    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps, matching diffusers DDIMScheduler.

        With 50 steps and steps_offset=1: [981, 961, ..., 21, 1].
        """
        step_ratio = self.num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        ts += self.steps_offset
        return ts.astype(np.int64)


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
    eta: float = 0.0,
) -> jnp.ndarray:
    """One deterministic DDIM denoise step x_t -> x_{t-Δ} (eta=0 path).

    Matches diffusers DDIMScheduler.step as invoked at
    pipeline_motion_editor.py:648 (eta defaults to 0 at :516).
    """
    del eta  # only the deterministic path is used by the reference
    acp = schedule.alphas_cumprod
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    prev_t = timestep - step_ratio

    alpha_t = acp[timestep]
    alpha_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], schedule.final_alpha_cumprod)

    # fp32 internally; preserve the caller's dtype (bf16 scans carry bf16)
    dtype = sample.dtype
    sample32 = sample.astype(jnp.float32)
    eps32 = model_output.astype(jnp.float32)
    beta_t = 1.0 - alpha_t
    pred_x0 = (sample32 - beta_t**0.5 * eps32) / alpha_t**0.5
    direction = (1.0 - alpha_prev) ** 0.5 * eps32
    return (alpha_prev**0.5 * pred_x0 + direction).astype(dtype)


def ddim_inverse_step(
    schedule: DiffusionSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """One DDIM inversion step x_{t-Δ} -> x_t.

    Port of ``next_step`` (motion_editor/util.py:77-87): given the model
    output evaluated at ``sample`` with conditioning timestep ``timestep``,
    produces the next (noisier) latent. The reference clamps the "from"
    timestep at 999 and falls back to final_alpha_cumprod below 0.
    """
    acp = schedule.alphas_cumprod
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    from_t = jnp.minimum(timestep - step_ratio, schedule.num_train_timesteps - 1)
    alpha_from = jnp.where(
        from_t >= 0, acp[jnp.maximum(from_t, 0)], schedule.final_alpha_cumprod
    )
    alpha_to = acp[timestep]

    dtype = sample.dtype
    sample32 = sample.astype(jnp.float32)
    eps32 = model_output.astype(jnp.float32)
    beta_from = 1.0 - alpha_from
    x0 = (sample32 - beta_from**0.5 * eps32) / alpha_from**0.5
    direction = (1.0 - alpha_to) ** 0.5 * eps32
    return (alpha_to**0.5 * x0 + direction).astype(dtype)


def ddpm_add_noise(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0) forward noising (train_bg.py:332 add_noise)."""
    acp = schedule.alphas_cumprod
    sqrt_acp = acp[timesteps] ** 0.5
    sqrt_one_minus = (1.0 - acp[timesteps]) ** 0.5
    # broadcast over trailing dims of sample; preserve the sample's dtype
    shape = (-1,) + (1,) * (sample.ndim - 1)
    out = sqrt_acp.reshape(shape) * sample.astype(jnp.float32) + sqrt_one_minus.reshape(
        shape
    ) * noise.astype(jnp.float32)
    return out.astype(sample.dtype)


def ddpm_velocity(
    schedule: DiffusionSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction target (train_bg.py:338 get_velocity)."""
    acp = schedule.alphas_cumprod
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_acp = (acp[timesteps] ** 0.5).reshape(shape)
    sqrt_one_minus = ((1.0 - acp[timesteps]) ** 0.5).reshape(shape)
    return sqrt_acp * noise - sqrt_one_minus * sample


def cfg_combine(
    noise_pred: jnp.ndarray, guidance_scale: float
) -> jnp.ndarray:
    """Classifier-free guidance over the branch axis.

    ``noise_pred`` has leading branch axis [recon_u, edit_u, recon_c, edit_c]
    (pipeline_motion_editor.py:643-645). Returns a 2-branch [recon, edit].
    """
    uncond, cond = jnp.split(noise_pred, 2, axis=0)
    return uncond + guidance_scale * (cond - uncond)
