"""MotionEditor pipeline: DDIM inversion, null-text optimization, and the
two-branch injected denoise loop — each phase one jitted ``lax.scan``.

Port map (reference /root/reference):
  __call__ denoise loop     motion_editor/pipelines/pipeline_motion_editor.py:505-666
  plain DDIM inversion      motion_editor/util.py:77-130
  null-text optimization    motion_editor/p2p/null_text_optimization.py:25-189
  entry orchestration       inference.py:249-343

TPU design notes:
  - the reference's per-step Python loop with monkey-patched editors becomes
    *segmented scans*: timesteps are partitioned into contiguous ranges of
    constant injection gating (default [0,4) vanilla + [4,50) injected) and
    each range is one ``lax.scan`` with a static InjectionSpec — no traced
    control flow, one compilation per segment shape;
  - the branch dimension [recon_u, edit_u, recon_c, edit_c] is an explicit
    size-4 leading axis; ControlNet runs only on the edit rows;
  - null-text optimization is a scan whose body takes ``jax.grad`` through
    the UNet w.r.t. the uncond embedding with a fresh Adam per timestep
    (the reference instantiates a new torch Adam each step, :144).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.injection import (
    InjectionSpec,
    prepare_injection_masks,
    segment_step_ranges,
)
from motioneditor_tpu.models.clip_text import CLIPTextConfig, clip_text_apply, tokenize
from motioneditor_tpu.models.controlnet import controlnet_apply
from motioneditor_tpu.models.unet import UNetConfig, unet_apply
from motioneditor_tpu.models.vae import (
    VAEConfig,
    vae_decode_video,
    vae_encode_video,
)
from motioneditor_tpu.schedulers import (
    DiffusionSchedule,
    ddim_inverse_step,
    ddim_step,
)


@dataclasses.dataclass
class MotionEditorPipeline:
    """Functional pipeline state: params + static configs + tokenizer."""

    unet_params: dict
    vae_params: dict
    text_params: dict
    controlnet_params: dict
    tokenizer: object
    unet_config: UNetConfig = UNetConfig()
    controlnet_config: UNetConfig = None
    vae_config: VAEConfig = VAEConfig()
    text_config: CLIPTextConfig = CLIPTextConfig()
    schedule: DiffusionSchedule = DiffusionSchedule()
    use_flash: bool = True
    # frame-sharded kernel execution under a mesh (FrameShardingCtx or None):
    # threaded into every jitted phase so the Pallas kernels run per frame
    # shard via shard_map instead of being replicated by GSPMD
    shard_ctx: object = None
    # UNet compute dtype for null-text optimization; the embedding/Adam/DDIM
    # math always stays fp32 (see _jit_null_optimization). "float32" is the
    # parity knob matching the reference's A100-default fp32 phase.
    null_text_dtype: str = "bfloat16"

    def __post_init__(self):
        if self.controlnet_config is None:
            self.controlnet_config = dataclasses.replace(
                self.unet_config, video=False, use_sc_attn=False, use_st_attn=False
            )

    # -- prompt encoding ----------------------------------------------------

    def encode_prompt(self, prompts: Sequence[str]) -> jnp.ndarray:
        ids = tokenize(self.tokenizer, prompts, self.text_config.max_position_embeddings)
        return clip_text_apply(self.text_params, ids, self.text_config)

    # -- VAE ----------------------------------------------------------------

    def encode_video(self, video, rng=None, sample=True):
        """[B, F, H, W, 3] in [-1,1] -> latents [B, F, h, w, 4] (x0.18215)."""
        return vae_encode_video(
            self.vae_params, video, rng=rng, sample=sample, config=self.vae_config
        )

    def decode_latents(self, latents):
        """latents [B, F, h, w, 4] -> video [B, F, H, W, 3] in [0,1]
        (pipeline_motion_editor.py:346-355)."""
        img = vae_decode_video(self.vae_params, latents, config=self.vae_config)
        return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

    # -- DDIM inversion -----------------------------------------------------

    def ddim_invert(
        self,
        latents: jnp.ndarray,
        prompt: str = "",
        num_inv_steps: int = 50,
        normal_infer: bool = True,
        return_all: bool = False,
    ):
        """Plain DDIM inversion (util.py:112-130). ``normal_infer=True``
        disables the video attention variants, matching inference.py:292."""
        cond = self.encode_prompt([prompt])
        ts = jnp.asarray(self.schedule.inference_timesteps(num_inv_steps))
        fn = _jit_ddim_invert(
            self.unet_config, self.schedule, num_inv_steps, normal_infer,
            self.use_flash, self.shard_ctx,
        )
        final, all_latents = fn(self.unet_params, latents, cond, ts)
        if return_all:
            return final, all_latents
        return final

    # -- null-text inversion --------------------------------------------------

    def null_text_inversion(
        self,
        latents: jnp.ndarray,
        prompt: str,
        num_steps: int = 50,
        null_inner_steps: int = 1,
        null_base_lr: float = 1e-2,
        guidance_scale: float = 7.5,
        null_normal_infer: bool = False,
        early_stop_epsilon: float = 1e-5,
    ):
        """MyNullInversion.invert (null_text_optimization.py:171-179).

        Returns (x_T, uncond_embeddings[num_steps, 1, 77, 768]).
        The reference's inversion loop runs with video attention
        (normal_infer=False hardcoded at :51).
        """
        cond = self.encode_prompt([prompt])
        uncond0 = self.encode_prompt([""])
        ts = jnp.asarray(self.schedule.inference_timesteps(num_steps))
        inv_fn = _jit_ddim_invert(
            self.unet_config, self.schedule, num_steps, null_normal_infer,
            self.use_flash, self.shard_ctx,
        )
        x_t, all_latents = inv_fn(self.unet_params, latents, cond, ts)
        opt_fn = _jit_null_optimization(
            self.unet_config,
            self.schedule,
            num_steps,
            null_inner_steps,
            null_base_lr,
            guidance_scale,
            self.use_flash,
            self.null_text_dtype,
            self.shard_ctx,
            early_stop_epsilon,
        )
        uncond_list = opt_fn(self.unet_params, all_latents, cond, uncond0, ts)
        return x_t, uncond_list

    # -- two-branch editing -------------------------------------------------

    def __call__(
        self,
        prompts: Sequence[str],
        latents: jnp.ndarray,
        target_skeleton: jnp.ndarray,
        source_masks: Optional[jnp.ndarray] = None,
        uncond_embeddings: Optional[jnp.ndarray] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        controlnet_conditioning_scale: float = 1.0,
        start_step: int = 4,
        start_layer: int = 10,
        p2p_controller=None,
        local_blend=None,
        decode: bool = True,
    ):
        """Two-branch edit (pipeline __call__ :505-666 + editor registration
        at inference.py:307-312).

        prompts: [source_prompt, target_prompt]
        latents: [2, F, h, w, 4] — DDIM-inverted seed repeated for both
                 branches (inference.py:296)
        target_skeleton: [F, H, W, 3] in [0,1] — aligned target pose frames;
                 the ControlNet conditioning image
        source_masks: [F, H, W] binary protagonist masks for the fg/bg K/V
                 decomposition (None disables mask injection)
        uncond_embeddings: optional per-step null embeddings
                 [num_steps, 1, 77, 768]
        p2p_controller: optional control.p2p.P2PController — prompt-to-prompt
                 cross-attention prob editing on the conditional rows
                 (prepare_control, inference.py:74-99)
        local_blend: optional control.p2p.LocalBlend — word-localized latent
                 blending applied after each DDIM step using the running sum
                 of 16x16 cross-attn maps (the functional AttentionStore,
                 p2p_stable.py:20-44/130-133)
        Returns video [2, F, H, W, 3] in [0,1]: [reconstruction, edit].
        """
        assert len(prompts) == 2
        assert latents.shape[0] == 2
        f = latents.shape[1]

        cond = self.encode_prompt(list(prompts))  # [2, 77, 768]
        if uncond_embeddings is None:
            uncond = self.encode_prompt([""])
            uncond = jnp.broadcast_to(uncond, cond.shape)
            per_step_uncond = None
        else:
            per_step_uncond = uncond_embeddings  # [T, 1, 77, 768]
            uncond = jnp.broadcast_to(per_step_uncond[0], cond.shape)

        hw = latents.shape[2]
        resolutions = tuple(
            (hw // (2**i), latents.shape[3] // (2**i)) for i in range(4)
        )
        masks = None
        if source_masks is not None:
            masks = prepare_injection_masks(source_masks, f, resolutions)

        ts = jnp.asarray(self.schedule.inference_timesteps(num_inference_steps))
        segments = segment_step_ranges(num_inference_steps, start_step=start_step)
        spec = InjectionSpec.from_start_layer(start_layer)

        # ControlNet conditioning: both CFG rows see the target skeleton
        # (pipeline:556-570 duplicates it for guidance). The conditioning
        # embedding is step-invariant — compute it once, outside the scans.
        from motioneditor_tpu.models.controlnet import precompute_cond_embedding

        cond_image = jnp.broadcast_to(
            target_skeleton[None], (2,) + target_skeleton.shape
        )
        cond_embedding = jax.jit(precompute_cond_embedding)(
            self.controlnet_params, cond_image
        )

        # LocalBlend needs the running 16x16 cross-attn map sum in the scan
        # carry; its leading dim is the number of 256-token attention sites
        maps_sum = jnp.zeros((), jnp.float32)
        if local_blend is not None:
            n_sites = _count_16x16_sites(latents.shape[2], latents.shape[3])
            if n_sites == 0:
                raise ValueError(
                    "LocalBlend requires a 16x16 attention resolution; latent "
                    f"shape {latents.shape[2:4]} never reaches 256 tokens"
                )
            maps_sum = jnp.zeros(
                (n_sites, 4 * f, 256, cond.shape[-2]), jnp.float32
            )

        lat = latents
        for (lo, hi, injected) in segments:
            seg_fn = _jit_denoise_segment(
                self.unet_config,
                self.controlnet_config,
                self.schedule,
                num_inference_steps,
                spec if injected else None,
                guidance_scale,
                controlnet_conditioning_scale,
                self.use_flash,
                per_step_uncond is not None,
                p2p_controller,
                local_blend,
                lo if (p2p_controller is not None or local_blend is not None) else 0,
                self.shard_ctx,
            )
            seg_uncond = (
                per_step_uncond[lo:hi]
                if per_step_uncond is not None
                else jnp.zeros((hi - lo, 1, 1, 1))
            )
            lat, maps_sum = seg_fn(
                self.unet_params,
                self.controlnet_params,
                lat,
                ts[lo:hi],
                cond,
                uncond,
                seg_uncond,
                cond_embedding,
                masks,
                maps_sum,
            )
        if decode:
            return self.decode_latents(lat)
        return lat


# ---------------------------------------------------------------------------
# jitted phase programs (cached per static signature)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _jit_ddim_invert(unet_config, schedule, num_steps, normal_infer, use_flash,
                     shard_ctx=None):
    def run(unet_params, latents, cond, ts):
        cond_b = jnp.broadcast_to(cond, (latents.shape[0],) + cond.shape[1:])

        def body(lat, i):
            t = ts[num_steps - i - 1]
            eps = unet_apply(
                unet_params,
                unet_config,
                lat,
                t,
                cond_b,
                normal_infer=normal_infer,
                use_flash=use_flash,
                shard_ctx=shard_ctx,
            )
            nxt = ddim_inverse_step(schedule, eps, t, lat, num_steps)
            return nxt, nxt

        final, all_lat = jax.lax.scan(body, latents, jnp.arange(num_steps))
        # prepend x_0 so all_lat[i] == latent after i inversion steps
        all_lat = jnp.concatenate([latents[None], all_lat], axis=0)
        return final, all_lat

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _jit_null_optimization(
    unet_config, schedule, num_steps, inner_steps, base_lr, guidance_scale,
    use_flash, compute_dtype="float32", shard_ctx=None,
    early_stop_epsilon=1e-5,
):
    """Per-timestep Adam on the uncond embedding pinning the CFG trajectory
    to the inversion trajectory (null_text_optimization.py:136-169).

    ``compute_dtype="bfloat16"`` runs the UNet forward/backward in bf16 while
    the optimized embedding, the Adam state and the DDIM/loss math stay fp32
    — the same fp32-master mixed-precision scheme as training (training/
    stage1.py). The reference runs this phase fp32 only because that is the
    A100 default; on TPU the bf16 path is the production setting and fp32
    remains the parity knob.

    Early stop (null_text_optimization.py:159-162): the inner Adam loop
    breaks once the trajectory loss after an update falls below
    ``early_stop_epsilon + i * 2e-5`` — a ``lax.while_loop`` with the
    reference's exact check order (update, then test the pre-update loss).
    Work saved per step: the reference additionally re-runs BOTH CFG
    branches for the latent advance (:167 ``get_noise_pred`` is a batched
    two-branch call); here ``eps_cond`` is computed once per timestep and
    reused, so each outer step costs 2 forwards + the inner
    forward/backward pairs instead of the reference's 3 forwards."""
    cdt = jnp.dtype(compute_dtype)

    def run(unet_params, all_latents, cond, uncond0, ts):
        # fp32 masters: trajectory targets, optimized embedding, DDIM math
        all_latents = all_latents.astype(jnp.float32)
        uncond0 = uncond0.astype(jnp.float32)
        def eps_fn(lat, t, emb):
            return unet_apply(
                unet_params, unet_config, lat.astype(cdt), t, emb.astype(cdt),
                normal_infer=False, use_flash=use_flash, shard_ctx=shard_ctx,
            ).astype(jnp.float32)

        def step_body(carry, i):
            latent_cur, uncond = carry
            t = ts[i]
            latent_prev = all_latents[num_steps - 1 - i]
            eps_cond = eps_fn(latent_cur, t, cond)

            def loss_fn(u):
                eps_u = eps_fn(latent_cur, t, u)
                eps = eps_u + guidance_scale * (eps_cond - eps_u)
                prev_rec = ddim_step(schedule, eps, t, latent_cur, num_steps)
                return jnp.mean((prev_rec - latent_prev) ** 2)

            lr = base_lr * (1.0 - i.astype(jnp.float32) / 100.0)
            thresh = early_stop_epsilon + i.astype(jnp.float32) * 2e-5

            def adam_cond(state):
                j, _, _, _, loss = state
                return jnp.logical_and(j < inner_steps, loss >= thresh)

            def adam_body(state):
                j, u, m, v, _ = state
                loss, g = jax.value_and_grad(loss_fn)(u)
                m = 0.9 * m + 0.1 * g
                v = 0.999 * v + 0.001 * g * g
                jf = j.astype(jnp.float32) + 1.0
                mhat = m / (1.0 - 0.9**jf)
                vhat = v / (1.0 - 0.999**jf)
                u = u - lr * mhat / (jnp.sqrt(vhat) + 1e-8)
                return (j + 1, u, m, v, loss)

            u0 = (jnp.zeros((), jnp.int32), uncond, jnp.zeros_like(uncond),
                  jnp.zeros_like(uncond), jnp.asarray(jnp.inf, jnp.float32))
            _, uncond, _, _, _ = jax.lax.while_loop(adam_cond, adam_body, u0)

            # advance latent with CFG using the optimized uncond (:165-167)
            eps_u = eps_fn(latent_cur, t, uncond)
            eps = eps_u + guidance_scale * (eps_cond - eps_u)
            latent_next = ddim_step(schedule, eps, t, latent_cur, num_steps)
            return (latent_next, uncond), uncond

        init = (all_latents[-1], uncond0)
        _, uncond_list = jax.lax.scan(step_body, init, jnp.arange(num_steps))
        return uncond_list

    return jax.jit(run)


def _count_16x16_sites(h0: int, w0: int) -> int:
    """Number of transformer blocks whose token count is 256 (the 16x16
    cross-attn map collection sites) for a latent of (h0, w0). For SD-1.5
    at 64x64 latents these are down_cross[2:4] + up_cross[:3] — exactly the
    maps the reference LocalBlend consumes (p2p_stable.py:23)."""
    n = 0
    for i in range(3):  # down blocks 0-2 (2 attn sites each)
        if (h0 >> i) * (w0 >> i) == 256:
            n += 2
    if (h0 >> 3) * (w0 >> 3) == 256:  # mid
        n += 1
    for r in (2, 1, 0):  # up blocks 1-3 (3 attn sites each)
        if (h0 >> r) * (w0 >> r) == 256:
            n += 3
    return n


@functools.lru_cache(maxsize=None)
def _jit_denoise_segment(
    unet_config,
    controlnet_config,
    schedule,
    num_steps,
    injection_spec,
    guidance_scale,
    controlnet_scale,
    use_flash,
    has_per_step_uncond,
    p2p_controller=None,
    local_blend=None,
    seg_lo=0,
    shard_ctx=None,
):
    """One contiguous timestep range of the two-branch denoise loop
    (pipeline:603-654) with static injection gating.

    ``p2p_controller`` / ``local_blend`` are identity-hashed static closures
    (control/p2p.py); ``seg_lo`` is the segment's global start step so the
    p2p per-step schedules index correctly inside the scan."""

    def run(
        unet_params,
        controlnet_params,
        latents,
        seg_ts,
        cond,
        uncond,
        seg_uncond,
        cond_embedding,
        masks,
        maps_sum,
    ):
        f = latents.shape[1]

        def body(carry, idx):
            lat, maps_acc = carry
            t = seg_ts[idx]
            # [recon, edit] -> batch-4 [ru, eu, rc, ec]
            latent_in = jnp.concatenate([lat, lat], axis=0)

            if has_per_step_uncond:
                u = jnp.broadcast_to(seg_uncond[idx], cond.shape)
            else:
                u = uncond
            text_in = jnp.concatenate([u, cond], axis=0)  # [4, 77, 768]

            # ControlNet: edit rows only (pipeline:613-625)
            cn_lat = latent_in[jnp.array([1, 3])]
            cn_text = text_in[jnp.array([1, 3])]
            down_res, mid_res = controlnet_apply(
                controlnet_params,
                controlnet_config,
                cn_lat,
                t,
                cn_text,
                conditioning_scale=controlnet_scale,
                use_flash=use_flash,
                cond_embedding=cond_embedding,
            )
            # mid residual zeroed on recon rows (pipeline:628-629)
            zero_mid = jnp.zeros_like(mid_res[:1])
            mid4 = jnp.concatenate(
                [zero_mid, mid_res[:1], zero_mid, mid_res[1:2]], axis=0
            )

            editor = (
                p2p_controller.prob_editor(seg_lo + idx)
                if p2p_controller is not None
                else None
            )
            unet_kwargs = dict(
                injection=injection_spec,
                injection_masks=masks,
                down_block_additional_residuals=down_res,
                mid_block_additional_residual=mid4,
                use_flash=use_flash,
                prob_editor=editor,
                shard_ctx=shard_ctx,
            )
            if local_blend is not None:
                step_maps: list = []
                eps = unet_apply(
                    unet_params, unet_config, latent_in, t, text_in,
                    _cross_maps_out=step_maps, **unet_kwargs,
                )
                # functional AttentionStore: running sum over steps
                # (p2p_stable.py:105-110 between_steps)
                maps_acc = maps_acc + jnp.stack(step_maps, axis=0)
            else:
                eps = unet_apply(
                    unet_params, unet_config, latent_in, t, text_in, **unet_kwargs
                )
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            eps_g = eps_u + guidance_scale * (eps_c - eps_u)
            lat_next = ddim_step(schedule, eps_g, t, lat, num_steps)
            if local_blend is not None:
                # step_callback after the scheduler step (ptp_utils.py:56-60);
                # maps restricted to the conditional rows [rc, ec] — the
                # store only ever sees the cond half (p2p_stable.py:69-70)
                lat_next = local_blend(lat_next, list(maps_acc[:, 2 * f :]))
            return (lat_next, maps_acc), None

        (final, maps_out), _ = jax.lax.scan(
            body, (latents, maps_sum), jnp.arange(seg_ts.shape[0])
        )
        return final, maps_out

    # masks is a dict keyed by (h, w) — mark it static-friendly by closing
    # over pytree structure; jit handles dict pytrees natively.
    return jax.jit(run)
