"""Two-branch motion-editing inference CLI.

Mirrors /root/reference/inference.py: ``python scripts/inference.py --config
configs/case-1/eval-motion.yaml``. The yaml keys are the reference's
(inference.py:102-119); checkpoints are orbax dirs produced by the training
scripts (or raw SD-1.5 + adapter torch checkpoints via models/weights.py).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.configs import load_config, save_config
from motioneditor_tpu.data.dataset import VideoDataset
from motioneditor_tpu.models.clip_text import StubTokenizer, load_clip_tokenizer
from motioneditor_tpu.models.controlnet import controlnet_config, init_controlnet
from motioneditor_tpu.models.unet import UNetConfig, init_unet
from motioneditor_tpu.models.vae import init_vae
from motioneditor_tpu.models.clip_text import init_clip_text
from motioneditor_tpu.pipelines.editor import MotionEditorPipeline
from motioneditor_tpu.utils.video import save_videos_grid


def build_pipeline(cfg, need_controlnet: bool = True) -> MotionEditorPipeline:
    unet_config = UNetConfig(
        use_sc_attn=cfg.use_sc_attn,
        use_st_attn=cfg.use_st_attn,
        st_attn_idx=cfg.st_attn_idx,
    )
    key = jax.random.PRNGKey(cfg.seed or 0)
    keys = jax.random.split(key, 4)
    have_weights = osp.isdir(osp.join(cfg.pretrained_model_path, "unet"))
    controlnet_params = {}
    if have_weights:
        from motioneditor_tpu.models import weights as W

        print(f"loading SD-1.5 weights from {cfg.pretrained_model_path}")
        unet_params = W.load_sd15_unet(cfg.pretrained_model_path, unet_config, keys[0])
        vae_params = W.load_sd15_vae(cfg.pretrained_model_path)
        text_params = W.load_sd15_text_encoder(cfg.pretrained_model_path)
        tokenizer = load_clip_tokenizer(cfg.pretrained_model_path)
        if need_controlnet:
            if osp.isdir(cfg.controlnet_path):
                controlnet_params = W.load_controlnet(cfg.controlnet_path)
            else:
                controlnet_params = init_controlnet(keys[1])
    else:
        print(
            f"WARNING: no pretrained weights at {cfg.pretrained_model_path}; "
            "using random init (smoke-test mode)"
        )
        unet_params = init_unet(keys[0], unet_config)
        vae_params = init_vae(keys[1])
        text_params = init_clip_text(keys[2])
        if need_controlnet:
            controlnet_params = init_controlnet(keys[3])
        tokenizer = StubTokenizer()

    pipe = MotionEditorPipeline(
        unet_params=unet_params,
        vae_params=vae_params,
        text_params=text_params,
        controlnet_params=controlnet_params,
        tokenizer=tokenizer,
        unet_config=unet_config,
        use_flash=cfg.use_flash_attention,
        # fp32 parity mode keeps the reference's fp32 null-text phase;
        # otherwise bf16 compute + fp32 masters (the TPU production path)
        null_text_dtype=(
            "float32" if cfg.mixed_precision in ("no", "fp32") else "bfloat16"
        ),
    )

    # stage-1 state + stand-alone adapter weights (inference.py:237-240)
    if cfg.resume_from_checkpoint and osp.isdir(cfg.resume_from_checkpoint):
        import orbax.checkpoint as ocp

        from motioneditor_tpu.training.common import (
            make_optimizer,
            make_train_state,
        )
        from motioneditor_tpu.training.checkpoint import restore_train_state
        from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES

        state = make_train_state(unet_params, TRAINABLE_MODULES, make_optimizer())
        state = restore_train_state(cfg.resume_from_checkpoint, state)
        pipe.unet_params = state.params
        print(f"restored stage-1 state from {cfg.resume_from_checkpoint}")
    if cfg.adapter_weight_path:
        if cfg.adapter_weight_path.endswith(".pth"):
            from motioneditor_tpu.models.weights import load_adapter_checkpoint

            pipe.unet_params["controlnet_adapter"] = load_adapter_checkpoint(
                cfg.adapter_weight_path
            )
        elif osp.isdir(cfg.adapter_weight_path):
            from motioneditor_tpu.training.checkpoint import load_adapter

            pipe.unet_params["controlnet_adapter"] = load_adapter(
                cfg.adapter_weight_path, pipe.unet_params["controlnet_adapter"]
            )
        print(f"loaded adapter weights from {cfg.adapter_weight_path}")
    return pipe


def main(config_path: str):
    from motioneditor_tpu.utils.runtime import setup

    setup()  # compile cache; precision applied after config load

    cfg = load_config(config_path)
    if cfg.mixed_precision in ("no", "fp32"):
        # fp32 parity mode (eval-motion.yaml mixed_precision: "no"):
        # force true-fp32 matmul passes instead of bf16-split defaults
        import jax as _jax

        _jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(cfg.output_dir, exist_ok=True)
    os.makedirs(osp.join(cfg.output_dir, "sample"), exist_ok=True)
    save_config(cfg, osp.join(cfg.output_dir, "config.yaml"))

    pipe = build_pipeline(cfg)
    ds = VideoDataset(**vars(cfg.input_data))
    batch = ds[0]
    vd = cfg.validation_data

    video = jnp.asarray(batch["pixel_values"])[None]  # [1, F, H, W, 3]
    f = video.shape[1]
    rng = jax.random.PRNGKey(cfg.seed or 0)
    latents = pipe.encode_video(video, rng=rng, sample=True)

    cond_name = cfg.input_data.condition[0]
    target_skel = jnp.asarray(batch["target_conditions"][cond_name])  # [F, H, W, 3]
    source_masks = jnp.asarray(batch["source_masks"])  # [F, H, W]

    # inversion (inference.py:276-296)
    if vd.use_null_inv:
        inv_latent, uncond_embeddings = pipe.null_text_inversion(
            latents,
            ds.prompt,
            num_steps=vd.num_inv_steps,
            null_inner_steps=vd.null_inner_steps,
            null_base_lr=vd.null_base_lr,
            guidance_scale=vd.guidance_scale,
            early_stop_epsilon=vd.early_stop_epsilon,
        )
    else:
        inv_latent = pipe.ddim_invert(
            latents, prompt="", num_inv_steps=vd.num_inv_steps, normal_infer=True
        )
        uncond_embeddings = None

    seed_latents = jnp.concatenate([inv_latent, inv_latent], axis=0)  # [2, F, ...]

    for prompt in vd.prompts:
        prompts = [ds.prompt, prompt]
        # prepare_control equivalent (inference.py:74-99): Replace vs Refine
        # chosen by word-count match; Reweight when an equalizer is given;
        # LocalBlend from blend words
        p2p_controller = local_blend = None
        if vd.use_p2p:
            from motioneditor_tpu.control.p2p import make_controller, make_local_blend

            p2p_controller = make_controller(
                prompts,
                pipe.tokenizer,
                vd.num_inference_steps,
                cross_replace_steps=vd.p2p_cross_replace_steps,
                self_replace_steps=vd.p2p_self_replace_steps,
                equalizer_words=list(vd.p2p_eq_words) or None,
                equalizer_values=list(vd.p2p_eq_values) or None,
            )
            if vd.p2p_blend_words:
                local_blend = make_local_blend(
                    prompts,
                    [list(vd.p2p_blend_words)] * 2,
                    pipe.tokenizer,
                    threshold=vd.p2p_blend_threshold,
                )
            print(f"p2p control: {p2p_controller.kind}"
                  + (" + LocalBlend" if local_blend else ""))
        sample = pipe(
            prompts,
            seed_latents,
            target_skel,
            source_masks=source_masks,
            uncond_embeddings=uncond_embeddings,
            num_inference_steps=vd.num_inference_steps,
            guidance_scale=vd.guidance_scale,
            controlnet_conditioning_scale=vd.controlnet_conditioning_scale,
            p2p_controller=p2p_controller,
            local_blend=local_blend,
        )
        sample = np.asarray(sample)
        sample_inv, sample_gen = sample[:1], sample[1:]
        save_videos_grid(sample_gen, f"{cfg.output_dir}/sample/{prompt}.gif", fps=cfg.fps)
        save_videos_grid(
            sample_inv, f"{cfg.output_dir}/sample/{prompt}-inv.gif", fps=cfg.fps
        )
        print(f"saved {cfg.output_dir}/sample/{prompt}.gif")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    main(p.parse_args().config)
