"""Stage-2 content-aware motion-adapter training CLI (mirrors
/root/reference/train_adaptor.py): trains ONLY unet.controlnet_adapter on top
of the stage-1 checkpoint; saves adapter weights stand-alone.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

from motioneditor_tpu.configs import load_config, save_config
from motioneditor_tpu.data.dataset import VideoDataset
from motioneditor_tpu.models.clip_text import clip_text_apply, tokenize
from motioneditor_tpu.schedulers import DiffusionSchedule
from motioneditor_tpu.training.checkpoint import (
    restore_train_state,
    save_adapter,
    save_train_state,
)
from motioneditor_tpu.training.common import make_optimizer, make_train_state
from motioneditor_tpu.training.stage2 import TRAINABLE_MODULES, train_step_stage2


def main(config_path: str):
    from motioneditor_tpu.utils.runtime import setup

    setup()  # compile cache; precision applied after config load

    from scripts.inference import build_pipeline

    cfg = load_config(config_path)
    if cfg.mixed_precision in ("no", "fp32"):
        # fp32 parity mode (eval-motion.yaml mixed_precision: "no"):
        # force true-fp32 matmul passes instead of bf16-split defaults
        import jax as _jax

        _jax.config.update("jax_default_matmul_precision", "highest")
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_config(cfg, osp.join(cfg.output_dir, "config.yaml"))

    pipe = build_pipeline(cfg)

    # load stage-1 state first (train_adaptor.py:301-302)
    if cfg.one_stage_checkpoint and osp.isdir(cfg.one_stage_checkpoint):
        from motioneditor_tpu.training.stage1 import (
            TRAINABLE_MODULES as S1_MODULES,
        )

        s1_state = make_train_state(pipe.unet_params, list(S1_MODULES), make_optimizer())
        s1_state = restore_train_state(cfg.one_stage_checkpoint, s1_state)
        pipe.unet_params = s1_state.params
        print(f"loaded stage-1 checkpoint {cfg.one_stage_checkpoint}")

    ds = VideoDataset(**vars(cfg.input_data))
    batch = ds[0]

    optimizer = make_optimizer(
        cfg.learning_rate, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_epsilon,
        cfg.adam_weight_decay, cfg.max_grad_norm,
    )
    dtype = cfg.compute_dtype
    import jax.numpy as _jnp
    frozen_dtype = dtype if dtype != _jnp.float32 else None
    state = make_train_state(
        pipe.unet_params, list(TRAINABLE_MODULES), optimizer, frozen_dtype=frozen_dtype
    )
    pipe.unet_params = None
    if frozen_dtype is not None:
        import jax as _jax
        pipe.controlnet_params = _jax.tree_util.tree_map(
            lambda x: x.astype(frozen_dtype), pipe.controlnet_params
        )

    schedule = DiffusionSchedule()
    video = jnp.asarray(batch["pixel_values"])[None]
    rng = jax.random.PRNGKey(cfg.seed or 0)
    rng, vrng = jax.random.split(rng)
    latents = pipe.encode_video(video, rng=vrng, sample=True)
    cond_name = cfg.input_data.condition[0]
    source_skel = jnp.asarray(batch["source_conditions"][cond_name])[None]
    ids = tokenize(pipe.tokenizer, [ds.prompt])
    enc = clip_text_apply(pipe.text_params, ids, pipe.text_config)

    step = int(state.step)
    t0 = time.time()
    while step < cfg.max_train_steps:
        # step-indexed rng: resume draws the same noise as an uninterrupted
        # run (see scripts/train_bg.py and train_bg.py:279-293 skip semantics)
        srng = jax.random.fold_in(rng, step)
        state, metrics = train_step_stage2(
            state, pipe.controlnet_params, latents, source_skel, enc, srng,
            unet_config=pipe.unet_config, controlnet_config=pipe.controlnet_config,
            schedule=schedule, optimizer=optimizer, use_flash=cfg.use_flash_attention,
            remat=cfg.gradient_checkpointing,
            compute_dtype=frozen_dtype,
        )
        step += 1
        if step % 10 == 0 or step == 1:
            loss = float(metrics["loss"])
            print(f"step {step}/{cfg.max_train_steps} loss={loss:.5f} "
                  f"({(time.time()-t0)/step:.2f}s/step)")
        if step % cfg.checkpointing_steps == 0:
            path = save_train_state(cfg.output_dir, step, state)
            adapter = state.params["controlnet_adapter"]
            apath = save_adapter(cfg.output_dir, step, adapter)
            print(f"saved state to {path}; adapter to {apath}")
    print("done")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    main(p.parse_args().config)
