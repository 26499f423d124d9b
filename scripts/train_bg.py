"""Stage-1 background/appearance fine-tune CLI (mirrors /root/reference/
train_bg.py): ``python scripts/train_bg.py --config configs/case-1/train-bg.yaml``.
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
from motioneditor_tpu.pipelines.editor import MotionEditorPipeline
from motioneditor_tpu.schedulers import DiffusionSchedule
from motioneditor_tpu.training.checkpoint import latest_checkpoint, restore_train_state, save_train_state
from motioneditor_tpu.training.common import make_optimizer, make_train_state
from motioneditor_tpu.training.stage1 import TRAINABLE_MODULES, train_step_stage1


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

    pipe = build_pipeline(cfg, need_controlnet=False)
    ds = VideoDataset(**vars(cfg.input_data))
    batch = ds[0]

    lr = cfg.learning_rate
    if cfg.scale_lr:
        lr *= cfg.gradient_accumulation_steps * cfg.train_batch_size
    optimizer = make_optimizer(
        lr, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_epsilon,
        cfg.adam_weight_decay, cfg.max_grad_norm,
        use_8bit=cfg.use_8bit_adam,
    )
    dtype = cfg.compute_dtype
    import jax.numpy as _jnp
    frozen_dtype = dtype if dtype != _jnp.float32 else None
    state = make_train_state(
        pipe.unet_params, list(TRAINABLE_MODULES), optimizer, frozen_dtype=frozen_dtype
    )
    del pipe.unet_params  # state owns the params now; free the fp32 copies
    pipe.unet_params = None

    if cfg.resume_from_checkpoint:
        ck = (
            (cfg.resume_from_checkpoint, None)
            if cfg.resume_from_checkpoint != "latest"
            else latest_checkpoint(cfg.output_dir)
        )
        if ck:
            state = restore_train_state(ck[0], state)
            print(f"resumed from {ck[0]} at step {state.step}")

    schedule = DiffusionSchedule()
    video = jnp.asarray(batch["pixel_values"])[None]
    rng = jax.random.PRNGKey(cfg.seed or 0)
    rng, vrng = jax.random.split(rng)
    latents = pipe.encode_video(video, rng=vrng, sample=True)
    ids = tokenize(pipe.tokenizer, [ds.prompt])
    enc = clip_text_apply(pipe.text_params, ids, pipe.text_config)

    import jax as _jax
    initial_trainable = _jax.tree_util.tree_map(lambda x: x, state.trainable)
    step = int(state.step)
    t0 = time.time()
    while step < cfg.max_train_steps:
        # Per-step rng derived from the step index, not a sequentially split
        # stream: a resumed run at step N then draws the same noise/timesteps
        # as the uninterrupted run would at step N (reference semantics:
        # train_bg.py:279-293 skips consumed dataloader steps on resume).
        srng = jax.random.fold_in(rng, step)
        state, metrics = train_step_stage1(
            state, latents, enc, srng,
            unet_config=pipe.unet_config, schedule=schedule, optimizer=optimizer,
            use_flash=cfg.use_flash_attention,
            remat=cfg.gradient_checkpointing,
            compute_dtype=frozen_dtype,
            accum_steps=cfg.gradient_accumulation_steps,
        )
        step += 1
        if step % 10 == 0 or step == 1:
            loss = float(metrics["loss"])
            print(f"step {step}/{cfg.max_train_steps} loss={loss:.5f} "
                  f"({(time.time()-t0)/step:.2f}s/step)")
        if step % cfg.checkpointing_steps == 0:
            path = save_train_state(cfg.output_dir, step, state)
            print(f"saved state to {path}")
        if step % cfg.validation_steps == 0:
            # weight-change probe (train_bg.py:371-384)
            import jax as _jax
            changed = any(
                bool((a != b).any())
                for a, b in zip(
                    _jax.tree_util.tree_leaves(state.trainable),
                    _jax.tree_util.tree_leaves(initial_trainable),
                )
            )
            print(
                "The weights of the model have changed after training"
                if changed
                else "The weights of the model remain the same after training"
            )
    print("done")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    main(p.parse_args().config)
