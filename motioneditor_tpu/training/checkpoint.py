"""Orbax checkpoint / resume.

TPU-native replacement for ``accelerator.save_state`` (train_bg.py:360-364)
and the stand-alone adapter ``.pth`` (train_adaptor.py:397-399). Layout:

  <output_dir>/checkpoint-<step>/        full train state (orbax)
  <output_dir>/controlnet_adapter_checkpoint-<step>/  adapter params only

``latest_checkpoint`` reproduces the reference's resume-by-dirname parsing
(train_bg.py:279-293).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from motioneditor_tpu.training.common import TrainState


def _ckpt(path: str) -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_train_state(output_dir: str, step: int, state: TrainState) -> str:
    path = osp.abspath(osp.join(output_dir, f"checkpoint-{step}"))
    ckptr = _ckpt(path)
    # Pull to host first: orbax's own staged d2h transfer can trip TPU
    # ResourceExhausted when HBM is near-full mid-training.
    payload = jax.device_get(
        {"trainable": state.trainable, "opt_state": state.opt_state, "step": step}
    )
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, state: TrainState) -> TrainState:
    """Restore trainable/opt_state into an existing (shape-matched) state."""
    ckptr = _ckpt(path)
    target = {"trainable": state.trainable, "opt_state": state.opt_state, "step": 0}
    restored = ckptr.restore(osp.abspath(path), target)
    return TrainState(
        step=int(restored["step"]),
        trainable=restored["trainable"],
        frozen=state.frozen,
        opt_state=restored["opt_state"],
    )


def save_adapter(output_dir: str, step: int, adapter_params) -> str:
    path = osp.abspath(osp.join(output_dir, f"controlnet_adapter_checkpoint-{step}"))
    ckptr = _ckpt(path)
    ckptr.save(path, jax.device_get(adapter_params), force=True)
    ckptr.wait_until_finished()
    return path


def load_adapter(path: str, target):
    return _ckpt(path).restore(osp.abspath(path), target)


def latest_checkpoint(output_dir: str) -> Optional[Tuple[str, int]]:
    """Find checkpoint-<N> with the largest N (train_bg.py:279-293)."""
    if not osp.isdir(output_dir):
        return None
    best = None
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (osp.join(output_dir, name), step)
    return best
