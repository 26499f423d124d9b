"""Shared training machinery: trainable-parameter selection, optimizer,
train-state pytrees.

The reference freezes everything and re-enables modules whose *name* ends
with an entry of ``trainable_modules`` (train_bg.py:100-104/166-174:
("attn1.to_q", "attn2.to_q", "attn_temp")), resp. any module containing
"controlnet_adapter" for stage 2 (train_adaptor.py:170-173). Here the same
selection runs over pytree paths; frozen params are closed over so gradients
are only materialized for the trainable subset.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def module_path(path) -> str:
    """Drop the leaf param name (kernel/bias/scale) -> module path."""
    s = _path_str(path)
    return s.rsplit(".", 1)[0] if "." in s else s


def trainable_mask(params, trainable_modules: Sequence[str]):
    """True where the module path ends with any trainable_modules entry or
    contains it as a dotted segment (matches torch named_modules semantics:
    'attn_temp' unfreezes the whole attn_temp subtree)."""

    def match(path, _leaf):
        mp = module_path(path)
        for pat in trainable_modules:
            if mp.endswith(pat):
                return True
            # module prefix match: pattern names a module, leaf is inside it
            if ("." + pat + ".") in ("." + mp + "."):
                return True
        return False

    return jax.tree_util.tree_map_with_path(match, params)


def partition_params(params, mask):
    """Split params into (trainable, frozen) with None placeholders."""
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask,
        is_leaf=lambda x: x is None,
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask,
        is_leaf=lambda x: x is None,
    )
    return trainable, frozen


def combine_params(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: t if t is not None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


@dataclasses.dataclass
class TrainState:
    step: int
    trainable: Any
    frozen: Any
    opt_state: Any

    @property
    def params(self):
        return combine_params(self.trainable, self.frozen)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.trainable, s.frozen, s.opt_state), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(
    learning_rate: float = 3e-5,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    max_grad_norm: float = 1.0,
    use_8bit: bool = False,
):
    """AdamW + global-norm clipping (train_bg.py:202-208, :347-352).

    ``use_8bit`` swaps in blockwise-quantized moment state
    (training/adam8bit.py — the bitsandbytes use_8bit_adam equivalent,
    train_bg.py:190-208)."""
    if use_8bit:
        from motioneditor_tpu.training.adam8bit import adamw8bit

        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            adamw8bit(
                learning_rate, b1=beta1, b2=beta2, eps=eps,
                weight_decay=weight_decay,
            ),
        )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay
        ),
    )


def make_train_state(params, trainable_modules, optimizer, frozen_dtype=None) -> TrainState:
    """``frozen_dtype`` (e.g. bf16) stores the frozen weights at reduced
    precision — the memory half of mixed-precision training. Master copies of
    the trainables stay fp32."""
    mask = trainable_mask(params, trainable_modules)
    trainable, frozen = partition_params(params, mask)
    if frozen_dtype is not None:
        frozen = jax.tree_util.tree_map(
            lambda x: x.astype(frozen_dtype) if hasattr(x, "astype") else x, frozen
        )
    opt_state = optimizer.init(trainable)
    return TrainState(step=0, trainable=trainable, frozen=frozen, opt_state=opt_state)
