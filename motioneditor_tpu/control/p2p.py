"""Prompt-to-prompt attention controllers as pure probability editors.

Port of motion_editor/p2p/p2p_stable.py + the time-word alpha schedule from
ptp_utils.py:302-333. The reference registers these by monkey-patching
(ptp_utils.py:160-278, invoked from prepare_control at inference.py:74-99 —
present but not on the default path); here a controller is a static spec the
denoiser applies to cross-attention probabilities:

  probs_edit = controller(probs_base, probs_edit, step)

Branch convention: probs arrays are [2, ...] pairs (source row, edit row) of
the cross-attention softmax over 77 text tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.control.seq_aligner import (
    get_refinement_mapper,
    get_replacement_mapper,
    get_word_inds,
)


def get_time_words_attention_alpha(
    prompts: Sequence[str],
    num_steps: int,
    cross_replace_steps: Union[float, Dict[str, Tuple[float, float]]],
    tokenizer,
    max_num_words: int = 77,
) -> np.ndarray:
    """Per-(step, word) replacement gate (ptp_utils.py:302-333)."""

    def update_alpha(alpha, bounds, prompt_ind, word_inds=None):
        if isinstance(bounds, float):
            bounds = (0.0, bounds)
        start, end = int(bounds[0] * num_steps), int(bounds[1] * num_steps)
        if word_inds is None:
            word_inds = np.arange(alpha.shape[2])
        alpha[:start, prompt_ind, word_inds] = 0
        alpha[start:end, prompt_ind, word_inds] = 1
        alpha[end:, prompt_ind, word_inds] = 0
        return alpha

    if not isinstance(cross_replace_steps, dict):
        cross_replace_steps = {"default_": cross_replace_steps}
    if "default_" not in cross_replace_steps:
        cross_replace_steps["default_"] = (0.0, 1.0)
    alpha_time_words = np.zeros((num_steps + 1, len(prompts) - 1, max_num_words))
    for i in range(len(prompts) - 1):
        alpha_time_words = update_alpha(
            alpha_time_words, cross_replace_steps["default_"], i
        )
    for key, item in cross_replace_steps.items():
        if key != "default_":
            inds = [get_word_inds(prompts[i], key, tokenizer) for i in range(1, len(prompts))]
            for i, ind in enumerate(inds):
                if len(ind) > 0:
                    alpha_time_words = update_alpha(alpha_time_words, item, i, ind)
    return alpha_time_words.reshape(
        num_steps + 1, len(prompts) - 1, 1, 1, max_num_words
    ).astype(np.float32)


@dataclasses.dataclass(frozen=True, eq=False)
class P2PController:
    """Static p2p spec. kind: "replace" | "refine" | "reweight".

    mapper / alphas from seq_aligner; cross_alpha the per-step word gate;
    self_replace_until the step bound for self-attn map replacement
    (p2p_stable.py:141-147/150-163).

    ``eq=False``: identity hash so a controller can close over jitted
    programs as a static argument (arrays aren't hashable)."""

    kind: str
    num_steps: int
    cross_alpha: np.ndarray  # [T+1, n_edit, 1, 1, 77]
    self_replace_until: int
    mapper: Optional[np.ndarray] = None  # replace: [n, 77, 77]; refine: [n, 77]
    refine_alphas: Optional[np.ndarray] = None  # refine: [n, 77]
    equalizer: Optional[np.ndarray] = None  # reweight: [n, 77]

    def replace_cross_attention(self, attn_base, attn_edit, edit_idx: int = 0):
        """attn_*: [..., Q, 77] probabilities."""
        if self.kind == "replace":
            m = jnp.asarray(self.mapper[edit_idx])
            return jnp.einsum("...pw,wn->...pn", attn_base, m)
        if self.kind == "refine":
            mapper = jnp.asarray(self.mapper[edit_idx])
            alphas = jnp.asarray(self.refine_alphas[edit_idx])
            base_replace = jnp.take(attn_base, jnp.maximum(mapper, 0), axis=-1)
            return base_replace * alphas + attn_edit * (1 - alphas)
        if self.kind == "reweight":
            # reweight scales the BASE branch's map (p2p_stable.py:203-206:
            # attn_base[None] * equalizer), not the edit branch's
            eq = jnp.asarray(self.equalizer[edit_idx])
            return attn_base * eq
        raise ValueError(self.kind)

    def edit_cross_probs(self, probs_base, probs_edit, step: int, edit_idx: int = 0):
        """Apply the per-step word-gated blend (p2p_stable.py:141-148)."""
        alpha = jnp.asarray(self.cross_alpha[step, edit_idx])
        replaced = self.replace_cross_attention(probs_base, probs_edit, edit_idx)
        return alpha * replaced + (1 - alpha) * probs_edit

    def edit_self_probs(self, probs_base, probs_edit, step: int):
        """Self-attn map replacement while step < bound (p2p_stable.py:150-157)."""
        if step < self.self_replace_until:
            return jnp.broadcast_to(probs_base, probs_edit.shape)
        return probs_edit

    def prob_editor(self, step, edit_idx: int = 0):
        """Build the traced (probs, is_cross) -> probs editor for one denoise
        step (``step`` may be a traced scalar — usable inside ``lax.scan``).

        probs: [4, F, H, Q, KV], rows [recon_u, edit_u, recon_c, edit_c].
        Edits apply to the conditional half only — base = row 2, edit = row 3
        — matching AttentionControl.__call__ with LOW_RESOURCE=False
        (p2p_stable.py:63-71). Self-attn replacement only at Q <= 16^2
        (p2p_stable.py:135-139) inside the [0, self_replace_until) window.
        """
        cross_alpha = jnp.asarray(self.cross_alpha[:, edit_idx])  # [T+1,1,1,77]
        self_gate = jnp.asarray(
            (np.arange(self.num_steps) < self.self_replace_until).astype(np.float32)
        )

        def editor(probs, is_cross: bool):
            assert probs.shape[0] == 4, "p2p editing requires the batch-4 rows"
            base, edit = probs[2], probs[3]
            if is_cross:
                alpha = jax.lax.dynamic_index_in_dim(
                    cross_alpha, step, 0, keepdims=False
                ).astype(probs.dtype)
                replaced = self.replace_cross_attention(base, edit, edit_idx)
                new_edit = alpha * replaced + (1.0 - alpha) * edit
            else:
                if probs.shape[-2] > 256:
                    return probs
                g = self_gate[step].astype(probs.dtype)
                new_edit = g * base + (1.0 - g) * edit
            return jnp.stack([probs[0], probs[1], base, new_edit], axis=0)

        return editor


@dataclasses.dataclass(frozen=True, eq=False)
class LocalBlend:
    """Word-localized latent blending (p2p_stable.py:20-44).

    Restricts the edit to regions where the selected words attend: outside
    the thresholded cross-attention mask, the edited latents are replaced by
    the source branch's latents.

    ``alpha_layers``: [n_prompts, 77] one-hot word selection (built by
    ``make_local_blend``); ``threshold``: mask binarization (ref 0.3).
    """

    alpha_layers: np.ndarray
    threshold: float = 0.3
    pool_k: int = 3

    def __call__(self, latents: jnp.ndarray, cross_maps) -> jnp.ndarray:
        """latents: [B, F, h, w, 4] (row 0 = source/recon branch);
        cross_maps: list of [(B F), 256, 77] 16x16 attention maps."""
        b, f, h, w, c = latents.shape
        maps = jnp.stack(cross_maps, axis=1)  # [(B F), L, 256, 77]
        maps = maps.reshape(b, f, maps.shape[1], 16, 16, maps.shape[-1])
        alpha = jnp.asarray(self.alpha_layers)  # [B, 77]
        sel = (maps * alpha[:, None, None, None, None, :]).sum(-1)  # [B,F,L,16,16]
        sel = sel.mean(axis=2)  # [B, F, 16, 16]
        # smooth + resize to latent res + per-map max-normalize (ref :31-36)
        k = self.pool_k
        sel = jax.lax.reduce_window(
            sel, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, 1, 1), "SAME"
        )
        sel = jax.image.resize(sel, (b, f, h, w), method="bilinear")
        hi = sel.max(axis=(2, 3), keepdims=True)
        sel = sel / jnp.maximum(hi, 1e-8)
        mask = (sel > self.threshold).astype(latents.dtype)[..., None]
        mask = jnp.maximum(mask, mask[:1])  # union with the source mask (:41)
        return latents[:1] + mask * (latents - latents[:1])


def make_local_blend(
    prompts: Sequence[str], words: Sequence[Sequence[str]], tokenizer,
    threshold: float = 0.3,
) -> LocalBlend:
    alpha = np.zeros((len(prompts), 77), np.float32)
    for i, (p, ws) in enumerate(zip(prompts, words)):
        if isinstance(ws, str):
            ws = [ws]
        for w in ws:
            inds = get_word_inds(p, w, tokenizer)
            alpha[i, inds] = 1.0
    return LocalBlend(alpha_layers=alpha, threshold=threshold)


def make_controller(
    prompts: Sequence[str],
    tokenizer,
    num_steps: int,
    cross_replace_steps: Union[float, Dict] = 0.8,
    self_replace_steps: float = 0.4,
    equalizer_words: Optional[Sequence[str]] = None,
    equalizer_values: Optional[Sequence[float]] = None,
) -> P2PController:
    """Pick Replace vs Refine by word-count match, like prepare_control
    (inference.py:74-99); Reweight when an equalizer is given."""
    cross_alpha = get_time_words_attention_alpha(
        prompts, num_steps, cross_replace_steps, tokenizer
    )
    self_until = int(num_steps * self_replace_steps)
    if equalizer_words is not None:
        eq = np.ones((1, 77), np.float32)
        for w, v in zip(equalizer_words, equalizer_values):
            inds = get_word_inds(prompts[1], w, tokenizer)
            eq[:, inds] = v
        return P2PController(
            kind="reweight", num_steps=num_steps, cross_alpha=cross_alpha,
            self_replace_until=self_until, equalizer=eq,
        )
    if len(prompts[0].split(" ")) == len(prompts[1].split(" ")):
        mapper = get_replacement_mapper(prompts, tokenizer)
        return P2PController(
            kind="replace", num_steps=num_steps, cross_alpha=cross_alpha,
            self_replace_until=self_until, mapper=mapper,
        )
    mapper, alphas = get_refinement_mapper(prompts, tokenizer)
    # alphas [n, 77] broadcast over heads/queries (p2p_stable.py:195-196)
    return P2PController(
        kind="refine", num_steps=num_steps, cross_alpha=cross_alpha,
        self_replace_until=self_until, mapper=mapper, refine_alphas=alphas,
    )
