"""Attention injection as traceable dispatch (no monkey-patching).

The reference rewires attention ``forward`` methods at runtime
(fully_control_utils.py:109-229, temporal_control_utils.py:77-144) and gates
injection with Python counters: ``cur_step in step_idx`` and
``cur_att_layer//2 in layer_idx`` (fully_control.py:75/434) resp.
``cur_att_layer in layer_idx`` (temporal_control.py:74). Counter semantics:

  - the fully registrar patches attn1 AND attn2 of all 16 transformer blocks
    (32 call sites), so ``cur_att_layer//2`` is exactly the transformer-block
    index in forward order (down 0-5, mid 6, up 7-15);
  - the temporal registrar patches the 16 ``attn_temp`` modules, so its
    counter is the same block index.

Here gating is *static*: an ``InjectionSpec`` carries a per-block boolean
tuple; the denoise driver splits the 50 timesteps into contiguous segments of
constant step-gating (default: steps [0,4) off, [4,50) on) and compiles one
``lax.scan`` per segment — zero dynamic control flow inside the program.

Branch-axis convention (size-4 leading axis): [recon_u, edit_u, recon_c,
edit_c], matching torch.cat([latents]*2) at pipeline_motion_editor.py:605
and the chunk(4) in fully_control.py:441-443.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from motioneditor_tpu.ops.attention import (
    MOTION_FRAME,
    merge_heads,
    sdpa,
    select_kv,
    split_heads,
)
from motioneditor_tpu.models.layers import linear, nearest_resize

NUM_TRANSFORMER_BLOCKS = 16  # SD-1.5 ("SD" in fully_control.py:20-23)

# branch-row indices
SRC_ROWS = (0, 2)  # reconstruction branch (uncond, cond)
TGT_ROWS = (1, 3)  # editing branch
TGT_TO_SRC = (0, 0, 2, 2)  # kv source row per branch row (temporal injection)


@dataclasses.dataclass(frozen=True)
class InjectionSpec:
    """Static injection configuration for one timestep segment.

    ``spatial_layers`` / ``temporal_layers``: per-transformer-block booleans
    (length 16). ``active`` False means the whole segment runs vanilla.
    """

    active: bool = False
    spatial_layers: Tuple[bool, ...] = (False,) * NUM_TRANSFORMER_BLOCKS
    temporal_layers: Tuple[bool, ...] = (False,) * NUM_TRANSFORMER_BLOCKS
    mask_fgbg: bool = True  # FullySelfAttentionControlMask vs plain Mutual

    @staticmethod
    def from_start_layer(
        start_layer: int = 10,
        total_layers: int = NUM_TRANSFORMER_BLOCKS,
        mask_fgbg: bool = True,
        layer_idx: Optional[Tuple[int, ...]] = None,
    ) -> "InjectionSpec":
        layers = tuple(
            (i in layer_idx) if layer_idx is not None else (i >= start_layer)
            for i in range(total_layers)
        )
        return InjectionSpec(
            active=True,
            spatial_layers=layers,
            temporal_layers=layers,
            mask_fgbg=mask_fgbg,
        )


def segment_step_ranges(
    num_steps: int, start_step: int = 4, step_idx: Optional[Tuple[int, ...]] = None
) -> Tuple[Tuple[int, int, bool], ...]:
    """Split [0, num_steps) into contiguous (lo, hi, injected) segments.

    Default reference gating: steps [start_step, num_steps) are injected
    (fully_control.py:42 step_idx = range(start_step, total_steps)).
    """
    gate = [
        (i in step_idx) if step_idx is not None else (i >= start_step)
        for i in range(num_steps)
    ]
    segments = []
    lo = 0
    for i in range(1, num_steps + 1):
        if i == num_steps or gate[i] != gate[lo]:
            segments.append((lo, i, gate[lo]))
            lo = i
    return tuple(segments)


def prepare_injection_masks(
    source_masks: jnp.ndarray,
    num_frames: int,
    resolutions: Tuple[Tuple[int, int], ...] = ((64, 64), (32, 32), (16, 16), (8, 8)),
) -> Dict[Tuple[int, int], jnp.ndarray]:
    """Precompute per-resolution foreground masks for the fg/bg K/V split.

    ``source_masks``: [F, H, W] binary protagonist masks (dataset man.mask).
    Returns {(h, w): [F, h*w, 1]} nearest-resized, mirroring
    F.interpolate(masks, (F, H, W), mode="nearest") at fully_control.py:388.
    """
    f = source_masks.shape[0]
    assert f == num_frames
    out = {}
    for (h, w) in resolutions:
        m = nearest_resize(source_masks[..., None], (h, w))  # [F, h, w, 1]
        out[(h, w)] = m.reshape(f, h * w, 1)
    return out


def motion_frame_mask(mask_n: jnp.ndarray) -> jnp.ndarray:
    """[F, N, 1] -> [F, 2N, 1] concat of [prev-frame mask, current mask],
    matching the K/V [prev, cur] layout (fully_control.py:386-398)."""
    f = mask_n.shape[0]
    former = np.arange(f) - 1
    former[0] = 0
    return jnp.concatenate([mask_n[former], mask_n], axis=1)


def injected_spatial_attention(
    params,
    x: jnp.ndarray,
    heads: int,
    mask_n: Optional[jnp.ndarray],
    mask_fgbg: bool = True,
    use_flash: bool = True,
) -> jnp.ndarray:
    """FullySelfAttentionControlMask forward as a pure function.

    x: [4, F, N, C] (branch axis leading). Reference semantics
    (fully_control.py:425-460 with attn_batch :372-422):

      source rows: plain motion-frame attention (K/V = [prev, cur] of own row)
      target rows: Q unchanged; K = [K_src*mask, K_src*(1-mask), K_tgt_cur],
                   V = [V_src, V_src, V_tgt_cur]  (values are NOT masked, and
                   the target contributes only its *current* frame: the
                   reference slices k[:, 3HW:] at fully_control.py:383)

    ``mask_n``: [F, N, 1] foreground mask at this resolution (None or
    mask_fgbg=False falls back to MutualSelfAttentionControl semantics where
    target rows simply use source-row K/V wholesale, fully_control.py:83-87).
    """
    b, f, n, c = x.shape
    assert b == 4, "injection requires the 4-row branch axis"
    q = linear(params["to_q"], x)
    k = linear(params["to_k"], x)
    v = linear(params["to_v"], x)
    k_mf = select_kv(k, MOTION_FRAME)  # [4, F, 2N, C]
    v_mf = select_kv(v, MOTION_FRAME)

    dim_head = q.shape[-1] // heads
    scale = dim_head**-0.5

    src = np.asarray(SRC_ROWS)
    tgt = np.asarray(TGT_ROWS)

    # source rows: vanilla motion-frame attention
    out_src = sdpa(
        split_heads(q[src], heads),
        split_heads(k_mf[src], heads),
        split_heads(v_mf[src], heads),
        scale,
        use_flash=use_flash,
    )

    if mask_fgbg and mask_n is not None:
        m = motion_frame_mask(mask_n)  # [F, 2N, 1]
        k_src = k_mf[src]  # [2, F, 2N, C]
        v_src = v_mf[src]
        k_tgt_cur = k[tgt]  # [2, F, N, C] (current frame only)
        v_tgt_cur = v[tgt]
        k_inj = jnp.concatenate([k_src * m, k_src * (1.0 - m), k_tgt_cur], axis=2)
        v_inj = jnp.concatenate([v_src, v_src, v_tgt_cur], axis=2)
    else:
        # MutualSelfAttentionControl: target queries attend purely to the
        # source branch's [prev, cur] K/V (fully_control.py:83-87).
        k_inj = k_mf[src]
        v_inj = v_mf[src]

    out_tgt = sdpa(
        split_heads(q[tgt], heads),
        split_heads(k_inj, heads),
        split_heads(v_inj, heads),
        scale,
        use_flash=use_flash,
    )

    out = jnp.stack(
        [out_src[0], out_tgt[0], out_src[1], out_tgt[1]], axis=0
    )  # re-interleave [ru, eu, rc, ec]
    return linear(params["to_out"], merge_heads(out))


def injected_temporal_kv(x: jnp.ndarray) -> jnp.ndarray:
    """K/V override for temporal injection: every branch row reads the
    reconstruction row of its CFG half (temporal_control.py:82-86)."""
    return x[np.asarray(TGT_TO_SRC)]
