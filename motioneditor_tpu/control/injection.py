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

    ``mask_mode``:
      "mask"   FullySelfAttentionControlMask — fg/bg K/V decomposition from
               the dataset's protagonist masks (the live inference path)
      "mutual" MutualSelfAttentionControl — target rows read source K/V
      "auto"   FullySelfAttentionControlMaskAuto — fg/bg attention recomposed
               by a mask auto-derived from the current step's 16x16
               cross-attention maps (fully_control.py:131-328);
               ``auto_token_idx`` selects the anchor-word tokens and
               ``auto_thres`` the binarization threshold (:147, :316-318)
    """

    active: bool = False
    spatial_layers: Tuple[bool, ...] = (False,) * NUM_TRANSFORMER_BLOCKS
    temporal_layers: Tuple[bool, ...] = (False,) * NUM_TRANSFORMER_BLOCKS
    mask_mode: str = "mask"
    auto_token_idx: Tuple[int, ...] = (1,)
    auto_thres: float = 0.1

    @property
    def mask_fgbg(self) -> bool:
        return self.mask_mode == "mask"

    @property
    def collect_cross_maps(self) -> bool:
        return self.mask_mode == "auto"

    @staticmethod
    def from_start_layer(
        start_layer: int = 10,
        total_layers: int = NUM_TRANSFORMER_BLOCKS,
        mask_fgbg: bool = True,
        layer_idx: Optional[Tuple[int, ...]] = None,
        mask_mode: Optional[str] = None,
        auto_token_idx: Tuple[int, ...] = (1,),
        auto_thres: float = 0.1,
    ) -> "InjectionSpec":
        layers = tuple(
            (i in layer_idx) if layer_idx is not None else (i >= start_layer)
            for i in range(total_layers)
        )
        if mask_mode is None:
            mask_mode = "mask" if mask_fgbg else "mutual"
        return InjectionSpec(
            active=True,
            spatial_layers=layers,
            temporal_layers=layers,
            mask_mode=mask_mode,
            auto_token_idx=tuple(auto_token_idx),
            auto_thres=auto_thres,
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
    shard=None,
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
    inner = q.shape[-1]
    dim_head = inner // heads
    scale = dim_head**-0.5

    src = np.asarray(SRC_ROWS)
    tgt = np.asarray(TGT_ROWS)

    if shard is not None:
        # frame-sharded kernel path (parallel/flash_sharding): source rows
        # run the halo-built motion-frame kernel, target rows the explicit-KV
        # injection kernel; branch pairing (edit_u<-recon_u, edit_c<-recon_c)
        # is row-aligned so a batch-sharded branch axis stays local
        if use_flash and n >= 1024:
            from motioneditor_tpu.parallel.flash_sharding import (
                sharded_injection_flash,
                sharded_spatial_flash,
            )

            out_src = sharded_spatial_flash(
                q[src], k[src], v[src], MOTION_FRAME, scale, heads, shard
            )
            if out_src is not None:
                if mask_fgbg and mask_n is not None:
                    out_tgt = sharded_injection_flash(
                        q[tgt], k[src], v[src], k[tgt], v[tgt],
                        mask_n[..., 0], scale, heads, shard,
                    )
                else:
                    out_tgt = sharded_spatial_flash(
                        q[tgt], k[src], v[src], MOTION_FRAME, scale, heads, shard
                    )
                if out_tgt is not None:
                    out = jnp.stack(
                        [out_src[0], out_tgt[0], out_src[1], out_tgt[1]], axis=0
                    )
                    return linear(params["to_out"], out)
        use_flash = False  # unsharded pallas under a mesh would replicate

    if use_flash and n >= 1024:
        from motioneditor_tpu.ops.video_flash import (
            video_flash_attention,
            video_flash_supported,
            video_injection_attention,
        )

        if video_flash_supported(n, inner, heads, q.dtype.itemsize, injection=True):
            # packed-head kernels: head split, motion-frame K/V selection and
            # the fg/bg mask decomposition all happen in-kernel — nothing is
            # concatenated or head-split in HBM
            out_src = video_flash_attention(
                q[src], k[src], v[src], MOTION_FRAME, scale, heads
            )
            if mask_fgbg and mask_n is not None:
                out_tgt = video_injection_attention(
                    q[tgt], k[src], v[src], k[tgt], v[tgt],
                    mask_n[..., 0], scale, heads,
                )
            else:
                # MutualSelfAttentionControl: target queries read the source
                # row's motion-frame K/V wholesale (fully_control.py:83-87)
                out_tgt = video_flash_attention(
                    q[tgt], k[src], v[src], MOTION_FRAME, scale, heads
                )
            out = jnp.stack(
                [out_src[0], out_tgt[0], out_src[1], out_tgt[1]], axis=0
            )
            return linear(params["to_out"], out)

    k_mf = select_kv(k, MOTION_FRAME)  # [4, F, 2N, C]
    v_mf = select_kv(v, MOTION_FRAME)

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
        if use_flash and n >= 1024:
            # fused kernel: q.(k*m) == m*(q.k) and V_fg == V_bg, so the 5N-key
            # concat collapses to one QK + one PV over the source keys
            # (ops/injection_flash.py) — no concatenated K/V in HBM.
            from motioneditor_tpu.ops.injection_flash import (
                fused_injection_attention,
            )

            dim_head = q.shape[-1] // heads
            out_tgt = fused_injection_attention(
                split_heads(q[tgt], heads),
                split_heads(k_mf[src], heads),
                split_heads(v_mf[src], heads),
                m[..., 0],  # [F, 2N]
                split_heads(k[tgt], heads),
                split_heads(v[tgt], heads),
                scale,
            )
            out = jnp.stack(
                [out_src[0], out_tgt[0], out_src[1], out_tgt[1]], axis=0
            )
            return linear(params["to_out"], merge_heads(out))
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


def aggregate_cross_attn_mask(
    cross_maps,
    token_idx: Tuple[int, ...],
    res: int,
    thres: float,
) -> jnp.ndarray:
    """Auto-mask from collected 16x16 cross-attention maps
    (fully_control.py:257-268 + :302-318).

    cross_maps: list of [4F, 256, 77] mean-over-heads probability maps from
    the current step's text cross-attentions. Returns a binarized spatial
    mask [F, res*res, 1] for the editing rows (rows 3F: are the cond-edit
    branch, :306)."""
    agg = jnp.stack(cross_maps, axis=1).mean(axis=1)  # [4F, 256, 77]
    img = agg[..., np.asarray(token_idx)].sum(-1)  # [4F, 256]
    n16 = int(round(img.shape[-1] ** 0.5))
    img = img.reshape(-1, n16, n16)
    lo = img.min(axis=(1, 2), keepdims=True)
    hi = img.max(axis=(1, 2), keepdims=True)
    img = (img - lo) / jnp.maximum(hi - lo, 1e-8)
    f4 = img.shape[0]
    f = f4 // 4
    tgt = img[3 * f :]  # cond-edit rows
    tgt = nearest_resize(tgt[..., None], (res, res))[..., 0]
    mask = (tgt >= thres).astype(img.dtype)
    return mask.reshape(f, res * res, 1)


def injected_spatial_attention_auto(
    params,
    x: jnp.ndarray,
    heads: int,
    source_mask_n: Optional[jnp.ndarray],
    cross_maps,
    token_idx: Tuple[int, ...],
    thres: float,
    use_flash: bool = True,
) -> jnp.ndarray:
    """FullySelfAttentionControlMaskAuto forward (fully_control.py:270-328).

    Target rows attend ONLY the source rows' [prev, cur] K/V, twice — once
    with fg-masked K AND V, once with bg-masked (MaskAuto masks values too,
    :218-238) — and the two outputs are recomposed with a spatial mask
    auto-derived from the current step's cross-attention maps. When no maps
    have been collected yet this step, target rows use plain source K/V
    (:293-296).
    """
    b, f, n, c = x.shape
    assert b == 4
    q = linear(params["to_q"], x)
    k = linear(params["to_k"], x)
    v = linear(params["to_v"], x)
    k_mf = select_kv(k, MOTION_FRAME)
    v_mf = select_kv(v, MOTION_FRAME)
    dim_head = q.shape[-1] // heads
    scale = dim_head**-0.5
    src = np.asarray(SRC_ROWS)
    tgt = np.asarray(TGT_ROWS)

    out_src = sdpa(
        split_heads(q[src], heads),
        split_heads(k_mf[src], heads),
        split_heads(v_mf[src], heads),
        scale,
        use_flash=use_flash,
    )
    q_t = split_heads(q[tgt], heads)

    if not cross_maps or source_mask_n is None:
        out_tgt = sdpa(
            q_t, split_heads(k_mf[src], heads), split_heads(v_mf[src], heads),
            scale, use_flash=use_flash,
        )
    else:
        m = motion_frame_mask(source_mask_n)  # [F, 2N, 1]
        k_fg = split_heads(k_mf[src] * m, heads)
        v_fg = split_heads(v_mf[src] * m, heads)
        k_bg = split_heads(k_mf[src] * (1 - m), heads)
        v_bg = split_heads(v_mf[src] * (1 - m), heads)
        out_fg = sdpa(q_t, k_fg, v_fg, scale, use_flash=use_flash)
        out_bg = sdpa(q_t, k_bg, v_bg, scale, use_flash=use_flash)
        res = int(round(n**0.5))
        sm = aggregate_cross_attn_mask(cross_maps, token_idx, res, thres)
        sm = split_heads(jnp.broadcast_to(sm, (2, f, n, 1)), 1).reshape(2, f, 1, n, 1)
        out_tgt = out_fg * sm + out_bg * (1 - sm)

    out = jnp.stack([out_src[0], out_tgt[0], out_src[1], out_tgt[1]], axis=0)
    return linear(params["to_out"], merge_heads(out))
